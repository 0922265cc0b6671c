"""Quickstart: a Lennard-Jones pair potential as a SimModel driving an NVT
simulation (parity with reference example 01).

Run: python examples/01_quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import jax.numpy as jnp

import hoomd_tf_tpu as htf


class LJModel(htf.SimModel):
    def compute(self, nlist, positions, box):
        # 1/r with NaN-safe handling of padded neighbor slots
        rinv = htf.nlist_rinv(nlist)
        inv_r6 = rinv ** 6
        # pairwise energy; the full neighbor list double counts -> / 2
        p_energy = 4.0 / 2.0 * (inv_r6 * inv_r6 - inv_r6)
        energy = jnp.sum(p_energy, axis=1)
        return htf.compute_nlist_forces(nlist, energy)


def main():
    model = LJModel(64)
    sim = htf.Simulation(dt=0.005, integrator=htf.md.NVT(kT=1.2, tau=0.5),
                         seed=42)
    sim.init_lattice(n=256, density=0.4, kT_init=1.2)
    tfc = htf.tfcompute(model)
    tfc.attach(sim, r_cut=3.0)

    for i in range(5):
        sim.run(200)
        t = sim.thermo()
        print(f"step {int(sim.state.step):5d}  "
              f"PE={t['potential_energy']:+.3f}  "
              f"T={t['temperature']:.3f}  P={t['pressure']:+.4f}")

    # the thermostat holds the fluid near the target temperature
    assert abs(t["temperature"] - 1.2) < 0.6, t
    assert t["potential_energy"] < 0.0, t


if __name__ == "__main__":
    main()
