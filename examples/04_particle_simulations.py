"""Trainable WCA repulsion + running RDF observable during simulation
(parity with reference examples 02/04: custom layers + metrics in the
simulation loop).

Run: python examples/04_particle_simulations.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import jax.numpy as jnp

import hoomd_tf_tpu as htf


class WCARDF(htf.SimModel):
    def setup(self):
        self.wca = htf.WCARepulsion(0.9)
        self.avg_rdf = htf.MeanTensor()

    def compute(self, nlist, positions, box):
        p_energy = self.wca(nlist)
        forces = htf.compute_nlist_forces(nlist, p_energy)
        rdf, rs = htf.compute_rdf(nlist, [0.5, 3.0], positions[:, 3])
        self.avg_rdf.update_state(rdf)
        return forces


def main():
    model = WCARDF(48)
    sim = htf.Simulation(dt=0.002, integrator=htf.md.Langevin(kT=0.8,
                                                              gamma=1.0),
                         seed=7)
    sim.init_lattice(n=216, density=0.5, kT_init=0.8)
    tfc = htf.tfcompute(model)
    tfc.attach(sim, r_cut=3.0)
    sim.run(1000)
    rdf = model.avg_rdf.result()
    print("running-mean RDF (unnormalized):")
    print(jnp.round(rdf, 3))
    t = sim.thermo()
    print("thermo:", t)
    assert float(jnp.sum(rdf)) > 0.0
    assert abs(t["temperature"] - 0.8) < 0.5, t


if __name__ == "__main__":
    main()
