"""Offline force matching from a trajectory: learn pair parameters from
frames + label forces via iter_from_trajectory (parity with reference
examples 05/06).

Here the 'trajectory' is generated in-process by running the built-in LJ
fluid and recording frames; with MDAnalysis installed, any Universe works
the same way.

Run: python examples/06_force_matching.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import jax.numpy as jnp
import numpy as np

import hoomd_tf_tpu as htf


class TrainableLJ(htf.SimModel):
    def setup(self):
        self.eps = htf.Variable(0.6, name="epsilon")
        self.sig = htf.Variable(1.4, name="sigma")

    def compute(self, nlist, positions, box):
        rinv = htf.nlist_rinv(nlist)
        sr6 = (self.sig.value * rinv) ** 6
        p_energy = self.eps.value * 4.0 / 2.0 * (sr6 ** 2 - sr6)
        energy = jnp.sum(p_energy, axis=1)
        return htf.compute_nlist_forces(nlist, energy)


def generate_trajectory(n=64, frames=20, r_cut=3.0):
    """Run the true LJ fluid and capture (positions4, label forces)."""
    sim = htf.Simulation(dt=0.002, integrator=htf.md.NVT(kT=1.0, tau=0.5),
                         seed=3)
    sim.init_lattice(n, density=0.3, kT_init=1.0)
    lj = sim.add_force(htf.md.LennardJones(r_cut=r_cut))
    obs = htf.tfcompute(_Observer(n - 1, output_forces=False))
    obs.attach(sim, r_cut=r_cut)
    data = []
    for _ in range(frames):
        sim.run(20)
        data.append((np.asarray(sim.state.positions4),
                     np.asarray(sim.state.forces)))
    return data, np.asarray(htf.box_size(sim.state.box))


class _Observer(htf.SimModel):
    def compute(self, nlist):
        return jnp.zeros(())


def main():
    nn, r_cut = 32, 3.0
    data, box_l = generate_trajectory()
    model = TrainableLJ(nn)
    model.compile(optimizer="adam", loss="mse", learning_rate=2e-2)
    box = htf.box_from_lengths(box_l)

    for epoch in range(10):
        losses = []
        for pos4, labels in data:
            nlist = htf.compute_nlist(jnp.asarray(pos4), r_cut, nn, box_l,
                                      sorted=True, return_types=True)
            loss = model.train_on_batch(
                [nlist, jnp.asarray(pos4), box], jnp.asarray(labels))
            losses.append(float(loss))
        print(f"epoch {epoch}  loss={np.mean(losses):.5f}  "
              f"eps={float(model.eps.value):.3f}  "
              f"sig={float(model.sig.value):.3f}")
    print("true parameters: eps=1.0 sig=1.0")


if __name__ == "__main__":
    main()
