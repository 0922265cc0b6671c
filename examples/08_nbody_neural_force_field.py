"""Online N-body neural force field: train a NN potential against a
reference force field *while the simulation runs*, with early stopping
(parity with reference example 08).

Run: python examples/08_nbody_neural_force_field.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import jax
import jax.numpy as jnp
import numpy as np

import hoomd_tf_tpu as htf


class NNPotential(htf.SimModel):
    def setup(self, dim=16, top_neighs=16):
        self.rbf = htf.RBFExpansion(0.5, 3.0, dim)
        self.dense1 = htf.Dense(dim)
        self.last = htf.Dense(1, use_bias=False)
        self.top_neighs = top_neighs

    def compute(self, nlist, positions, box, training=False):
        rinv = htf.nlist_rinv(nlist)
        top = jnp.sort(rinv, axis=1)[:, ::-1][:, :self.top_neighs]
        x = self.rbf(htf.divide_no_nan(1.0, top))
        x = jax.nn.tanh(self.dense1(x))
        energy = jnp.sum(self.last(x), axis=(1, 2))
        forces = htf.compute_nlist_forces(nlist, energy)
        return forces


def main():
    n, nn, r_cut = 64, 32, 3.0
    model = NNPotential(nn, output_forces=False)
    model.compile(optimizer="adam", loss="mse", learning_rate=1e-3)

    sim = htf.Simulation(dt=0.002, integrator=htf.md.NVT(kT=1.0, tau=0.5),
                         seed=0)
    sim.init_lattice(n, density=0.3, kT_init=1.0)
    lj = sim.add_force(htf.md.LennardJones(epsilon=1.0, sigma=1.0,
                                           r_cut=r_cut))
    tfc = htf.tfcompute(model)
    tfc.attach(sim, r_cut=r_cut, train=True, period=2)
    tfc.set_reference_forces(lj)

    # online training with early stopping (host-side control between
    # compiled chunks, like the reference's example 08)
    best, patience, bad = np.inf, 5, 0
    first_loss = None
    for epoch in range(30):
        sim.run(100)
        loss = float(np.mean(tfc.loss_history[-50:]))
        if first_loss is None:
            first_loss = loss
        print(f"epoch {epoch:2d}  loss={loss:.5f}")
        if loss < best * 0.995:
            best, bad = loss, 0
        else:
            bad += 1
            if bad >= patience:
                print("early stopping")
                break
    print(f"final loss {best:.5f}")
    assert np.isfinite(best)
    assert best <= first_loss, (best, first_loss)


if __name__ == "__main__":
    main()
