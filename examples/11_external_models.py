"""Using external models inside a SimModel (parity with reference example
11, which embedded arbitrary Keras models): here a flax.linen MLP is the
potential. Any JAX-functional model works the same way -- params become
htf Variables so training and scan-carried state work unchanged.

Run: python examples/11_external_models.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import hoomd_tf_tpu as htf


class FlaxPotential(htf.SimModel):
    """Wraps a flax.linen module: init once in setup, store the params
    pytree in htf Variables, apply functionally in compute."""

    def setup(self, hidden=32):
        import flax.linen as nn

        class MLP(nn.Module):
            hidden: int

            @nn.compact
            def __call__(self, x):
                x = nn.tanh(nn.Dense(self.hidden)(x))
                x = nn.tanh(nn.Dense(self.hidden)(x))
                return nn.Dense(1)(x)

        self.mlp = MLP(hidden)
        params = self.mlp.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 16)))
        # flatten the flax pytree into htf Variables (trainable)
        leaves, self._treedef = jax.tree_util.tree_flatten(params)
        self._params = [htf.Variable(leaf, name=f"flax-{i}")
                        for i, leaf in enumerate(leaves)]

    def _flax_params(self):
        return jax.tree_util.tree_unflatten(
            self._treedef, [v.value for v in self._params])

    def compute(self, nlist, positions, box):
        rinv = htf.nlist_rinv(nlist)
        top = jnp.sort(rinv, axis=1)[:, ::-1][:, :16]
        energy = jnp.sum(self.mlp.apply(self._flax_params(), top))
        return htf.compute_nlist_forces(nlist, energy)


def main():
    n = 64
    model = FlaxPotential(32, output_forces=False)
    model.compile(optimizer="adam", loss="mse", learning_rate=1e-3)

    sim = htf.Simulation(dt=0.002, integrator=htf.md.NVT(kT=1.0, tau=0.5),
                         seed=0)
    sim.init_lattice(n, density=0.3, kT_init=1.0)
    lj = sim.add_force(htf.md.LennardJones(r_cut=3.0))
    tfc = htf.tfcompute(model)
    tfc.attach(sim, r_cut=3.0, train=True, period=2)
    tfc.set_reference_forces(lj)
    for epoch in range(5):
        sim.run(100)
        loss = float(np.mean(tfc.loss_history[-50:]))
        print(f"epoch {epoch}: loss = {loss:.5f}")
    # losses track the equilibrating fluid's growing label forces, so
    # they need not decrease monotonically -- but training must stay
    # finite and the parameters must actually move
    assert np.all(np.isfinite(tfc.loss_history))


if __name__ == "__main__":
    main()
