"""Ready-made potential model families.

The reference keeps its models in tests/examples; these are the same
families (classical pair, trainable pair, SchNet-style neural potential)
packaged as importable, trainable ``SimModel`` s so users start from a
working potential instead of a blank ``compute``.
"""

import jax
import jax.numpy as jnp

from .simmodel import SimModel
from .layers import Dense, RBFExpansion
from ..ops.forces import compute_nlist_forces
from ..ops.numerics import nlist_rinv

__all__ = ["LJPotential", "TrainableLJ", "NeuralPairPotential"]


class LJPotential(SimModel):
    """Fixed-parameter Lennard-Jones pair potential.

    ``setup(epsilon=1.0, sigma=1.0)``; forces and per-particle energies via
    autodiff, virial available with ``virial=True``.
    """

    def setup(self, epsilon=1.0, sigma=1.0):
        self.epsilon = float(epsilon)
        self.sigma = float(sigma)

    def compute(self, nlist, positions, box):
        rinv = nlist_rinv(nlist)
        sr6 = (self.sigma * rinv) ** 6
        p_energy = self.epsilon * 4.0 / 2.0 * (sr6 * sr6 - sr6)
        energy = jnp.sum(p_energy, axis=1)
        return compute_nlist_forces(nlist, energy, virial=self.virial)


class TrainableLJ(SimModel):
    """Lennard-Jones with trainable ``epsilon``/``sigma`` (non-negative),
    for force matching against reference forces.

    ``setup(epsilon=1.0, sigma=1.0)``.
    """

    def setup(self, epsilon=1.0, sigma=1.0):
        nonneg = lambda x: jnp.maximum(x, 0.0)  # noqa: E731
        self.eps = self.add_weight((), initializer=float(epsilon),
                                   constraint=nonneg, name="epsilon")
        self.sig = self.add_weight((), initializer=float(sigma),
                                   constraint=nonneg, name="sigma")

    def compute(self, nlist, positions, box):
        rinv = nlist_rinv(nlist)
        sr6 = (self.sig.value * rinv) ** 6
        p_energy = self.eps.value * 4.0 / 2.0 * (sr6 * sr6 - sr6)
        energy = jnp.sum(p_energy, axis=1)
        return compute_nlist_forces(nlist, energy, virial=self.virial)


class NeuralPairPotential(SimModel):
    """SchNet-style neural pair potential: RBF expansion of neighbor
    distances -> MLP -> per-pair energies (the reference's example-08
    model family).

    ``setup(low=0.5, high=3.0, count=32, hidden=64, layers=2)``.
    """

    def setup(self, low=0.5, high=3.0, count=32, hidden=64, layers=2):
        self.rbf = RBFExpansion(low, high, count)
        self.hidden_layers = [Dense(hidden, name=f"hidden{i}")
                              for i in range(layers)]
        self.out = Dense(1, use_bias=False, name="out")

    def compute(self, nlist, positions, box):
        rinv = nlist_rinv(nlist)
        # padded slots have rinv == 0 -> mask their pair energies
        mask = (rinv > 0).astype(self.dtype)
        r = jnp.where(rinv > 0, 1.0 / jnp.maximum(rinv, 1e-6),
                      jnp.zeros_like(rinv))
        x = self.rbf(r)                                   # [N, NN, count]
        for layer in self.hidden_layers:
            x = jax.nn.tanh(layer(x))
        p_energy = self.out(x)[..., 0] * mask             # [N, NN]
        energy = jnp.sum(p_energy, axis=1) / 2.0          # double count
        return compute_nlist_forces(nlist, energy, virial=self.virial)
