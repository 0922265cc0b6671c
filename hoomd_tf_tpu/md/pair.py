"""Built-in pair potentials.

These serve the roles HOOMD's ``md.pair.*`` played for the reference:
cross-engine oracles in tests (``test_tensorflow.py:335-382`` runs TF-LJ
against ``hoomd.md.pair.lj``) and reference forces for training labels
(``set_reference_forces``, ``tensorflowcompute.py:265-282``).

Each potential is a force compute: ``force(state, nlist) -> (forces [N,4],
virial [N,3,3])`` with per-particle energy in forces column 4. They are
implemented with the same NaN-safe conventions as user models, so they run
inside the same jitted step.
"""

import jax.numpy as jnp

from ..ops.numerics import nlist_rinv

__all__ = ["LennardJones", "WCA", "pair_force_from_energy_fn"]


def pair_force_from_energy_fn(pair_energy_fn):
    """Lift a per-pair energy ``u(1/r, type_i, type_j) -> energy`` (already
    half-counted) into a force compute over the neighbor list (packed
    ``[N, NN, 4]`` or wide-direct planes -- both supported through
    :func:`..ops.forces.compute_nlist_forces`'s callable form).

    Padded slots (r == 0) must yield exactly zero energy and derivative;
    use :func:`..ops.numerics.nlist_rinv`-style guards inside.
    """
    from ..ops.direct import NlistPlanes
    from ..ops.forces import compute_nlist_forces

    def force(state, nlist):
        types_i = state.types

        def total_energy(nl):
            rinv = nlist_rinv(nl)
            tj = (nl.type if isinstance(nl, NlistPlanes)
                  else nl[:, :, 3]).astype(jnp.int32)
            e = pair_energy_fn(rinv, types_i[:, None], tj)
            return jnp.sum(e, axis=1)

        forces, virial = compute_nlist_forces(nlist, total_energy,
                                              virial=True)
        return forces, virial

    return force


class LennardJones:
    """Lennard-Jones 12-6 pair potential with sharp cutoff.

    :param epsilon: well depth (scalar or ``[ntypes, ntypes]``).
    :param sigma: size parameter (scalar or ``[ntypes, ntypes]``).
    :param r_cut: cutoff radius (energy is zero beyond; no shift by default,
        matching ``hoomd.md.pair.lj`` defaults).
    """

    def __init__(self, epsilon=1.0, sigma=1.0, r_cut=3.0, shift=False):
        self.epsilon = jnp.asarray(epsilon)
        self.sigma = jnp.asarray(sigma)
        self.r_cut = float(r_cut)
        self.shift = shift

    def __call__(self, state, nlist):
        eps, sig = self.epsilon, self.sigma

        def energy(rinv, ti, tj):
            if eps.ndim == 2:
                e = eps[ti, tj]
                s = sig[ti, tj]
            else:
                e, s = eps, sig
            sr6 = (s * rinv) ** 6
            u = 4.0 * e * (sr6 * sr6 - sr6)
            if self.shift:
                sc6 = (s / self.r_cut) ** 6
                u_cut = 4.0 * e * (sc6 * sc6 - sc6)
                u = u - u_cut * (rinv > 0)
            inside = rinv > (1.0 / self.r_cut)
            return jnp.where(inside, u, jnp.zeros_like(u)) / 2.0

        return pair_force_from_energy_fn(energy)(state, nlist)


class WCA:
    """Weeks-Chandler-Anderson (purely repulsive shifted LJ).

    Uses the physical full-LJ form cut at the minimum ``2^(1/6) sigma``.
    Distinct from :class:`..models.layers.WCARepulsion`, which keeps
    reference parity with the ``(sigma/r)^6``-only form cut at
    ``2^(1/3) sigma`` (``layers.py:52-98``) -- the two cutoffs differ on
    purpose."""

    def __init__(self, epsilon=1.0, sigma=1.0):
        self.epsilon = jnp.asarray(epsilon)
        self.sigma = jnp.asarray(sigma)

    def __call__(self, state, nlist):
        eps, sig = self.epsilon, self.sigma
        r_min = 2.0 ** (1 / 6)

        def energy(rinv, ti, tj):
            sr6 = (sig * rinv) ** 6
            u = 4.0 * eps * (sr6 * sr6 - sr6) + eps * (rinv > 0)
            inside = (sig * rinv) > (1.0 / r_min)
            return jnp.where(inside, u, jnp.zeros_like(u)) / 2.0

        return pair_force_from_energy_fn(energy)(state, nlist)
