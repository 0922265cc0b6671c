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

    def pair_energy(self, r2, type_i, type_j):
        """Full pair energy from r^2 (the analytic cellwise fast path;
        see ops/cellwise.analytic_pair_forces)."""
        eps, sig = self.epsilon, self.sigma
        if eps.ndim == 2:
            ti = type_i.astype(jnp.int32)
            tj = type_j.astype(jnp.int32)
            e = eps[ti, tj]
            s = sig[ti, tj]
        else:
            e, s = eps, sig
        inv = 1.0 / r2
        sr6 = (s * s * inv) ** 3
        u = 4.0 * e * (sr6 * sr6 - sr6)
        if self.shift:
            sc6 = (s / self.r_cut) ** 6
            u = u - 4.0 * e * (sc6 * sc6 - sc6)
        inside = r2 <= self.r_cut * self.r_cut
        return jnp.where(inside, u, jnp.zeros_like(u))

    def pair_energy_and_slope(self, r2, type_i, type_j):
        """(U, dU/dr2) sharing sr6 between energy and slope (the fast
        form the analytic route prefers)."""
        eps, sig = self.epsilon, self.sigma
        if eps.ndim == 2:
            ti = type_i.astype(jnp.int32)
            tj = type_j.astype(jnp.int32)
            e = eps[ti, tj]
            s = sig[ti, tj]
        else:
            e, s = eps, sig
        inv = 1.0 / r2
        sr6 = (s * s * inv) ** 3
        u = 4.0 * e * (sr6 * sr6 - sr6)
        du = -12.0 * e * (2.0 * sr6 - 1.0) * sr6 * inv
        if self.shift:
            sc6 = (s / self.r_cut) ** 6
            u = u - 4.0 * e * (sc6 * sc6 - sc6)
        inside = r2 <= self.r_cut * self.r_cut
        zero = jnp.zeros_like(u)
        return jnp.where(inside, u, zero), jnp.where(inside, du, zero)


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

    def pair_energy(self, r2, type_i, type_j):
        """Full pair energy from r^2 (the analytic cellwise fast path)."""
        eps, sig = self.epsilon, self.sigma
        r_min = 2.0 ** (1 / 6)
        inv = 1.0 / r2
        sr6 = (sig * sig * inv) ** 3
        u = 4.0 * eps * (sr6 * sr6 - sr6) + eps
        inside = r2 < (sig * r_min) ** 2
        return jnp.where(inside, u, jnp.zeros_like(u))

    def pair_energy_and_slope(self, r2, type_i, type_j):
        eps, sig = self.epsilon, self.sigma
        r_min = 2.0 ** (1 / 6)
        inv = 1.0 / r2
        sr6 = (sig * sig * inv) ** 3
        u = 4.0 * eps * (sr6 * sr6 - sr6) + eps
        du = -12.0 * eps * (2.0 * sr6 - 1.0) * sr6 * inv
        inside = r2 < (sig * r_min) ** 2
        zero = jnp.zeros_like(u)
        return jnp.where(inside, u, zero), jnp.where(inside, du, zero)
