"""Lane-separable fast path for *generic* :class:`..models.simmodel.SimModel`.

The cellwise analytic route (:func:`.cellwise.analytic_pair_forces`)
needs a per-lane pair function ``U(r2, ti, tj) -> (U, dU/dr2)``.
:class:`..models.pair.PairModel` declares one; a generic ``SimModel``
is an opaque ``compute`` whose energy *may or may not* be a sum of
independent per-lane terms. Most reference-style models are (every LJ /
NN-pair-potential example in ``/root/reference/examples`` computes
``energy = sum_over_lanes f(r_ij)`` and calls ``compute_nlist_forces``,
e.g. ``build_examples.py:31-43``), so the engine *probes* for that
structure instead of requiring the user to declare it:

1. **Synthesis** (:func:`synthesize_pair_fn`): evaluate the user's full
   model on a synthetic single-lane planes input -- lane ``l`` of row
   ``m`` holds displacement ``(r_m, 0, 0)`` and neighbor type ``tj_m``,
   with row type ``ti_m`` and positions at the origin. For a
   lane-separable model the output's energy column IS the per-lane
   energy ``g(r2)`` and its force column encodes the slope
   (``fx = 4 r g'(r2)``), so one model call yields both halves of the
   ``(U, dU) = (2g, 2g')`` contract (PairModel convention: full pair
   energy per lane; the kernel's 0.5 energy coefficient and factor-2
   force coefficient then reproduce the generic route exactly).

2. **Validation** (:func:`validate_pair_fn`): the candidate is only
   trusted after its analytic forces/energy match the generic planes
   route *on the actual current state* (one jitted comparison per
   attach configuration). Any non-separable structure -- cross-lane
   coupling, position-dependent terms, anisotropic component use --
   produces a force mismatch on real data and disqualifies the fast
   path, silently keeping the generic vjp route. False positives would
   need a model wrong in exactly the same way on every lane of a real
   disordered configuration at f32 precision.

Limits (documented, validation-enforced where possible): models with
mutable non-weight state that evolves per call (e.g. EDS bias) see one
framework-driven call per *kernel* instead of per step, and models
using ``positions`` beyond the type column are rejected by validation.
"""

import jax
import jax.numpy as jnp

from .direct import NlistPlanes

__all__ = ["synthesize_pair_fn", "validate_pair_fn"]


def synthesize_pair_fn(model, box):
    """Build an ``analytic_pair_forces``-compatible ``pair_fn`` from a
    generic model's ``compute`` (see module docstring).

    :param model: the :class:`..models.simmodel.SimModel`.
    :param box: the simulation box passed to the model (may be traced).
    :returns: ``pair_fn(r2, ti, tj) -> (U, dU/dr2)`` where ``U`` is the
        full per-pair energy (PairModel convention).
    """

    def pair_fn(r2, ti, tj):
        shape = r2.shape
        dtype = r2.dtype
        r2f = r2.reshape(-1)
        r = jnp.sqrt(r2f)
        m = r.shape[0]
        tif = jnp.broadcast_to(ti, shape).reshape(-1).astype(dtype)
        tjf = jnp.broadcast_to(tj, shape).reshape(-1).astype(dtype)
        z = jnp.zeros((m, 1), dtype)
        planes = NlistPlanes(dx=r[:, None], dy=z, dz=z,
                             type=tjf[:, None])
        pos4 = jnp.concatenate(
            [jnp.zeros((m, 3), dtype), tif[:, None]], axis=1)
        out = model([planes, pos4, box], training=False)
        f4 = out[0]
        # e-column = g(r2) (the user's per-particle energy with exactly
        # one lane); fx = 2 * d(g)/d(dx) = 4 r g'(r2). Models following
        # reference example 08 return forces[:, :3] (no energy column);
        # their synthesized energy is zero -- fine for every consumer
        # that runs with needs_energy=False (the training fast path).
        if f4.shape[1] >= 4:
            U = (2.0 * f4[:, 3]).astype(dtype)
        else:
            U = jnp.zeros((m,), dtype)
        dU = (f4[:, 0] / (2.0 * r)).astype(dtype)
        return U.reshape(shape), dU.reshape(shape)

    return pair_fn


def validate_pair_fn(model, pair_fn, slot_state, aux, layout,
                     rtol=2e-3, atol=2e-4):
    """One-shot check that ``pair_fn`` reproduces the model's generic
    planes-route forces and per-particle energy on the CURRENT state.

    Runs jitted on device; returns a bool (host). The comparison uses
    the full-stencil XLA kernel so it exercises exactly the displacement
    geometry the fast path will see.
    """
    from . import cellwise as cw

    @jax.jit
    def both():
        planes = layout.planes(slot_state, aux)
        ref_out = model([planes, slot_state.positions4, slot_state.box],
                        training=False)
        ref_f4 = ref_out[0]
        lo, lengths = layout._geom(slot_state)
        fast_f4, _ = cw.analytic_pair_forces(
            slot_state.positions, slot_state.types, aux["valid"],
            layout.plan, lo, pair_fn, needs_virial=False,
            with_types=True, rcut_matrix=layout.rc_matrix,
            stencil="full", lengths=lengths)
        return ref_f4, fast_f4

    try:
        ref_f4, fast_f4 = both()
        import numpy as np
        ref = np.asarray(ref_f4) * np.asarray(aux["valid"])[:, None]
        fast = np.asarray(fast_f4)
        if ref.ndim != 2 or fast.ndim != 2:
            return False
        # example-08-style models emit forces[:, :3]; judge the common
        # columns (the synthesized energy is zero for them by design)
        m = min(ref.shape[1], fast.shape[1])
        ref, fast = ref[:, :m], fast[:, :m]
        if not (np.isfinite(ref).all() and np.isfinite(fast).all()):
            return False
        scale = np.abs(ref).max(axis=0) + 1e-6
        err = np.abs(ref - fast).max(axis=0)
        return bool((err <= atol + rtol * scale).all())
    except Exception:
        # any structural failure (shape errors from exotic computes,
        # replay divergence, ...) simply disqualifies the fast path
        return False
