"""Pallas TPU kernel for the lane-contraction VJP's backward pass when
the pair function is the Chebyshev proxy (:mod:`.chebyshev`).

The custom VJP of :func:`.pair_train.pair_train_forces` reduces the
whole parameter gradient to the gradient of ONE weighted scalar lane
sum.  Its generic backward builds that sum in XLA over the rank-3
``[n_cells, cap, 14*cap]`` lane structure and ``jax.grad``s the pair
function through it -- correct for arbitrary ``pair_apply``, but it
re-materializes in XLA exactly the hundreds-of-MB intermediates the
*primal* moved to the Pallas half-stencil kernel to avoid
(ops/cellwise_pallas.py).  Measured at the honest 64k state
(probes/kbench26): backward ~3.5 ms vs the 1.3 ms eval kernel — the
single biggest piece of the ~6.5x online-training tax of round 4
(benchmarks/north_star.json).  XLA fuses this single-reduction shape
well (the XLA and Pallas backwards measure equal); this kernel keeps
the backward off the XLA fusion cliff, carries the occupancy
machinery, and is the form a future reduced-precision moment pass
drops into.

For the Chebyshev proxy the generic machinery is overkill: the lane
function is LINEAR in its coefficients, so the parameter gradient is
coefficient-independent and collapses to ``K`` weighted lane-moment
sums of the basis functions.  With ``u = 1/max(d2, min_r2)``,
``w = clip((u - mid) * inv_half, -1, 1)`` and
``over = max(u - u_hi, 0)`` (the C^1 overlap continuation of
:func:`.chebyshev.make_pair_proxy`; note ``T_k(w) = 1`` on clipped
overlap lanes, which unifies the continuation's gradient with the
in-range one):

    d/dc_k  <ct, F4> = sum_lanes  wE * T_k(w)
    d/dcd_k <ct, F4> = sum_lanes (wE * over - wF * u^2) * T_k(w)

where ``wF``/``wE`` are the Newton-combined cotangent weights of
:func:`.pair_train.pair_train_forces` (half lane set).  The kernel
walks the same occupancy-predicated half-stencil lane structure as the
primal (``.cellwise_pallas._kernel``), generates ``T_k`` by the
two-term recurrence, and accumulates the ``2 K`` (typed:
``n_pairs * 2 K``) moment sums across grid steps into one VMEM-resident
output row.  Per lane this costs the base displacement/mask math plus
~6 fused ops per basis term -- about 1.5x the primal kernel, versus the
XLA route's ~5x.

Typed proxies (per-type-pair coefficient tables,
:func:`.chebyshev.make_typed_pair_proxy`) accumulate one moment pair
per unordered type pair, selected by the same lane masks the evaluator
uses.

Replaces (together with ops/pair_train.py) the reference's online
training loop ``/root/reference/htf/tensorflowcompute.py:346-370``,
whose backward runs the TF graph's autodiff on the dense nlist.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cellwise import _HALF_OFFS, _relative_coords, _roll_offs

__all__ = ["proxy_bwd_moments", "supported_basis"]

_OUT_LANES = 128


def supported_basis(basis, dtype, mesh=None):
    """Can :func:`proxy_bwd_moments` handle this configuration?
    (f32 lanes only -- the f64 path keeps the generic XLA backward --
    and the moment count must fit one output tile row.)"""
    if basis is None or mesh is not None:
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    n_pairs = len(basis["pairs"]) if basis["pairs"] else 1
    return 2 * basis["K"] * n_pairs <= _OUT_LANES


def _kernel(cap, n_blocks, rc2, min_r2, K, mid, inv_half, u_hi,
            pairs, rcut_matrix, needs_energy, *refs):
    """One grid step: accumulate the ``2 K`` (typed: ``P * 2 K``)
    moment sums of ``B`` cells' half-stencil lanes into the single
    VMEM-resident output row (constant index map; initialized at grid
    step 0)."""
    C = n_blocks * cap
    occ_ref = refs[0]
    gx_ref, gy_ref, gz_ref = refs[1:4]
    i = 4
    gt_ref = None
    if pairs is not None or rcut_matrix is not None:
        gt_ref = refs[i]
        i += 1
    cgx_ref, cgy_ref, cgz_ref = refs[i:i + 3]
    i += 3
    cge_ref = None
    if needs_energy:
        cge_ref = refs[i]
        i += 1
    out_ref = refs[i]

    gx, gy, gz = gx_ref[:], gy_ref[:], gz_ref[:]          # [B, C]
    cgx, cgy, cgz = cgx_ref[:], cgy_ref[:], cgz_ref[:]
    if gt_ref is not None:
        gt = gt_ref[:]
        tj = gt[:, None, :]
    B = gx.shape[0]
    dtype = gx.dtype
    omax = occ_ref[0, 0]
    for b in range(1, B):
        omax = jnp.maximum(omax, occ_ref[b, 0])

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    n_pairs = len(pairs) if pairs is not None else 1
    zero = jnp.zeros((), dtype=dtype)
    # per-k accumulators (registers; groups are unrolled)
    accs = [zero] * (2 * K * n_pairs)

    groups = [(g * 8, min(cap, (g + 1) * 8))
              for g in range(-(-cap // 8))]
    # predication caveat: the accumulators must come out of the group
    # loop regardless of the predicate, so each group's contribution is
    # computed under pl.when into a tiny VMEM scratch... -- instead we
    # keep the v1 structure (whole-group pl.when would hoist traced
    # values out of the region, which Mosaic rejects) by folding the
    # group-active predicate into the lane mask: a skipped group's
    # lanes are masked to zero and its lane math still runs.  The
    # occupancy saving is recovered where it matters most -- the
    # *trailing* groups of a B-block are ghost-only for every cell, and
    # their masked sums fold to zero -- while keeping every accumulator
    # dataflow unconditional.  Measured cost of the unconditional form
    # vs the primal's predicated groups: the backward runs each group
    # once per grid step either way; the moment sums dominate.
    for lo_r, hi_r in groups:
        w_rows = hi_r - lo_r
        active = (jnp.asarray(lo_r, jnp.int32) < omax)
        qx = gx[:, lo_r:hi_r]
        qy = gy[:, lo_r:hi_r]
        qz = gz[:, lo_r:hi_r]
        dx = gx[:, None, :] - qx[:, :, None]              # [B, w, C]
        dy = gy[:, None, :] - qy[:, :, None]
        dz = gz[:, None, :] - qz[:, :, None]
        d2 = dx * dx + dy * dy + dz * dz
        row = jax.lax.broadcasted_iota(jnp.int32, (w_rows, C), 0) + lo_r
        col = jax.lax.broadcasted_iota(jnp.int32, (w_rows, C), 1)
        not_self = jnp.logical_not((col < cap) & (col == row))[None]
        ok = (d2 <= rc2) & not_self & active
        if gt_ref is not None:
            ti = gt[:, lo_r:hi_r][:, :, None]
        if rcut_matrix is not None:
            from .nlist import pair_rc2
            ok = ok & (d2 <= pair_rc2(ti, tj, rcut_matrix, d2.dtype))
        r2 = jnp.maximum(d2, min_r2)

        # Newton-combined cotangent weights (pair_train.py bwd, half
        # lane set): row side from the block-0 slice of the ct planes,
        # candidate side from the directed blocks only
        ctfx = cgx[:, lo_r:hi_r][:, :, None]
        ctfy = cgy[:, lo_r:hi_r][:, :, None]
        ctfz = cgz[:, lo_r:hi_r][:, :, None]
        wF = ctfx * dx + ctfy * dy + ctfz * dz
        directed = (col >= cap).astype(dtype)[None]
        wF = wF - directed * (cgx[:, None, :] * dx +
                              cgy[:, None, :] * dy +
                              cgz[:, None, :] * dz)
        wF = jnp.where(ok, 2.0 * wF, zero)
        u = 1.0 / r2
        over = jnp.maximum(u - u_hi, 0.0)
        if needs_energy:
            cge = cge_ref[:]
            wE = cge[:, lo_r:hi_r][:, :, None] + \
                directed * cge[:, None, :]
            wE = jnp.where(ok, 0.5 * wE, zero)
            A = wE                                        # d/dc weight
            Bc = wE * over - wF * (u * u)                 # d/dcd weight
        else:
            A = None
            Bc = -wF * (u * u)

        wch = jnp.clip((u - mid) * inv_half, -1.0, 1.0)
        if pairs is not None:
            masks = []
            for a, b in pairs:
                m = (ti == float(a)) & (tj == float(b))
                if a != b:
                    m = m | ((ti == float(b)) & (tj == float(a)))
                masks.append(m.astype(dtype))
        else:
            masks = [None]

        # T_k recurrence with fused weighted sums
        t_prev = jnp.ones_like(wch)
        t_cur = wch
        two_w = 2.0 * wch
        for k in range(K):
            t_k = t_prev if k == 0 else t_cur
            for p, m in enumerate(masks):
                base = p * 2 * K
                if A is not None:
                    term = A * t_k if m is None else A * m * t_k
                    accs[base + k] = accs[base + k] + jnp.sum(term)
                term = Bc * t_k if m is None else Bc * m * t_k
                accs[base + K + k] = accs[base + K + k] + jnp.sum(term)
            if k >= 1:
                t_prev, t_cur = t_cur, two_w * t_cur - t_prev

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _OUT_LANES), 1)
    vec = jnp.zeros((1, _OUT_LANES), dtype=dtype)
    for idx, s in enumerate(accs):
        vec = vec + jnp.where(lane == idx, s, zero)
    out_ref[0:1, :] = out_ref[0:1, :] + vec


def proxy_bwd_moments(positions, types, valid, ct, plan, lo, basis, *,
                      min_r2=1e-4, rcut_matrix=None, lengths=None,
                      needs_energy=True, block_cells=8,
                      interpret=False):
    """The proxy backward's moment sums over the half-stencil lanes.

    :param ct: ``[n_slots, 4]`` cotangent (already ``* valid`` folded
        by the caller or not -- this function folds it).
    :param basis: the evaluator's ``.basis`` dict (see
        :func:`.chebyshev.make_pair_proxy`).
    :returns: ``(g_c, g_cd)`` -- lists of ``K`` scalars (untyped), or
        dicts ``{(a, b): [K scalars]}`` (typed).
    """
    dtype = positions.dtype
    n_cells, cap = plan.n_cells, plan.capacity
    offs_list = _HALF_OFFS
    n_blocks = len(offs_list)
    C = n_blocks * cap
    K = int(basis["K"])
    pairs = basis["pairs"]

    _, _, _, gx, gy, gz = _relative_coords(
        positions, valid, plan, lo, offs_list, lengths)
    ctv = ct * valid[:, None]
    inputs = [gx, gy, gz]
    if pairs is not None or rcut_matrix is not None:
        inputs.append(_roll_offs(types.astype(dtype), plan, offs_list))
    inputs.append(_roll_offs(ctv[:, 0], plan, offs_list))
    inputs.append(_roll_offs(ctv[:, 1], plan, offs_list))
    inputs.append(_roll_offs(ctv[:, 2], plan, offs_list))
    if needs_energy:
        inputs.append(_roll_offs(ctv[:, 3], plan, offs_list))

    B = int(block_cells)
    occ = valid.reshape(n_cells, cap).sum(axis=1).astype(jnp.int32)[:, None]
    rc2 = float(plan.r_cut) ** 2

    kernel = functools.partial(
        _kernel, cap, n_blocks, float(rc2), float(min_r2), K,
        float(basis["mid"]), float(basis["inv_half"]),
        float(basis["u_hi"]),
        pairs, None if rcut_matrix is None else np.asarray(rcut_matrix),
        needs_energy)

    spec = pl.BlockSpec((B, C), lambda i: (i, 0))
    occ_spec = pl.BlockSpec((B, 1), lambda i: (i, 0),
                            memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((1, _OUT_LANES), lambda i: (0, 0))

    npad = -(-n_cells // B) * B
    occ_l = occ
    ins = inputs
    if npad != n_cells:
        occ_l = jnp.pad(occ, ((0, npad - n_cells), (0, 0)))
        ins = [jnp.pad(a, ((0, npad - n_cells), (0, 0)), mode="edge")
               for a in inputs]
    out = pl.pallas_call(
        kernel,
        grid=(npad // B,),
        in_specs=[occ_spec] + [spec] * len(ins),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((1, _OUT_LANES), dtype),
        interpret=interpret,
    )(occ_l, *ins)[0]

    if pairs is None:
        g_c = [out[k] for k in range(K)]
        g_cd = [out[K + k] for k in range(K)]
        return g_c, g_cd
    g_c = {}
    g_cd = {}
    for p, ab in enumerate(pairs):
        base = p * 2 * K
        g_c[ab] = [out[base + k] for k in range(K)]
        g_cd[ab] = [out[base + K + k] for k in range(K)]
    return g_c, g_cd
