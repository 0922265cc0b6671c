"""Pallas TPU kernel for the half-stencil (Newton's-third-law) analytic
pair-force loop of the cellwise neighbor mode.

Why a hand kernel here, when the full-stencil XLA form beat one before
(docs/performance.md): the half stencil evaluates each pair once and
accumulates BOTH sides -- a row-side reduction over the candidate (lane)
axis and a candidate-side reduction over the row (sublane) axis of the
*same* product arrays. XLA cannot multi-output-fuse reductions over
different axes of one intermediate, so it either materializes the
``[n_cells, cap, 14*cap]`` products to HBM (~1 GB/step at 64k) or
rematerializes the pair math twice -- measured 377 steps/s vs the full
stencil's 439 at 64k, i.e. the lane savings were eaten. Inside a Pallas
kernel both reductions accumulate in VMEM in one pass over the lanes, so
the 14/27 lane saving is real.

Division of labor (each part where it is cheapest):

- XLA builds the candidate planes (27->14 static rolls + per-direction
  offsets -- contiguous data movement it handles perfectly);
- the kernel does the lane math and the dual reductions, emitting one
  ``[n_cells, 14*cap]`` array per quantity: block 0 = the row-side
  (forward) sums, blocks 1..13 = the candidate-side (Newton back) sums;
- XLA applies the 13 inverse rolls pushing each back block onto its home
  cell and adds everything up.

Replaces the reference's CSR-reshape + per-pair force CUDA kernels
(``TensorflowCompute.cu:80-209``) as the hot kernel of the framework.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .cellwise import (_HALF_OFFS, _relative_coords, _roll_back)

__all__ = ["half_stencil_pair_forces"]


def _kernel(pair_eval, const_shapes, with_types, rcut_matrix, cap, n_blocks,
            rc2, min_r2, needs_virial, needs_energy, *refs):
    """One grid step: ``B`` cells' rows against their 14-block candidate
    planes; dual reductions accumulate in VMEM/registers.

    ``pair_eval(consts, r2[, ti, tj])`` is the closure-hoisted pair
    function: every array the user's ``pair_fn`` closed over (built-in
    epsilon/sigma scalars, NN weights from the lane-separability probe,
    ...) arrives through ``refs`` instead of being baked into the kernel
    jaxpr -- Pallas rejects captured array constants outright.
    """
    C = n_blocks * cap
    i = 0
    gx_ref, gy_ref, gz_ref = refs[:3]
    i = 3
    gt_ref = None
    if with_types or rcut_matrix is not None:
        gt_ref = refs[i]
        i += 1
    consts = []
    for shp in const_shapes:
        ref = refs[i]
        i += 1
        if shp == ():
            consts.append(ref[0, 0])
        elif len(shp) == 1:
            consts.append(ref[:].reshape(shp))
        else:
            consts.append(ref[:])
    out_refs = refs[i:]

    gx, gy, gz = gx_ref[:], gy_ref[:], gz_ref[:]          # [B, C]
    # block 0 is the self cell with zero offset: the rows themselves
    qx, qy, qz = gx[:, :cap], gy[:, :cap], gz[:, :cap]    # [B, cap]
    dx = gx[:, None, :] - qx[:, :, None]                  # [B, cap, C]
    dy = gy[:, None, :] - qy[:, :, None]
    dz = gz[:, None, :] - qz[:, :, None]
    d2 = dx * dx + dy * dy + dz * dz

    row = jax.lax.broadcasted_iota(jnp.int32, (cap, C), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (cap, C), 1)
    not_self = jnp.logical_not((col < cap) & (col == row))[None]
    ok = (d2 <= rc2) & not_self
    if gt_ref is not None:
        gt = gt_ref[:]
        ti = gt[:, :cap][:, :, None]
        tj = gt[:, None, :]
    if rcut_matrix is not None:
        # pair_rc2 unrolls the CONCRETE host matrix into python-scalar
        # mask terms (no array constant reaches the kernel jaxpr)
        from .nlist import pair_rc2
        ok = ok & (d2 <= pair_rc2(ti, tj, rcut_matrix, d2.dtype))
    r2 = jnp.maximum(d2, min_r2)
    if with_types:
        U, dU = pair_eval(consts, r2, ti, tj)
    else:
        U, dU = pair_eval(consts, r2)
    zero = jnp.zeros((), dtype=d2.dtype)
    s = jnp.where(ok, dU, zero)

    def dual(prod, fwd_c, back_c, out_ref):
        """out[:, :cap] = row-side sum; out[:, cap:] = candidate-side
        sums of the directed blocks (block 0's back side is the self
        cell's second counting -- already covered by the row side)."""
        fwd = fwd_c * jnp.sum(prod, axis=2)               # [B, cap]
        back = back_c * jnp.sum(prod, axis=1)             # [B, C]
        out_ref[:, :cap] = fwd
        out_ref[:, cap:] = back[:, cap:]

    oi = 0
    if needs_energy:
        # the energy lanes (U, its mask select, one dual reduction) are
        # ~10% of the kernel; the hot loop skips them on all but
        # logged/final steps and the unused U math DCEs away
        g = jnp.where(ok, U, zero)
        dual(g, 0.5, 0.5, out_refs[0])
        oi = 1
    dual(s * dx, 2.0, -2.0, out_refs[oi + 0])
    dual(s * dy, 2.0, -2.0, out_refs[oi + 1])
    dual(s * dz, 2.0, -2.0, out_refs[oi + 2])
    if needs_virial:
        dual(s * dx * dx, -1.0, -1.0, out_refs[oi + 3])
        dual(s * dy * dy, -1.0, -1.0, out_refs[oi + 4])
        dual(s * dz * dz, -1.0, -1.0, out_refs[oi + 5])
        dual(s * dx * dy, -1.0, -1.0, out_refs[oi + 6])
        dual(s * dx * dz, -1.0, -1.0, out_refs[oi + 7])
        dual(s * dy * dz, -1.0, -1.0, out_refs[oi + 8])


def half_stencil_pair_forces(positions, types, valid, plan, lo, pair_fn,
                             needs_virial=False, min_r2=1e-4,
                             with_types=False, rcut_matrix=None,
                             lengths=None, block_cells=None,
                             needs_energy=True, interpret=False,
                             lane_dtype=None):
    """Drop-in equivalent of :func:`.cellwise.analytic_pair_forces`
    computed by the Pallas half-stencil kernel (same contract, same
    returns; see that docstring for the physics and masking rules).

    :param block_cells: cells per kernel grid step (VMEM working set is
        ``~8 * block_cells * cap * 14*cap * 4`` bytes; default sized to
        ~4 MB).
    :param interpret: run the kernel in interpreter mode (CPU tests).
    :param lane_dtype: optional reduced precision (``jnp.bfloat16``) for
        the pair lanes: candidate planes are cast on entry, the whole
        lane computation (displacements, pair function, dual reductions)
        runs at that precision, and the per-cell sums are cast back.
        Opt-in only -- bf16 displacement cancellation costs ~1e-2
        relative force error through an r^-12 core (see
        docs/performance.md for the measured accuracy/speed tradeoff).
    """
    from jax.experimental import pallas as pl

    dtype = positions.dtype
    out_dtype = dtype if lane_dtype is None else jnp.dtype(lane_dtype)
    n_cells, cap = plan.n_cells, plan.capacity
    offs_list = _HALF_OFFS
    n_blocks = len(offs_list)
    C = n_blocks * cap
    _, _, _, gx, gy, gz = _relative_coords(
        positions, valid, plan, lo, offs_list, lengths)

    need_types = with_types or rcut_matrix is not None
    inputs = [gx, gy, gz]
    if need_types:
        from .cellwise import _roll_offs
        inputs.append(_roll_offs(types.astype(dtype), plan, offs_list))

    n_out = (1 if needs_energy else 0) + 3 + (6 if needs_virial else 0)
    # grid blocking: pad n_cells to a multiple of the block size. Padded
    # rows replicate row 0's candidates; their outputs are garbage but
    # they are sliced off before the roll-back (and they never write
    # anywhere else: back sums stay within their own row block).
    if block_cells is None:
        # Mosaic needs the leading block dim divisible by 8; scale up in
        # multiples of 8 while the VMEM working set stays under ~14 MB of
        # the 16 MB scoped limit. The cost model uses the TILE-PADDED
        # dims (cap pads to 8 sublanes, the lane dim to 128 -- at cap 13
        # the padding is 1.7x and the unpadded estimate OOMs Mosaic's
        # stack allocator) and ~5 + n_out live [B, cap, C] arrays (the
        # virial variant holds 10 output accumulations live). Measured
        # at 64k/cap 32 slim (n_out=3): B=24 runs 7% faster than B=8;
        # B=16 and B=32 are both slower.
        pad8 = -(-cap // 8) * 8
        pad128 = -(-C // 128) * 128
        target = 14 * 1024 * 1024 // ((5 + n_out) * pad8 * pad128 * 4)
        block_cells = max(8, (target // 8) * 8)
    if lane_dtype is not None and jnp.dtype(lane_dtype).itemsize < 4:
        # bf16 tiles are (16, 128): the out block's sublane dim (B) must
        # be a multiple of 16
        block_cells = max(16, (int(block_cells) // 16) * 16)
    B = int(block_cells)
    n_pad = -(-n_cells // B) * B
    if n_pad != n_cells:
        inputs = [jnp.pad(a, ((0, n_pad - n_cells), (0, 0)), mode="edge")
                  for a in inputs]
    if lane_dtype is not None:
        inputs = [a.astype(out_dtype) for a in inputs]

    # hoist everything pair_fn closed over (built-in epsilon/sigma, NN
    # weights from the lane-separability probe, outer-jit tracers) into
    # explicit kernel operands: Pallas rejects captured array constants,
    # and tracers must be operands anyway. make_jaxpr splits the closure
    # into (constvars, eval) for us; the jaxpr is traced at the exact
    # in-kernel block shapes so eval_jaxpr replays it verbatim.
    from jax._src import core as _jcore
    sds = lambda s: jax.ShapeDtypeStruct(s, out_dtype)
    pair_args = ([sds((B, cap, C)), sds((B, cap, 1)), sds((B, 1, C))]
                 if with_types else [sds((B, cap, C))])
    closed = jax.make_jaxpr(pair_fn)(*pair_args)
    small = []                  # whole-array-per-grid-step operands
    const_shapes = []
    for c in closed.consts:
        c = jnp.asarray(c)
        const_shapes.append(c.shape)
        small.append(c if c.ndim >= 2 else c.reshape(1, max(c.size, 1)))
    if lane_dtype is not None:
        small = [c.astype(out_dtype) if jnp.issubdtype(c.dtype, jnp.floating)
                 else c for c in small]

    def pair_eval(consts, *args):
        return tuple(_jcore.eval_jaxpr(closed.jaxpr, consts, *args))

    rc2 = float(plan.r_cut) ** 2
    kernel = functools.partial(
        _kernel, pair_eval, const_shapes, with_types,
        None if rcut_matrix is None else np.asarray(rcut_matrix),
        cap, n_blocks,
        float(rc2), float(min_r2), needs_virial, needs_energy)

    spec = pl.BlockSpec((B, C), lambda i: (i, 0))
    small_specs = [pl.BlockSpec(s.shape, (lambda i, nd=s.ndim: (0,) * nd))
                   for s in small]
    outs = pl.pallas_call(
        kernel,
        grid=(n_pad // B,),
        in_specs=[spec] * len(inputs) + small_specs,
        out_specs=[spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((n_pad, C), out_dtype)] * n_out,
        interpret=interpret,
    )(*inputs, *small)

    def assemble(out):
        acc = out[:n_cells, :cap].astype(dtype)
        for t in range(1, n_blocks):
            acc = acc + _roll_back(
                out[:n_cells, t * cap:(t + 1) * cap], plan,
                offs_list[t]).astype(dtype)
        return acc.reshape(-1)

    oi = 0
    if needs_energy:
        e = assemble(outs[0])
        oi = 1
    else:
        e = jnp.zeros((plan.n_slots,), dtype=dtype)
    fx, fy, fz = (assemble(o) for o in outs[oi:oi + 3])
    forces4 = jnp.stack([fx, fy, fz, e], axis=-1) * valid[:, None]
    virial = None
    if needs_virial:
        wxx, wyy, wzz, wxy, wxz, wyz = (assemble(o) for o in outs[oi + 3:])
        W = jnp.stack([
            jnp.stack([wxx, wxy, wxz], -1),
            jnp.stack([wxy, wyy, wyz], -1),
            jnp.stack([wxz, wyz, wzz], -1)], -2)
        virial = W * valid[:, None, None]
    return forces4, virial
