"""Round-3 probe 10: route around the rank-3 bf16 Mosaic crash.

kbench12 (re-run on jax 0.9.0 -- still crashing) bisected the failure
to rank-3 bf16 broadcast-subtract + reductions. Two rank-2 routes:

  A. per-row form: loop rows r in range(cap), every op is [B, C] bf16
     (B=16 cells in sublanes -- the bf16 native tile is (16, 128)).
     Same lane count as the group form, tighter occupancy predicate.
  B. mixed: f32 rank-3 subtraction (keeps the cancellation exact AND
     avoids the crashing pattern), cast d2/dx to bf16 for the pair
     eval + dual reductions.

Measure each against the f32 group-form LJ kernel at the honest 64k
shapes (B block, cap 40, C = 14*40 = 560).
"""
import functools
import os
import time

import numpy as np
import jax

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_htf"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CAP = 40
NB = 14
C = NB * CAP
N_CELLS = 1728          # ~64k/38
bf = jnp.bfloat16


def lj_slope(r2, dt):
    u = 1.0 / r2
    sr6 = u * u * u
    return -12.0 * (2.0 * sr6 - jnp.asarray(1.0, dt)) * sr6 * u


def bench(name, f, *args, iters=30):
    try:
        o = jax.block_until_ready(f(*args))
    except Exception as e:
        print(f"{name}: FAIL {repr(e).splitlines()[0][:100]}")
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    dt_ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name}: {dt_ms:.3f} ms")
    return o


def mk_inputs(dtype):
    rng = np.random.RandomState(0)
    gx = rng.rand(N_CELLS, C).astype(np.float32) * 4
    gy = rng.rand(N_CELLS, C).astype(np.float32) * 4
    gz = rng.rand(N_CELLS, C).astype(np.float32) * 4
    occ = np.full((N_CELLS, 1), 30, np.int32)
    return (jnp.asarray(occ),) + tuple(
        jnp.asarray(a).astype(dtype) for a in (gx, gy, gz))


def group_kernel(dt, occ_ref, gx_ref, gy_ref, gz_ref, ox_ref):
    """The production f32 shape: 8-row rank-3 groups, dual reduction."""
    gx, gy, gz = gx_ref[:], gy_ref[:], gz_ref[:]
    B = gx.shape[0]
    omax = occ_ref[0, 0]
    for b in range(1, B):
        omax = jnp.maximum(omax, occ_ref[b, 0])
    ox_ref[:] = jnp.zeros_like(ox_ref)
    zero = jnp.zeros((), dt)
    for g in range(CAP // 8):
        lo = g * 8

        @pl.when(lo < omax)
        def _(lo=lo):
            qx, qy, qz = (a[:, lo:lo + 8] for a in (gx, gy, gz))
            dx = gx[:, None, :] - qx[:, :, None]
            dy = gy[:, None, :] - qy[:, :, None]
            dz = gz[:, None, :] - qz[:, :, None]
            d2 = dx * dx + dy * dy + dz * dz
            row = jax.lax.broadcasted_iota(jnp.int32, (8, C), 0) + lo
            col = jax.lax.broadcasted_iota(jnp.int32, (8, C), 1)
            ok = (d2 <= 9.0) & ~((col < CAP) & (col == row))[None]
            r2 = jnp.maximum(d2, jnp.asarray(1e-4, dt))
            s = jnp.where(ok, lj_slope(r2, dt), zero)
            p = s * dx
            ox_ref[:, lo:lo + 8] = 2.0 * jnp.sum(p, axis=2)
            ox_ref[:, CAP:] = ox_ref[:, CAP:] - 2.0 * jnp.sum(p, axis=1)[:, CAP:]


def row_kernel(dt, occ_ref, gx_ref, gy_ref, gz_ref, ox_ref):
    """Route A: per-row rank-2 ops only."""
    gx, gy, gz = gx_ref[:], gy_ref[:], gz_ref[:]
    B = gx.shape[0]
    omax = occ_ref[0, 0]
    for b in range(1, B):
        omax = jnp.maximum(omax, occ_ref[b, 0])
    ox_ref[:] = jnp.zeros_like(ox_ref)
    zero = jnp.zeros((), dt)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    for r in range(CAP):
        @pl.when(r < omax)
        def _(r=r):
            dx = gx - gx[:, r:r + 1]
            dy = gy - gy[:, r:r + 1]
            dz = gz - gz[:, r:r + 1]
            d2 = dx * dx + dy * dy + dz * dz
            ok = (d2 <= 9.0) & (col != r)
            r2 = jnp.maximum(d2, jnp.asarray(1e-4, dt))
            s = jnp.where(ok, lj_slope(r2, dt), zero)
            p = s * dx
            ox_ref[:, r:r + 1] = 2.0 * jnp.sum(p, axis=1, keepdims=True)
            back = ox_ref[:, CAP:] - 2.0 * p[:, CAP:]
            ox_ref[:, CAP:] = back


def mixed_kernel(occ_ref, gx_ref, gy_ref, gz_ref, ox_ref):
    """Route B: f32 rank-3 subtraction, bf16 pair eval + reductions."""
    gx, gy, gz = gx_ref[:], gy_ref[:], gz_ref[:]
    B = gx.shape[0]
    omax = occ_ref[0, 0]
    for b in range(1, B):
        omax = jnp.maximum(omax, occ_ref[b, 0])
    ox_ref[:] = jnp.zeros_like(ox_ref)
    zero = jnp.zeros((), bf)
    for g in range(CAP // 8):
        lo = g * 8

        @pl.when(lo < omax)
        def _(lo=lo):
            qx, qy, qz = (a[:, lo:lo + 8] for a in (gx, gy, gz))
            dx = gx[:, None, :] - qx[:, :, None]
            dy = gy[:, None, :] - qy[:, :, None]
            dz = gz[:, None, :] - qz[:, :, None]
            d2 = dx * dx + dy * dy + dz * dz
            row = jax.lax.broadcasted_iota(jnp.int32, (8, C), 0) + lo
            col = jax.lax.broadcasted_iota(jnp.int32, (8, C), 1)
            ok = (d2 <= 9.0) & ~((col < CAP) & (col == row))[None]
            r2 = jnp.maximum(d2, 1e-4).astype(bf)
            s = jnp.where(ok, lj_slope(r2, bf), zero)
            p = s * dx.astype(bf)
            ox_ref[:, lo:lo + 8] = 2.0 * jnp.sum(p, axis=2).astype(jnp.float32)
            ox_ref[:, CAP:] = (ox_ref[:, CAP:]
                               - 2.0 * jnp.sum(p, axis=1)[:, CAP:].astype(jnp.float32))


def call(kernel, B, in_dt, out_dt):
    n_pad = -(-N_CELLS // B) * B
    spec = pl.BlockSpec((B, C), lambda i: (i, 0))
    occ_spec = pl.BlockSpec((B, 1), lambda i: (i, 0),
                            memory_space=pltpu.SMEM)

    @jax.jit
    def f(occ, gx, gy, gz):
        pad = lambda a: jnp.pad(a, ((0, n_pad - N_CELLS), (0, 0)))
        return pl.pallas_call(
            kernel,
            grid=(n_pad // B,),
            in_specs=[occ_spec] + [spec] * 3,
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((n_pad, C), out_dt),
        )(pad(occ), pad(gx), pad(gy), pad(gz))
    return f


# mixed row form: f32 per-row subtraction, bf16 eval
def mixed_row_kernel(occ_ref, gx_ref, gy_ref, gz_ref, ox_ref):
    gx, gy, gz = gx_ref[:], gy_ref[:], gz_ref[:]
    B = gx.shape[0]
    omax = occ_ref[0, 0]
    for b in range(1, B):
        omax = jnp.maximum(omax, occ_ref[b, 0])
    ox_ref[:] = jnp.zeros_like(ox_ref)
    zero = jnp.zeros((), bf)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    for r in range(CAP):
        @pl.when(r < omax)
        def _(r=r):
            dx = gx - gx[:, r:r + 1]
            dy = gy - gy[:, r:r + 1]
            dz = gz - gz[:, r:r + 1]
            d2 = dx * dx + dy * dy + dz * dz
            ok = (d2 <= 9.0) & (col != r)
            r2 = jnp.maximum(d2, 1e-4).astype(bf)
            s = jnp.where(ok, lj_slope(r2, bf), zero)
            p = s * dx.astype(bf)
            ox_ref[:, r:r + 1] = 2.0 * jnp.sum(
                p.astype(jnp.float32), axis=1, keepdims=True)
            ox_ref[:, CAP:] = (ox_ref[:, CAP:]
                               - 2.0 * p[:, CAP:].astype(jnp.float32))


if __name__ == "__main__":
    args32 = mk_inputs(jnp.float32)
    args16 = mk_inputs(bf)
    
    o_ref = bench("f32 group B=8      ", call(functools.partial(group_kernel, jnp.float32), 8, jnp.float32, jnp.float32), *args32)
    bench("f32 row   B=8      ", call(functools.partial(row_kernel, jnp.float32), 8, jnp.float32, jnp.float32), *args32)
    o_a = bench("bf16 row  B=16     ", call(functools.partial(row_kernel, bf), 16, bf, bf), *args16)
    o_b = bench("mixed group B=8    ", call(mixed_kernel, 8, jnp.float32, jnp.float32), *args32)
    o_b16 = bench("mixed group B=16   ", call(mixed_kernel, 16, jnp.float32, jnp.float32), *args32)
    
    if o_ref is not None:
        ref = np.asarray(o_ref[:N_CELLS], np.float64)
        scale = np.abs(ref).max()
        for name, o in (("bf16 row", o_a), ("mixed", o_b)):
            if o is None:
                continue
            err = np.abs(np.asarray(o[:N_CELLS], np.float64) - ref).max() / scale
            print(f"{name} max rel err vs f32: {err:.2e}")
    
    
    # ---- validation + scaling sanity on the suspicious row-form speed ----
    def validate(name, o):
        if o is None or o_ref is None:
            return
        ref = np.asarray(o_ref[:N_CELLS], np.float64)
        scale = np.abs(ref).max()
        err = np.abs(np.asarray(o[:N_CELLS], np.float64) - ref).max() / scale
        print(f"{name} max rel err vs f32 group: {err:.2e}")
    
    
    o_row = call(functools.partial(row_kernel, jnp.float32), 8, jnp.float32,
                 jnp.float32)(*args32)
    validate("f32 row", o_row)
    
    # occupancy scaling: halving occ should ~halve the predicated kernels
    occ_half = (jnp.full((N_CELLS, 1), 15, jnp.int32),) + args32[1:]
    bench("f32 group occ=15   ", call(functools.partial(group_kernel, jnp.float32), 8, jnp.float32, jnp.float32), *occ_half)
    bench("f32 row   occ=15   ", call(functools.partial(row_kernel, jnp.float32), 8, jnp.float32, jnp.float32), *occ_half)
    bench("mixed     occ=15   ", call(mixed_kernel, 8, jnp.float32, jnp.float32), *occ_half)
    
    o_mr = bench("mixed row B=8      ", call(mixed_row_kernel, 8, jnp.float32, jnp.float32), *args32)
    validate("mixed row", o_mr)
    