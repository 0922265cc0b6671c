"""Round-3 probe 11: kbench17 re-measured HONESTLY (inside lax.scan).

kbench17's per-dispatch timings through the axon tunnel were
meaningless: 30 pipelined dispatches + one block measured ~0.02 ms/call
for kernels whose VPU roofline is ~0.2 ms -- the tunnel's completion
signal does not serialize with device execution the way
block_until_ready does on a local device. (docs/performance.md rule 5
said exactly this; re-learned.) Here every variant runs under a
21-iteration lax.scan with the output fed back into the input (a
+1e-30*out perturbation the compiler cannot hoist), and the per-iter
time is (t(scan_21) - t(scan_1)) / 20.

Variants: the production f32 8-row-group kernel, the rank-2 per-row
kernel, and the mixed-precision (f32 subtract, bf16 pair eval) group
kernel, at the honest 64k shapes.
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

from kbench17 import (CAP, NB, C, N_CELLS, bf, group_kernel, row_kernel,
                      mixed_kernel, mk_inputs)


def call_raw(kernel, B, out_dt):
    n_pad = -(-N_CELLS // B) * B
    spec = pl.BlockSpec((B, C), lambda i: (i, 0))
    occ_spec = pl.BlockSpec((B, 1), lambda i: (i, 0),
                            memory_space=pltpu.SMEM)

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


def scan_time(name, kernel, B, args, out_dt=jnp.float32):
    f = call_raw(kernel, B, out_dt)
    occ, gx, gy, gz = args

    @functools.partial(jax.jit, static_argnums=1)
    def many(gx, n):
        def body(c, _):
            o = f(occ, c, gy, gz)
            return c + (jnp.asarray(1e-30, gx.dtype)
                        * o[:N_CELLS].astype(gx.dtype)), ()
        c, _ = jax.lax.scan(body, gx, None, length=n)
        return c

    try:
        jax.block_until_ready(many(gx, 1))
        jax.block_until_ready(many(gx, 21))
    except Exception as e:
        print(f"{name}: FAIL {repr(e).splitlines()[0][:100]}")
        return

    def t(n, reps=5):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(many(gx, n))
            best = min(best, time.perf_counter() - t0)
        return best

    dt_ms = (t(21) - t(1)) / 20 * 1e3
    print(f"{name}: {dt_ms:.3f} ms/iter")


args32 = mk_inputs(jnp.float32)

scan_time("f32 group B=8 ", functools.partial(group_kernel, jnp.float32),
          8, args32)
scan_time("f32 row   B=8 ", functools.partial(row_kernel, jnp.float32),
          8, args32)
scan_time("mixed grp B=8 ", mixed_kernel, 8, args32)
