"""Round-3 probe 5: bisect the bf16 Mosaic crash. Build up the
half-stencil kernel's op mix in bf16 at the real shapes until the
remote compile fails."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl

B, CAP, C = 16, 32, 448
dt = jnp.bfloat16

def run(name, kernel, n_in=3, n_out=1):
    xs = [jnp.asarray(np.random.rand(64, C), np.float32).astype(dt)
          for _ in range(n_in)]
    spec = pl.BlockSpec((B, C), lambda i: (i, 0))
    try:
        out = pl.pallas_call(
            kernel,
            grid=(64 // B,),
            in_specs=[spec] * n_in,
            out_specs=[spec] * n_out,
            out_shape=[jax.ShapeDtypeStruct((64, C), dt)] * n_out,
        )(*xs)
        jax.block_until_ready(out)
        print(f"{name}: ok")
    except Exception as e:
        print(f"{name}: FAIL {repr(e).splitlines()[0][:110]}")

# 1. plain elementwise
run("elementwise", lambda a, b, c, o: o.__setitem__(slice(None), a[:] + b[:] * c[:]))

# 2. the broadcast product [B, CAP, C]
def k_bcast(a, b, c, o):
    a = a[:]
    qa = a[:, :CAP]
    d = a[:, None, :] - qa[:, :, None]
    o[:] = jnp.sum(d * d, axis=1)
run("broadcast-sub + sublane sum", k_bcast)

# 3. + lane sum into the first CAP cols
def k_dual(a, b, c, o):
    a = a[:]
    qa = a[:, :CAP]
    d = a[:, None, :] - qa[:, :, None]
    p = d * d
    fwd = jnp.sum(p, axis=2)
    back = jnp.sum(p, axis=1)
    o[:, :CAP] = fwd
    o[:, CAP:] = back[:, CAP:]
run("dual reduction + col writes", k_dual)

# 4. + iota mask + where + div chain (LJ-ish)
def k_lj(a, b, c, o):
    a, b, c = a[:], b[:], c[:]
    qa, qb, qc = a[:, :CAP], b[:, :CAP], c[:, :CAP]
    dx = a[:, None, :] - qa[:, :, None]
    dy = b[:, None, :] - qb[:, :, None]
    dz = c[:, None, :] - qc[:, :, None]
    d2 = dx * dx + dy * dy + dz * dz
    row = jax.lax.broadcasted_iota(jnp.int32, (CAP, C), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (CAP, C), 1)
    ok = ((d2 <= 9.0) & jnp.logical_not((col < CAP) & (col == row))[None])
    r2 = jnp.maximum(d2, jnp.asarray(1e-2, dt))
    u = 1.0 / r2
    sr6 = u * u * u
    s = jnp.where(ok, -12.0 * (2.0 * sr6 - 1.0) * sr6 * u,
                  jnp.zeros((), dt))
    p = s * dx
    o[:, :CAP] = 2.0 * jnp.sum(p, axis=2)
    o[:, CAP:] = (-2.0 * jnp.sum(p, axis=1))[:, CAP:]
run("LJ mask/div/dual", k_lj)
