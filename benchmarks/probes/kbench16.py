"""Round-3 probe 9: why does one in-scan rebuild cost ~12.5 ms, and can
the state permutation be applied as ONE fused block gather instead of 9
column gathers?

kbench15: production 2.88 ms/step = 1.48 force + ~1.05 amortized repack
(84 fires/1000 x ~12.5 ms) + ~0.35 misc. rebuild() = repack_src (sort +
segmented ranks + src scatter) + 9 [n_slots] dynamic row gathers
(px,py,pz,vx,vy,vz,type,mass,orig). Hypothesis: TPU dynamic gathers pay
per ROW, not per element -- one [n_slots, 8] row gather should move
pos+vel+orig(bitcast) for roughly the cost of ONE column gather.
"""
import dataclasses
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import hoomd_tf_tpu as htf
from hoomd_tf_tpu.ops import cellwise as cw

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_htf"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

n = 65536


class LJ(htf.PairModel):
    def pair_energy(self, r2):
        u = 1.0 / r2
        sr6 = u * u * u
        return 4.0 * (sr6 * sr6 - sr6)

    def pair_energy_and_slope(self, r2):
        u = 1.0 / r2
        sr6 = u * u * u
        return (4.0 * (sr6 * sr6 - sr6),
                -12.0 * (2.0 * sr6 - 1.0) * sr6 * u)


model = LJ(64)
sim = htf.Simulation(dt=0.005, integrator=htf.md.Minimize(max_disp=0.05),
                     seed=0)
sim.init_lattice(n, density=0.4, kT_init=1.5)
rng = np.random.RandomState(0)
sim.state = dataclasses.replace(
    sim.state, positions=sim.state.positions +
    0.3 * jnp.asarray(rng.randn(n, 3).astype(np.float32)))
tfc = htf.tfcompute(model)
tfc.attach(sim, r_cut=3.0, nlist="cellwise")
sim.run(60)
sim.thermalize_velocities(1.5)
sim.integrator = htf.md.NVT(kT=1.5, tau=0.5)
sim.run(800)
jax.block_until_ready(sim.state.positions)

layout = sim._layout
plan = layout.plan
ss, aux, _ = layout.pack_jit(sim.state, ())
jax.block_until_ready(ss.positions)
n_slots = plan.n_slots
print(f"plan: grid={plan.grid}, cap={plan.capacity}, n_slots={n_slots}")


def scan_time(fn, arg, iters=100):
    @functools.partial(jax.jit, static_argnums=1)
    def run(p, k):
        def body(c, _):
            return fn(c), ()
        return jax.lax.scan(body, p, None, length=k)[0]
    jax.block_until_ready(run(arg, 1))
    jax.block_until_ready(run(arg, iters))
    t0 = time.perf_counter(); jax.block_until_ready(run(arg, 1))
    t1 = time.perf_counter()
    t2 = time.perf_counter(); jax.block_until_ready(run(arg, iters))
    t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / (iters - 1) * 1e3


p0 = ss.positions
valid = aux["valid"]
drift = lambda p: p + 1e-20 * jnp.sum(p)  # keep the scan honest

# s2: repack_src alone (sort + ranks + src scatter)
def s2(p):
    src, ovf = cw.repack_src(p, valid, layout.lo, plan)
    return drift(p + 1e-20 * src[0].astype(p.dtype))
print("repack_src alone         :", round(scan_time(s2, p0), 3), "ms")

src0, _ = jax.jit(lambda p: cw.repack_src(p, valid, layout.lo, plan))(p0)
has0 = src0 < n_slots
vel = ss.velocities
types_f = ss.types.astype(jnp.float32)
masses = ss.masses
orig_f = jax.lax.bitcast_convert_type(aux["orig"], jnp.float32)

# s3: the 9 column gathers alone (src fixed)
cols = [p0[:, 0], p0[:, 1], p0[:, 2], vel[:, 0], vel[:, 1], vel[:, 2],
        types_f, masses, orig_f]
def s3(p):
    c = jnp.clip(src0, 0, n_slots - 1)
    outs = [jnp.where(has0, col[c], 0.0) for col in cols[:-1]]
    outs.append(jnp.where(has0, orig_f[c], 0.0))
    return drift(p + 1e-20 * sum(jnp.sum(o) for o in outs))
print("9 column gathers         :", round(scan_time(s3, p0), 3), "ms")

# s4: one [n_slots, 8] block row gather
blk = jnp.concatenate([p0, vel, orig_f[:, None], masses[:, None]], axis=1)
def s4(p):
    c = jnp.clip(src0, 0, n_slots - 1)
    g = jnp.where(has0[:, None], blk[c], 0.0)
    return drift(p + 1e-20 * jnp.sum(g))
print("1 block [n,8] row gather :", round(scan_time(s4, p0), 3), "ms")

# s4b: two [n,4] block gathers
b1, b2 = blk[:, :4], blk[:, 4:]
def s4b(p):
    c = jnp.clip(src0, 0, n_slots - 1)
    g1 = jnp.where(has0[:, None], b1[c], 0.0)
    g2 = jnp.where(has0[:, None], b2[c], 0.0)
    return drift(p + 1e-20 * (jnp.sum(g1) + jnp.sum(g2)))
print("2 block [n,4] row gathers:", round(scan_time(s4b, p0), 3), "ms")

# s5: full rebuild as-committed, in-scan
def s5(p):
    st = dataclasses.replace(ss, positions=p)
    st2, aux2, _ = layout.rebuild(st, aux, ())
    return drift(st2.positions)
print("full rebuild (in scan)   :", round(scan_time(s5, p0), 3), "ms")

# s6: rebuild built on the [n,8] block gather (pos, vel, orig; type/mass
# assumed uniform -- the single-type fast case)
def s6(p):
    src, ovf = cw.repack_src(p, valid, layout.lo, plan)
    has = src < n_slots
    c = jnp.clip(src, 0, n_slots - 1)
    b = jnp.concatenate([p, vel, orig_f[:, None]], axis=1)
    g = jnp.where(has[:, None], b[c], 0.0)
    return drift(g[:, :3])
print("sort + [n,7] block gather:", round(scan_time(s6, p0), 3), "ms")

# s7: sort with payload columns riding the sort (no separate gather for
# the payload; still needs the slot scatter at the end)
def s7(p):
    cell = cw.bin_cells(p, layout.lo, plan)
    key = jnp.where(valid > 0, cell, plan.n_cells)
    idx = jnp.arange(n_slots, dtype=jnp.int32)
    outs = jax.lax.sort(
        (key, idx, p[:, 0], p[:, 1], p[:, 2], vel[:, 0], vel[:, 1],
         vel[:, 2], orig_f), num_keys=1)
    sk = outs[0]
    seg = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    rank = idx - jax.lax.associative_scan(
        jnp.maximum, jnp.where(seg, idx, 0))
    real = sk < plan.n_cells
    kept = real & (rank < plan.capacity)
    new_slot = jnp.where(kept, sk * plan.capacity +
                         jnp.minimum(rank, plan.capacity - 1), n_slots)
    payload = jnp.stack(outs[2:], axis=1)
    out = jnp.zeros((n_slots, 7), payload.dtype).at[new_slot].set(
        payload, mode="drop")
    return drift(out[:, :3])
print("payload sort + scatter   :", round(scan_time(s7, p0), 3), "ms")
