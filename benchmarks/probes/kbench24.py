"""Round-5 probe 1: the two untried knobs on the committed kernel.

VERDICT r4 weak #1: the kernel is 57% of the 1.56 ms step and at VPU
throughput *for its current lane set* -- the path to >=1000 steps/s is
executing fewer padded lanes (or doubling the lane rate).

(a) block_cells < 8: the occupancy predicate runs row groups up to the
    max occupancy OF THE BLOCK; kbench14 measured B=8 beating 16/24 for
    exactly this reason but never probed below 8 ("smallest Mosaic-legal
    block" was assumed -- the grid-blocked dim is the UNTILED leading
    axis of a rank-3 [B, w, C] array, so B=1..4 may be legal after all).
    At occ~Poisson(24) the per-cell expected ceil(occ/8) sits ~20% below
    the max over 8 cells.

(b) lane_dtype=bf16: kbench12 bisected a Mosaic internal error (jax 0.7
    era) on the kernel's rank-3 bf16 broadcast-subtract; the toolchain
    is now jax 0.9 -- retest. 2x nominal VPU rate if it compiles;
    accuracy is the known ~1e-2 relative force cost through r^-12.
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
from hoomd_tf_tpu.ops.cellwise_pallas import half_stencil_pair_forces as kern

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
sim.run(1000)
jax.block_until_ready(sim.state.positions)
for _ in range(4):
    plan_before = sim._layout.plan if sim._layout else None
    sim.run(1000)
    jax.block_until_ready(sim.state.positions)
    if sim._layout is None or sim._layout.plan == plan_before:
        break

layout = sim._layout
plan = layout.plan
ss, aux, _ = layout.pack_jit(sim.state, ())
jax.block_until_ready(ss.positions)
valid = aux["valid"]
cap, n_cells = plan.capacity, plan.n_cells
occ = np.asarray(valid.reshape(n_cells, cap).sum(axis=1)).astype(np.int32)
print(f"plan: grid={plan.grid}, cap={cap}, n_cells={n_cells}, "
      f"occ mean={occ.mean():.1f} max={occ.max()}")
full_groups = -(-cap // 8)
for B in (1, 2, 4, 8):
    npad = -(-n_cells // B) * B
    o = np.pad(occ, (0, npad - n_cells)).reshape(-1, B)
    g = np.ceil(o.max(axis=1) / 8.0)
    print(f"  B={B}: mean active groups {g.mean():.2f} of {full_groups} "
          f"-> predicted lane frac {g.mean() / full_groups:.2f}")


def pair_fn(r2):
    u = 1.0 / r2
    sr6 = u * u * u
    return (4.0 * (sr6 * sr6 - sr6),
            -12.0 * (2.0 * sr6 - 1.0) * sr6 * u)


def scan_time(fn, arg, iters=50):
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


def mk(**kw):
    def f(p):
        f4, _ = kern(p, None, valid, plan, layout.lo, pair_fn,
                     needs_energy=False, **kw)
        return p + 1e-20 * f4[:, :3]
    return f


r0 = mk()(ss.positions)
jax.block_until_ready(r0)
print("baseline B=8            :",
      round(scan_time(mk(), ss.positions), 3), "ms")
for B in (1, 2, 4):
    try:
        f = mk(block_cells=B)
        err = float(jnp.max(jnp.abs(f(ss.positions) - r0)))
        print(f"B={B} predicated         :",
              round(scan_time(f, ss.positions), 3), "ms  (err vs B8:",
              err, ")")
    except Exception as e:
        print(f"B={B}: FAILED: {type(e).__name__}: {str(e)[:200]}")
for B in (16, 8):
    try:
        f = mk(lane_dtype=jnp.bfloat16, block_cells=B)
        r = f(ss.positions)
        err = float(jnp.max(jnp.abs(r - r0)) / jnp.max(jnp.abs(r0)))
        print(f"bf16 lanes B={B:2d}         :",
              round(scan_time(f, ss.positions), 3),
              "ms  (rel err vs f32:", f"{err:.2e})")
        break
    except Exception as e:
        print(f"bf16 B={B}: FAILED: {type(e).__name__}: {str(e)[:300]}")
