"""Round-3 probe 7: where does the HONEST 64k step go, and does the
occupancy-predicated kernel (kbench13's K2, productionized in
_cwp_pred.py) actually win at the honest state point?

kbench13 measured a jittered lattice (kT_init=1.2, jitter 0.1) --
near-uniform occupancy, whole row groups empty, 1.25x. The honest bench
(bench.py after 8211197) equilibrates a supercritical kT=1.5 fluid whose
density fluctuations raise the per-block max occupancy, eroding the
group-skip. This probe equilibrates exactly like bench.py, then times:

  step : the production compiled step (context)
  K0   : committed kernel, slim (needs_energy=False)
  K2/B : predicated kernel at block_cells B in {8, 16, 24}

plus occupancy stats (how many 8-row groups a block-max predicate
actually skips at each B).
"""
import dataclasses
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import hoomd_tf_tpu as htf
# the predicated kernel was productionized after this probe decided it
# (ops/cellwise_pallas.py); K0/K2 below are now the same kernel at
# different block sizes (K2's B=8 is the production default)
from hoomd_tf_tpu.ops.cellwise_pallas import half_stencil_pair_forces as k0
k2 = k0

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

t0 = time.perf_counter()
sim.run(1000)
jax.block_until_ready(sim.state.positions)
step_ms = (time.perf_counter() - t0)
print(f"production step: {step_ms:.3f} ms  ({1000/step_ms:.1f} steps/s)"
      .replace("ms", "ms/step") if False else
      f"production step: {step_ms:.3f} ms/step ({1000/step_ms:.1f} steps/s)")

layout = sim._layout
plan = layout.plan
state = sim.state
ss, aux, _ = layout.pack_jit(state, ())
jax.block_until_ready(ss.positions)
valid = aux["valid"]
cap, n_cells = plan.capacity, plan.n_cells
occ = np.asarray(valid.reshape(n_cells, cap).sum(axis=1)).astype(np.int32)
print(f"plan: grid={plan.grid}, cap={cap}, n_cells={n_cells}, "
      f"occ mean={occ.mean():.1f} max={occ.max()}")
full_groups = -(-cap // 8)
for B in (8, 16, 24):
    npad = -(-n_cells // B) * B
    o = np.pad(occ, (0, npad - n_cells)).reshape(-1, B)
    bmax = o.max(axis=1)
    g = np.ceil(bmax / 8.0)
    print(f"  B={B:2d}: mean active groups {g.mean():.2f} of {full_groups} "
          f"-> predicted lane frac {g.mean()/full_groups:.2f}")


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


def mk(kern, **kw):
    def f(p):
        f4, _ = kern(p, None, valid, plan, layout.lo, pair_fn,
                     needs_energy=False, **kw)
        return p + 1e-20 * f4[:, :3]
    return f


r0 = mk(k0)(ss.positions)
print("K0 committed (slim)      :", round(scan_time(mk(k0), ss.positions), 3),
      "ms")
for B in (8, 16, 24):
    f = mk(k2, block_cells=B)
    err = float(jnp.max(jnp.abs(f(ss.positions) - r0)))
    print(f"K2 predicated B={B:2d}      :",
          round(scan_time(f, ss.positions), 3), "ms  (err vs K0:", err, ")")
