"""Round-3 probe 12: dissect the production 64k step (post block-gather).

ROADMAP item 1: predicted step cost from earlier probes (predicated
kernel ~1.0-1.25 ms, repack ~2 ms / K, integrator ~0.03 ms) undershoots
the measured ~1.8 ms/step at 560 steps/s. Find the gap ON the real
engine, not standalone kernels:

  (a) production run() at the engine-chosen K            -> t_prod
  (b) K sweep via _static_K_cap, fit t(K) = a + C/K      -> inner step a,
                                                            boundary C
  (c) force-only scan (fast_eval slim, positions fed back) -> t_force
  (d) force + NVT scan (no rebuild, no staleness checks) -> t_step_core

Gap analysis: a - t_step_core = per-inner-step machinery (staleness
bit, ghost pins, thermo gating, ys stacking); C vs the standalone
rebuild probe = boundary materialization still unpaid for.

Protocol matches bench.py (honest fluid: quench -> thermalize -> NVT
kT=1.5, rho=0.4) with shorter equilibration -- the plan and state point
are what matter, not deep equilibrium.
"""
import dataclasses
import os
import time

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_htf"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import jax.numpy as jnp

import hoomd_tf_tpu as htf
from hoomd_tf_tpu.ops import cellwise as _cw


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


def make_sim(n=65536, steps=400):
    model = LJ(64)
    sim = htf.Simulation(dt=0.005,
                         integrator=htf.md.Minimize(max_disp=0.05), seed=0)
    sim.scan_block = steps
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
    sim.run(steps)
    jax.block_until_ready(sim.state.positions)
    for _ in range(3):
        plan_before = sim._layout.plan if sim._layout else None
        sim.run(steps)
        jax.block_until_ready(sim.state.positions)
        if sim._layout is None or sim._layout.plan == plan_before:
            break
    return sim


def timed_run(sim, steps, rounds=3):
    best = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        sim.run(steps)
        jax.block_until_ready(sim.state.positions)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def scan_time(fn, carry, iters=21, rounds=3):
    """(t(scan_n) - t(scan_1)) / (n-1) -- tunnel-honest per-iter time."""
    def loop(c, n):
        return jax.lax.scan(lambda c, _: (fn(c), None), c, None, length=n)[0]
    f_n = jax.jit(lambda c: loop(c, iters))
    f_1 = jax.jit(lambda c: loop(c, 1))
    jax.block_until_ready(f_n(carry)); jax.block_until_ready(f_1(carry))
    best = None
    for _ in range(rounds):
        t0 = time.perf_counter(); jax.block_until_ready(f_n(carry))
        t1 = time.perf_counter(); jax.block_until_ready(f_1(carry))
        t2 = time.perf_counter()
        per = ((t1 - t0) - (t2 - t1)) / (iters - 1)
        best = per if best is None else min(best, per)
    return best


def main():
    steps = int(os.environ.get("KB19_STEPS", "400"))
    sim = make_sim(steps=steps)
    layout = sim._layout
    plan = layout.plan
    print(f"plan: grid={plan.grid} cap={plan.capacity} "
          f"n_slots={plan.n_slots} skin={plan.skin:.3f}")

    # (a) production number at engine-chosen K
    t = timed_run(sim, steps)
    K0 = sim._static_K_last
    print(f"(a) production: {steps / t:.1f} steps/s "
          f"({t / steps * 1e3:.3f} ms/step) at K={K0}")

    # (b) K sweep
    ks, ts = [], []
    for K in (4, 8, 16, 32, 64):
        if K > (K0 or 64) * 4:
            break
        sim._static_K_cap = K
        sim._static_K_last = None
        t = timed_run(sim, steps, rounds=2)
        kk = sim._static_K_last
        print(f"(b) K={kk}: {t / steps * 1e3:.3f} ms/step")
        ks.append(kk); ts.append(t / steps)
    if len(ks) >= 2:
        A = np.stack([np.ones(len(ks)), 1.0 / np.asarray(ks, float)], 1)
        coef, *_ = np.linalg.lstsq(A, np.asarray(ts), rcond=None)
        a, C = coef
        print(f"(b) fit: inner step a={a * 1e3:.3f} ms, "
              f"boundary C={C * 1e3:.2f} ms/rebuild")
    sim._static_K_cap = None

    # (c) force-only (slim, exactly the hot-loop settings) on the live
    # slot state: positions fed back so the scan cannot hoist
    slot_state, aux, _ = layout.pack(sim.state)
    lo, lengths = layout._geom(slot_state)
    pair_fn = sim.tfc.model.pair_energy_and_slope

    def force_only(pos):
        f4, _ = _cw.analytic_pair_forces(
            pos, slot_state.types, aux["valid"], plan, lo, pair_fn,
            needs_virial=False, needs_energy=False, lengths=lengths)
        return pos + 1e-30 * f4[:, :3]

    t_force = scan_time(force_only, slot_state.positions)
    print(f"(c) force-only slim: {t_force * 1e3:.3f} ms")

    # (d) force + velocity-Verlet-shaped update (integrator analog)
    vel = jnp.zeros_like(slot_state.positions)

    def force_nvt(c):
        pos, v = c
        f4, _ = _cw.analytic_pair_forces(
            pos, slot_state.types, aux["valid"], plan, lo, pair_fn,
            needs_virial=False, needs_energy=False, lengths=lengths)
        v2 = 0.999 * (v + 0.005 * f4[:, :3])
        return (pos + 0.005 * v2, v2)

    t_core = scan_time(force_nvt, (slot_state.positions, vel))
    print(f"(d) force+integrator core: {t_core * 1e3:.3f} ms")

    # (e) one rebuild, honest (consumer reads every column back)
    def rebuild_once(c):
        ss, ax = c
        ss2, ax2, _ = layout.rebuild(ss, ax)
        return (ss2, ax2)

    t_reb = scan_time(rebuild_once, (slot_state, aux), iters=11)
    print(f"(e) rebuild: {t_reb * 1e3:.3f} ms (amortized /K={K0}: "
          f"{t_reb / (K0 or 1) * 1e3:.3f} ms)")


if __name__ == "__main__":
    main()
