#!/usr/bin/env python
"""Benchmark: MD steps/sec with a SimModel pair potential.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N}

Baseline: the reference's committed pytest-benchmark result -- 451 steps/s
(LJ SimModel, N=256, NN=64, CPU Xeon; see BASELINE.md). The headline config
here is the BASELINE.json target scale (64k particles) when a cell-list
build is available; set HTF_BENCH_N to override.
"""

import json
import os
import sys
import time

import jax

# honor an explicit JAX_PLATFORMS even under this image's axon
# sitecustomize (which force-registers the TPU plugin and overrides the
# env var; the programmatic update is what actually pins the platform)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

import hoomd_tf_tpu as htf

# persistent compilation cache: the two 64k scan compiles dominate this
# script's wall time (~6 min through the remote-TPU tunnel); repeat runs
# hit the cache and finish in under a minute
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_htf"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass  # older jax without the knobs


class LJ(htf.PairModel):
    """Flagship model: LJ declared as a pair potential, which the engine
    evaluates on the analytic forward-only fast path in cellwise mode
    (dU/dr^2 via jvp -- no vjp replay; ops/cellwise.analytic_pair_forces).
    Set HTF_BENCH_MODEL=simmodel for the generic SimModel route."""

    def pair_energy(self, r2):
        u = 1.0 / r2
        sr6 = u * u * u
        return 4.0 * (sr6 * sr6 - sr6)

    def pair_energy_and_slope(self, r2):
        # shared-sr6 slope: ~15% faster than the default jvp derivation
        u = 1.0 / r2
        sr6 = u * u * u
        return (4.0 * (sr6 * sr6 - sr6),
                -12.0 * (2.0 * sr6 - 1.0) * sr6 * u)


class LJSim(htf.SimModel):
    def compute(self, nlist, positions, box):
        rinv = htf.nlist_rinv(nlist)
        inv_r6 = rinv ** 6
        p_energy = 4.0 / 2.0 * (inv_r6 * inv_r6 - inv_r6)
        energy = jnp.sum(p_energy, axis=1)
        return htf.compute_nlist_forces(nlist, energy)


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    n = int(os.environ.get("HTF_BENCH_N", 65536 if on_tpu else 512))
    nn = int(os.environ.get("HTF_BENCH_NN", 64))
    # 1000 steps matches the reference benchmark protocol
    # (htf/test-py/benchmark.py: 1000 LJ MD steps per round) and amortizes
    # the per-run dispatch overhead of the remote-TPU tunnel
    steps = int(os.environ.get("HTF_BENCH_STEPS", 1000 if on_tpu else 50))
    r_cut = 3.0

    model_cls = (LJSim if os.environ.get("HTF_BENCH_MODEL") == "simmodel"
                 else LJ)
    model = model_cls(nn)
    # start under a displacement-capped quench: the 0.3-sigma jitter
    # below creates overlapping pairs whose clamped forces (~1e27)
    # overflow any dynamical integrator's kinetic energy -- unquenched,
    # the NVT thermostat damps the blow-up so hard the system froze at
    # T~0 and the "equilibrated fluid" being benchmarked was a glass
    # that never triggered a repack (silently flattering the number)
    sim = htf.Simulation(dt=0.005, integrator=htf.md.Minimize(max_disp=0.05),
                         seed=0)
    # one dispatch per timed run: per-dispatch host overhead through the
    # remote-TPU tunnel is real money at ~2 ms/step
    sim.scan_block = steps
    sim.init_lattice(n, density=0.4, kT_init=1.5)
    # jitter so cell-capacity planning sees fluid-like (not
    # lattice-aligned) occupancy. Deliberately generous (0.3): the
    # melting transient packs cells harder than the equilibrated fluid,
    # and the initial plan must survive it -- replan() below tightens
    # capacity once equilibrated (a 0.05 jitter was tried and overflowed
    # mid-warmup)
    import dataclasses
    import numpy as np
    rng = np.random.RandomState(0)
    sim.state = dataclasses.replace(
        sim.state, positions=sim.state.positions +
        0.3 * jnp.asarray(rng.randn(n, 3).astype(np.float32)))
    # slot-resident (cellwise) neighbor mode: state lives in cell-slot
    # layout, candidate planes come from static rolls, and the whole step
    # is gather-free between skin-triggered repacks (exact same forces;
    # see docs/performance.md). HTF_BENCH_NLIST=direct/auto for the
    # older paths.
    nlist_mode = os.environ.get("HTF_BENCH_NLIST",
                                "cellwise" if on_tpu else "auto")
    tfc = htf.tfcompute(model)
    tfc.attach(sim, r_cut=r_cut, nlist=nlist_mode)

    # quench the jitter overlaps, then hand the system to NVT with
    # fresh Maxwell-Boltzmann velocities. State point kT=1.5 (not the
    # round-2 kT=1.2): the LJ critical temperature is ~1.31, so at
    # kT=1.2 / rho=0.4 the honest fluid sits INSIDE liquid-vapor
    # coexistence and slowly phase-separates -- cell occupancy climbs
    # without bound as droplets coarsen, which is a (real, documented)
    # worst case for the capacity-padded layout, not a steady-state
    # throughput benchmark. Supercritical kT=1.5 is single-phase with
    # stationary occupancy.
    sim.run(60)
    sim.thermalize_velocities(1.5)
    sim.integrator = htf.md.NVT(kT=1.5, tau=0.5)
    # equilibrate until the plan settles: the melt can overflow the
    # planning-time capacity (run() self-heals: rollback + replan with
    # a raised floor) and the boundary auto-replan may tighten a stale
    # plan -- the timed run must reuse a stable, already-compiled scan
    sim.run(steps)
    jax.block_until_ready(sim.state.positions)
    for _ in range(4):
        plan_before = sim._layout.plan if sim._layout else None
        sim.run(steps)
        jax.block_until_ready(sim.state.positions)
        if sim._layout is None or sim._layout.plan == plan_before:
            break

    # best of 3 rounds (reference protocol times rounds of 1000 steps;
    # the best round is the standard benchmark statistic and amortizes
    # residual per-dispatch host overhead through the remote tunnel)
    dt = None
    for _ in range(3 if on_tpu else 1):
        t0 = time.perf_counter()
        sim.run(steps)
        jax.block_until_ready(sim.state.positions)
        dt_i = time.perf_counter() - t0
        dt = dt_i if dt is None else min(dt, dt_i)
    th = sim.thermo()
    assert 1.1 < float(th["temperature"]) < 1.9, \
        f"benchmarked system is not a healthy kT=1.5 fluid: {th}"

    steps_per_s = steps / dt
    # reference baseline: 451 steps/s at N=256, NN=64 (committed
    # pytest-benchmark result, BASELINE.md) = 115,456 particle-steps/s.
    # vs_baseline compares particle-step throughput so different system
    # sizes are comparable.
    baseline_pps = 451.0 * 256.0
    if model_cls is LJ and nlist_mode == "cellwise":
        route = "analytic PairModel fast path, Pallas half-stencil Newton"
    elif model_cls is LJ:
        route = "PairModel (generic route off-cellwise)"
    elif getattr(tfc, "_lane_fast_ok", False):
        # the lane-separability probe (ops/lane_fast) validated this
        # generic model onto the analytic kernel
        route = ("generic SimModel, lane-fast analytic"
                 + (" (XLA full stencil)"
                    if getattr(tfc, "_lane_fast_stencil", None) == "full"
                    else ", Pallas half-stencil Newton"))
    else:
        route = "generic SimModel vjp route"
    print(json.dumps({
        "metric": (f"LJ MD steps/s (N={n}, NN={nn}, "
                   f"model={model_cls.__name__} [{route}], "
                   f"nlist={nlist_mode}, fused jit step; "
                   f"vs_baseline = particle-step throughput ratio "
                   f"vs reference 451 steps/s @ N=256)"),
        "value": round(steps_per_s, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s * n / baseline_pps, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
