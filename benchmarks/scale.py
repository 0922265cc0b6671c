"""Single-chip size scaling + plan-sweep cost-model validation.

Two jobs (VERDICT round-3 item 4):

1. **Headline rows** (default): honest-protocol LJ NVT steps/s at
   64k/131k/256k, PairModel analytic fast path, each row timed on the
   occupancy-calibrated plan (explicit ``sim.replan()`` after
   equilibration, so the number reflects the steady-state plan rather
   than whichever replan boundary landed inside the window).
   Writes ``benchmarks/scale.json``.

2. **Plan sweep** (``--plansweep N``): measure several candidate
   (grid, capacity) plans at size N and print the planner's predicted
   cost next to the measured step time -- the calibration data that
   stops the >128k plan choice from flapping (the 256k point measured
   66 and 94 steps/s in round 3 depending on plan). Appends rows to
   ``benchmarks/plan_sweep.json``.

Run (TPU): python benchmarks/scale.py [--plansweep 262144] [--quick]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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
import numpy as np

import hoomd_tf_tpu as htf


class LJPair(htf.PairModel):
    def pair_energy(self, r2):
        u = 1.0 / r2
        sr6 = u * u * u
        return 4.0 * (sr6 * sr6 - sr6)

    def pair_energy_and_slope(self, r2):
        u = 1.0 / r2
        sr6 = u * u * u
        return (4.0 * (sr6 * sr6 - sr6),
                -12.0 * (2.0 * sr6 - 1.0) * sr6 * u)


def make_fluid(n, equil):
    """bench.py's honest protocol: quench -> thermalize -> kT=1.5."""
    sim = htf.Simulation(dt=0.005,
                         integrator=htf.md.Minimize(max_disp=0.05),
                         seed=0)
    sim.init_lattice(n, density=0.4, kT_init=1.5)
    rng = np.random.RandomState(0)
    sim.state = dataclasses.replace(
        sim.state, positions=sim.state.positions +
        0.3 * jnp.asarray(rng.randn(n, 3).astype(np.float32)))
    tfc = htf.tfcompute(LJPair(64))
    tfc.attach(sim, r_cut=3.0, nlist="cellwise")
    sim.run(60)
    sim.thermalize_velocities(1.5)
    sim.integrator = htf.md.NVT(kT=1.5, tau=0.5)
    sim.run(equil)
    jax.block_until_ready(sim.state.positions)
    th = sim.thermo()
    assert 1.1 < float(th["temperature"]) < 1.9, th
    return sim


def time_steps(sim, steps, rounds):
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        sim.run(steps)
        jax.block_until_ready(sim.state.positions)
        times.append(time.perf_counter() - t0)
    return min(times), times


def headline(quick):
    ref_ps = 451.0 * 256  # reference particle-steps/s (BASELINE.md)
    sizes = ([(65536, 300, 400, 3), (131072, 200, 300, 3),
              (262144, 100, 200, 3)] if not quick
             else [(4096, 100, 50, 2)])
    rows = []
    for n, steps, equil, rounds in sizes:
        sim = make_fluid(n, equil)
        # adopt the occupancy-calibrated plan, then settle + recompile
        sim.replan()
        sim.run(max(equil // 4, 20))
        jax.block_until_ready(sim.state.positions)
        plan = sim._layout.plan
        best, times = time_steps(sim, steps, rounds)
        sps = steps / best
        row = {"n_particles": n, "steps_per_s": round(sps, 1),
               "particle_steps_per_s_vs_reference":
                   round(sps * n / ref_ps, 1),
               "plan_grid": list(plan.grid),
               "plan_capacity": plan.capacity,
               "times_s": [round(t, 3) for t in times]}
        print(json.dumps(row))
        rows.append(row)
        del sim
    artifact = {
        "metric": "single-chip LJ NVT steps/s vs system size (honest "
                  "protocol: quench -> thermalize -> supercritical "
                  "kT=1.5 fluid; PairModel analytic fast path, cellwise "
                  "mode, occupancy-calibrated plan adopted via replan() "
                  "before timing)",
        "device": str(jax.devices()[0]),
        "jax": jax.__version__,
        "rows": rows,
        "notes": "vs_reference = particle-step throughput over the "
                 "reference's committed 451 steps/s at N=256 "
                 "(BASELINE.md). Plan recorded per row; see "
                 "plan_sweep.json for the predicted-vs-measured cost "
                 "model validation at >128k.",
    }
    out = os.path.join(os.path.dirname(__file__), "scale.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print("wrote", out)


def plan_sweep(n, max_candidates=None, grids=None):
    """Measure candidate plans at size n; print predicted vs measured.

    ``max_candidates`` caps the sweep to the plans nearest the
    planner's own choice (each candidate costs a full recompile of the
    64k+ scan -- tens of minutes through a cold remote-TPU tunnel, so
    the cap is what makes >128k sweeps feasible in one session).
    ``grids`` (list of (nx, ny, nz)) overrides the candidate scan --
    for re-probing a single plan (e.g. one that errored in a sweep).
    """
    from hoomd_tf_tpu.ops.cellwise import (CellwisePlan, _PAIR_LANE_COST,
                                           _REPACK_SLOT_COST, _pad_to,
                                           plan_cellwise)

    sim = make_fluid(n, 200)
    lengths = np.asarray(htf.box_size(sim.state.box))
    lo = np.asarray(sim.state.box[0])
    occ_hist = [h for h in getattr(sim, "_occ_hist", [])]
    state = sim.state
    rows = []
    # candidates: every distinct grid the planner's scale scan visits,
    # capacity from the measured occupancy of the live fluid
    import math
    seen = set()
    for scale in np.linspace(1.0, 1.8, 9):
        dims = tuple(int(math.floor(L / (3.0 * scale))) for L in lengths)
        if any(d < 3 for d in dims) or dims in seen:
            continue
        if min(L / d for L, d in zip(lengths, dims)) < 3.0:
            continue
        seen.add(dims)
    cands = sorted(seen, reverse=True)
    if grids:
        cands = [tuple(g) for g in grids]
    elif max_candidates and len(cands) > max_candidates:
        # keep the plans nearest the engine's own (calibrated) choice
        own = sim._layout.plan.grid if sim._layout else cands[0]
        cands = sorted(cands,
                       key=lambda d: abs(d[0] - own[0]))[:max_candidates]
        cands = sorted(cands, reverse=True)
    # one equilibrated configuration serves every candidate: re-deriving
    # the fluid per candidate would pay the quench+NVT compiles each
    # time (the sweep then measures compile weather, not plans)
    fluid_state = sim.state
    for dims in cands:
        from hoomd_tf_tpu.ops.cellwise import _measured_occupancy
        occ_max, mean, _ = _measured_occupancy(
            np.asarray(state.positions), lo, lengths, dims)
        from hoomd_tf_tpu.ops.cellwise import _snap_free_capacity
        cap = _snap_free_capacity(occ_max + 3, 14)
        plan = CellwisePlan(grid=dims, capacity=cap,
                            lengths=tuple(float(v) for v in lengths),
                            r_cut=3.0)
        lanes = (plan.n_cells * _pad_to(cap, 8) *
                 _pad_to(14 * cap, 128))
        pred_pair_ms = lanes * _PAIR_LANE_COST * 1e3
        # pin the plan on the engine and measure: route every plan
        # request to this candidate and disable boundary replans
        sim2 = htf.Simulation(dt=0.005,
                              integrator=htf.md.NVT(kT=1.5, tau=0.5),
                              seed=0)
        sim2.set_state(fluid_state)
        tfc2 = htf.tfcompute(LJPair(64))
        tfc2.attach(sim2, r_cut=3.0, nlist="cellwise")
        sim2._plan_from_current = lambda plan=plan: plan
        sim2._maybe_auto_replan = lambda layout: layout
        sim2._layout = None
        sim2._layout_key = None
        sim2._scan_cache.clear()
        err = None
        try:
            sim2.run(30)   # compile + settle
            jax.block_until_ready(sim2.state.positions)
            best, _ = time_steps(sim2, 100, 2)
            sps = 100 / best
        except Exception as e:
            # a failed candidate is itself sweep data (e.g. a pinned
            # plan whose capacity the live fluid overflows -- the
            # self-heal replan is disabled here by design); record why
            sps = None
            err = f"{type(e).__name__}: {e}"[:200]
        K = sim2._static_K_last
        row = {"n_particles": n, "grid": list(dims), "capacity": cap,
               "padded_lanes_M": round(lanes / 1e6, 1),
               "predicted_pair_ms": round(pred_pair_ms, 3),
               "measured_ms_per_step": (round(1e3 / sps, 3)
                                        if sps else None),
               "steps_per_s": round(sps, 1) if sps else None,
               "static_K": K}
        if err is not None:
            row["error"] = err
        print(json.dumps(row), flush=True)
        rows.append(row)
        del sim2
        # write after EVERY row: each candidate costs a multi-minute
        # recompile through the tunnel, and a cut-off sweep should
        # still leave its finished rows on disk
        out = os.path.join(os.path.dirname(__file__), "plan_sweep.json")
        prior = []
        if os.path.exists(out):
            with open(out) as f:
                prior = json.load(f).get("rows", [])
        with open(out, "w") as f:
            json.dump({"metric": "plan-sweep cost-model validation "
                                 "(predicted padded-lane cost vs "
                                 "measured step time per candidate "
                                 "plan)",
                       "device": str(jax.devices()[0]),
                       "rows": prior + [row]}, f, indent=1)
    print("wrote plan_sweep.json")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--plansweep", type=int, default=None)
    p.add_argument("--candidates", type=int, default=None,
                   help="cap the plan sweep to the N plans nearest the "
                        "planner's own choice (each costs a recompile)")
    p.add_argument("--grids", type=str, default=None,
                   help="comma-separated explicit grids for the plan "
                        "sweep, e.g. '19x19x19,20x20x20'")
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()
    if args.plansweep:
        grids = None
        if args.grids:
            grids = [tuple(int(v) for v in g.split("x"))
                     for g in args.grids.split(",")]
        plan_sweep(args.plansweep, max_candidates=args.candidates,
                   grids=grids)
    else:
        headline(args.quick)


if __name__ == "__main__":
    main()
