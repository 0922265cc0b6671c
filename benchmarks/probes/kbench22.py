"""Round-4 probe 2: end-to-end (grid, capacity) sweep on the live 64k
production step, at the honest state point.

kbench21's on-chip profile: kernel 0.881 ms/step (57%), inner-scan other
~0.39 (25%), repack amortized ~0.24 (16%) -- with the settled plan at
grid 14^3 / cap 45 (630 lanes/row). Capacity padding is the top lever:
this probe forces plans (grid x capacity) on the REAL engine (the
planner is bypassed via _plan_from_current; auto-replan off) and times
600-step rounds, so the numbers include repack + staleness behavior,
not kernel arithmetic. Overflowing configs are reported as such.
"""
import dataclasses
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import hoomd_tf_tpu as htf
from hoomd_tf_tpu.ops.cellwise import CellwisePlan, _measured_occupancy

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_htf"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

n = 65536
STEPS = 600


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


def main():
    model = LJ(64)
    sim = htf.Simulation(dt=0.005,
                         integrator=htf.md.Minimize(max_disp=0.05), seed=0)
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
    sim.run(2000)
    jax.block_until_ready(sim.state.positions)

    lengths = np.asarray(htf.box_size(sim.state.box))
    lo = np.asarray(sim.state.box[0])
    pos = np.asarray(sim.state.positions)

    # measured occupancy per candidate grid, at the equilibrated state
    grids = [(11, 11, 11), (12, 12, 12), (13, 13, 13), (14, 14, 14),
             (15, 15, 15), (16, 16, 16)]
    occ = {}
    for g in grids:
        m, _, _ = _measured_occupancy(pos, lo, lengths, g)
        occ[g] = int(m)
    print("equilibrated occupancy max per grid:", occ, flush=True)

    sweep = []
    for g in grids:
        base = occ[g]
        # the snapshot max underestimates the running max over 1800
        # steps; start at +3 (the planner's own margin class)
        for cap in sorted({base + 3, base + 5, base + 8}):
            sweep.append((g, cap))

    sim.auto_replan = False
    state0 = sim.state            # restore point: one overflowed config
    results = []                  # must not poison the next (NaN state)
    for grid, cap in sweep:
        sim.state = state0
        plan = CellwisePlan(grid=grid, capacity=cap,
                            lengths=tuple(float(v) for v in lengths),
                            r_cut=3.0)
        sim._plan_from_current = lambda plan=plan: plan
        sim.replan()
        try:
            sim.run(STEPS)       # warm/compile + settle
            jax.block_until_ready(sim.state.positions)
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                sim.run(STEPS)
                jax.block_until_ready(sim.state.positions)
                d = (time.perf_counter() - t0) / STEPS * 1e3
                best = d if best is None else min(best, d)
            t = sim.thermo()
            if not np.isfinite(t["temperature"]):
                print(f"grid {grid} cap {cap:3d} NON-FINITE thermo",
                      flush=True)
                continue
            K = sim._choose_repack_interval(sim._layout)
            lanes = plan.n_cells * cap * 14 * cap / 1e6
            print(f"grid {grid} cap {cap:3d} K {K:3d} "
                  f"lanes {lanes:7.1f}M : {best:7.3f} ms/step "
                  f"({1000.0 / best:6.1f} steps/s)  T={t['temperature']:.2f}",
                  flush=True)
            results.append((grid, cap, best))
        except Exception as e:  # overflow self-heal exhausted, etc.
            print(f"grid {grid} cap {cap:3d} FAILED: "
                  f"{type(e).__name__}: {e}", flush=True)
    t = sim.thermo()
    print("final thermo:", t)
    if results:
        g, c, d = min(results, key=lambda r: r[2])
        print(f"best: grid {g} cap {c} {d:.3f} ms/step "
              f"({1000.0 / d:.1f} steps/s)")


if __name__ == "__main__":
    main()
