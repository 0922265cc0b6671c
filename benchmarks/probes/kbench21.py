"""Round-4 probe 1: REAL on-chip profile of the honest 64k production
step (VERDICT r3 weak #2: "dissect the live ~2 ms step with a real
on-chip profile instead of probe arithmetic").

Captures a jax.profiler trace around ~600 production steps and rolls up
the device plane ('XLA Ops') by op name via the local xplane reader.
Prints: total device time, per-step device time, and the top ops with
their share -- the ground truth that kbench9/14/15's subtraction
arithmetic approximated.
"""
import dataclasses
import glob
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import hoomd_tf_tpu as htf
from xplane import parse_xspace  # noqa: E402 (probe-local helper)

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
    sim.run(1000)
    jax.block_until_ready(sim.state.positions)
    for _ in range(4):  # settle the auto-replan
        plan_before = sim._layout.plan if sim._layout else None
        sim.run(1000)
        jax.block_until_ready(sim.state.positions)
        if sim._layout is None or sim._layout.plan == plan_before:
            break
    print("plan:", sim._layout.plan.grid, "cap", sim._layout.plan.capacity,
          "K", sim._choose_repack_interval(sim._layout))

    t0 = time.perf_counter()
    sim.run(STEPS)
    jax.block_until_ready(sim.state.positions)
    wall = time.perf_counter() - t0
    print(f"warm wall: {wall / STEPS * 1e3:.3f} ms/step "
          f"({STEPS / wall:.1f} steps/s)")

    trace_dir = "/tmp/kbench21_trace"
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    sim.run(STEPS)
    jax.block_until_ready(sim.state.positions)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"traced wall: {wall / STEPS * 1e3:.3f} ms/step")

    pb = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))[-1]
    rollup = {}
    module_ms = 0.0
    for pname, lines in parse_xspace(pb):
        if not pname.startswith("/device:TPU"):
            continue
        for lname, evs in lines:
            if lname == "XLA Modules":
                module_ms += sum(d for _, d in evs) * 1e-9
            if lname != "XLA Ops":
                continue
            for name, dur in evs:
                rollup[name] = rollup.get(name, 0.0) + dur * 1e-9
    dev_ms = sum(rollup.values())
    print(f"\ndevice total: {dev_ms:.1f} ms over {STEPS} steps "
          f"= {dev_ms / STEPS:.3f} ms/step on-chip "
          f"(modules line: {module_ms / STEPS:.3f}); "
          f"host+dispatch gap = {wall * 1e3 / STEPS - dev_ms / STEPS:.3f} "
          f"ms/step")
    print(f"\n{'op':<72} {'ms/step':>8} {'share':>6}")
    for name, s in sorted(rollup.items(), key=lambda kv: -kv[1])[:28]:
        print(f"{name[:72]:<72} {s / STEPS:8.4f} {s / dev_ms * 100:5.1f}%")


if __name__ == "__main__":
    main()
