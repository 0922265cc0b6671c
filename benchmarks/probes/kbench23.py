"""Round-4 probe 3: on-chip profile of the ONLINE TRAINING step at 64k
(the north-star metric), proxy and exact routes.

north_star.py measured 69.6 (Chebyshev proxy K=16) vs 22.6 (exact NN)
train-steps/s at 64k. This probe rolls up the device timeline per XLA
module/op (probes/xplane.py) for the proxy route to locate the
remaining 14.4 ms/step: primal Pallas kernel vs XLA lane contraction
(the custom VJP backward) vs label forces vs repack.
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
from xplane import parse_xspace  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_htf"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

n = 65536
STEPS = 200


class TrainableNNPair(htf.PairModel):
    def setup(self):
        self.dense1 = htf.Dense(16)
        self.last = htf.Dense(1)

    def pair_energy(self, r2):
        rinv = jax.lax.rsqrt(r2)
        x = jax.nn.tanh(self.dense1(rinv[..., None]))
        return 2.0 * self.last(x)[..., 0]


def main():
    proxy = os.environ.get("KB23_PROXY", "1") == "1"
    sim = htf.Simulation(dt=0.005,
                         integrator=htf.md.Minimize(max_disp=0.05), seed=0)
    sim.init_lattice(n, density=0.4, kT_init=1.5)
    rng = np.random.RandomState(0)
    sim.state = dataclasses.replace(
        sim.state, positions=sim.state.positions +
        0.3 * jnp.asarray(rng.randn(n, 3).astype(np.float32)))
    sim.add_force(htf.md.LennardJones(r_cut=3.0))
    sim.run(60)
    sim.thermalize_velocities(1.5)
    sim.integrator = htf.md.NVT(kT=1.5, tau=0.5)
    sim.run(400)

    model = TrainableNNPair(64, output_forces=False,
                            proxy_degree=16 if proxy else None)
    loss = lambda yt, yp: jnp.mean((yt[:, :3] - yp[:, :3]) ** 2)
    model.compile(optimizer="adam", loss=loss, learning_rate=1e-2)
    tfc = htf.tfcompute(model)
    tfc.attach(sim, r_cut=3.0, nlist="cellwise", train=True)
    sim.run(100)
    sim.replan()
    sim.run(100)
    jax.block_until_ready(sim.state.positions)
    print("plan:", sim._layout.plan.grid, "cap", sim._layout.plan.capacity,
          "K", sim._choose_repack_interval(sim._layout),
          "fwd_stencil:", getattr(tfc, "_pair_fast_stencil", None))

    t0 = time.perf_counter()
    sim.run(STEPS)
    jax.block_until_ready(sim.state.positions)
    wall = time.perf_counter() - t0
    print(f"warm wall: {wall / STEPS * 1e3:.3f} ms/step "
          f"({STEPS / wall:.1f} train-steps/s)")

    trace_dir = "/tmp/kbench23_trace"
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    sim.run(STEPS)
    jax.block_until_ready(sim.state.positions)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"traced wall: {wall / STEPS * 1e3:.3f} ms/step")

    pb = sorted(glob.glob(trace_dir + "/**/*.xplane.pb",
                          recursive=True))[-1]
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
                key = name.split(".")[0].lstrip("%")
                rollup[key] = rollup.get(key, 0.0) + dur * 1e-9
    print(f"\nmodules total: {module_ms / STEPS:.3f} ms/step")
    print(f"{'op class':<40} {'ms/step':>8}")
    for name, s in sorted(rollup.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{name[:40]:<40} {s / STEPS:8.4f}")


if __name__ == "__main__":
    main()
