"""Benchmark harness producing committed JSON artifacts, mirroring the
reference's pytest-benchmark protocol (``test-py/benchmark.py`` +
``.benchmarks/``: equilibrate, then R timed rounds of K steps).

Run: python benchmarks/run_benchmarks.py [--quick]
Writes benchmarks/results-<platform>.json.
"""

import argparse
import json
import os
import platform
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import hoomd_tf_tpu as htf
from hoomd_tf_tpu.utils.profiling import benchmark_simulation


class LJ(htf.SimModel):
    def compute(self, nlist, positions, box):
        rinv = htf.nlist_rinv(nlist)
        inv_r6 = rinv ** 6
        energy = jnp.sum(4.0 / 2.0 * (inv_r6 ** 2 - inv_r6), axis=1)
        return htf.compute_nlist_forces(nlist, energy)


def bench_config(n, nn, steps, equil, rounds, nlist_mode=None):
    import dataclasses
    sim = htf.Simulation(dt=0.005, integrator=htf.md.NVT(kT=1.2, tau=0.5),
                         seed=0)
    sim.init_lattice(n, density=0.4, kT_init=1.2)
    rng = np.random.RandomState(0)
    sim.state = dataclasses.replace(
        sim.state, positions=sim.state.positions +
        0.3 * jnp.asarray(rng.randn(n, 3).astype(np.float32)))
    if nlist_mode is None:
        nlist_mode = ('direct' if jax.devices()[0].platform == 'tpu'
                      else 'auto')
    tfc = htf.tfcompute(LJ(nn))
    tfc.attach(sim, r_cut=3.0, nlist=nlist_mode)
    result = benchmark_simulation(sim, steps=steps,
                                  equilibration=equil, reps=rounds)
    result.update({"n_particles": n, "nn": nn,
                   "nlist_mode": nlist_mode})
    return result


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()

    on_tpu = jax.devices()[0].platform == "tpu"
    configs = ([(256, 64, 200, 100, 2), (4096, 64, 100, 50, 2)]
               if args.quick or not on_tpu else
               [(256, 64, 1000, 4000, 5),      # the reference's config
                (4096, 64, 500, 500, 3),
                (65536, 64, 200, 200, 3)])     # the BASELINE.json target

    results = []
    for n, nn, steps, equil, rounds in configs:
        r = bench_config(n, nn, steps, equil, rounds)
        print(json.dumps(r))
        results.append(r)

    out = os.path.join(os.path.dirname(__file__),
                       f"results-{jax.devices()[0].platform}.json")
    with open(out, "w") as f:
        json.dump({
            "machine": platform.node(),
            "device": str(jax.devices()[0]),
            "jax": jax.__version__,
            "reference_baseline": {
                "steps_per_s": 451, "n_particles": 256,
                "source": "BASELINE.md (pytest-benchmark, Xeon 6140)"},
            "results": results,
        }, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
