"""Running a model from a trajectory file, no simulation engine (parity
with reference example 05). Uses the native C++ GSD loader, so neither
MDAnalysis nor the gsd package is required.

Run: python examples/05_running_from_trajectory.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

import hoomd_tf_tpu as htf


class RDFModel(htf.SimModel):
    def setup(self):
        self.avg_rdf = htf.MeanTensor()

    def compute(self, nlist, positions, box):
        rdf, rs = htf.compute_rdf(nlist, [0.5, 3.0], positions[:, 3])
        self.avg_rdf.update_state(rdf)
        return rdf


def generate_trajectory(path, frames=10, n=64):
    """Write a short LJ trajectory with the native GSD writer."""
    sim = htf.Simulation(dt=0.002, integrator=htf.md.NVT(kT=1.0, tau=0.5),
                         seed=1)
    sim.init_lattice(n, density=0.4, kT_init=1.0)
    sim.add_force(htf.md.LennardJones(r_cut=3.0))
    obs = htf.tfcompute(_NoOp(0, output_forces=False))
    obs.attach(sim, r_cut=0)
    data = []
    for i in range(frames):
        sim.run(25)
        data.append({"positions": np.asarray(sim.state.positions),
                     "typeid": np.zeros(n, np.uint32)})
    box_l = np.asarray(htf.box_size(sim.state.box))
    htf.write_gsd_frames(path, data, box=box_l)
    return path


class _NoOp(htf.SimModel):
    def compute(self, nlist):
        return jnp.zeros(())


def main():
    path = "/tmp/htf_example_traj.gsd"
    generate_trajectory(path)

    universe = htf.GSDUniverse(path)
    model = RDFModel(32)
    for inputs, ts in htf.iter_from_trajectory(32, universe, r_cut=3.0):
        model(inputs)
    rdf = np.asarray(model.avg_rdf.result())
    rs = np.linspace(0.5, 3.0, 101)
    rs = (rs[1:] + rs[:-1]) / 2
    peak = int(np.argmax(rdf))
    print(f"trajectory-averaged RDF max at r = {rs[peak]:.2f} "
          f"(unnormalized histogram: shell volume shifts the max past "
          f"the LJ first shell at ~1.1-1.3)")
    print("g(r) around the max:", np.round(rdf[peak - 3:peak + 4], 2))
    assert np.all(np.isfinite(np.asarray(rdf)))
    assert 0.8 < rs[peak] < 2.8, rs[peak]
    # excluded-volume hole: no density below ~0.9 sigma
    assert float(np.sum(rdf[rs < 0.85])) < 1e-3 * float(np.sum(rdf))


if __name__ == "__main__":
    main()
