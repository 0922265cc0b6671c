"""Regenerate the committed real-format trajectory fixture.

``dimer_fluid.gsd`` is a real GSD v1 trajectory (the same binary format
HOOMD-blue writes and MDAnalysis reads) produced by this package's own
MD engine and native GSD writer: a fluid of 32 bonded LJ dimers (64
atoms), equilibrated, then 15 frames sampled every 20 NVT steps with
positions, velocities AND per-particle net forces -- the labels offline
CG force matching trains on.

This mirrors the role of the reference's committed example data
(``/root/reference/examples/CG_tutorial/`` and ``eds_traj.dcd``): a
small real trajectory the tutorials drive end to end. Example 10 reads
the file by default (through ``GSDUniverse`` + ``iter_from_trajectory``,
no optional dependencies); MDAnalysis reads the identical file on the CI
leg that has it installed.

Run: python examples/data/generate_fixture.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import hoomd_tf_tpu as htf

N_MOL = 32
R_CUT = 3.0
FRAMES = 15
SAMPLE_EVERY = 20


def main():
    n = 2 * N_MOL
    sim = htf.Simulation(dt=0.002,
                         integrator=htf.md.NVT(kT=1.0, tau=0.5), seed=5)
    sim.init_lattice(n, density=0.25, kT_init=1.0)
    sim.bonds = [[2 * i, 2 * i + 1] for i in range(N_MOL)]
    sim.add_force(htf.md.LennardJones(r_cut=R_CUT))
    sim.run(200)  # equilibrate before sampling

    frames = []
    for step in range(FRAMES):
        sim.run(SAMPLE_EVERY)
        frames.append({
            "step": (step + 1) * SAMPLE_EVERY,
            "positions": np.asarray(sim.state.positions),
            "velocity": np.asarray(sim.state.velocities),
            "forces": np.asarray(sim.state.forces)[:, :3],
            "typeid": np.zeros(n, np.uint32),
        })

    box_l = np.asarray(htf.box_size(sim.state.box))
    out = os.path.join(os.path.dirname(__file__), "dimer_fluid.gsd")
    htf.write_gsd_frames(out, frames, box=box_l, types=["A"],
                         bonds=sim.bonds)
    print(f"wrote {out}: {FRAMES} frames x {n} atoms, "
          f"box {box_l.tolist()}, {os.path.getsize(out)} bytes")


if __name__ == "__main__":
    main()
