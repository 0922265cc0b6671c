"""Offline force matching from a trajectory file: learn pair parameters
from frames + per-frame label forces surfaced by iter_from_trajectory
(parity with reference examples 05/06 and utils.py:666-686, where the
selection sub-universe carries ts.forces).

The trajectory is generated in-process by running the built-in LJ fluid
and written to a GSD file with per-frame forces through the native
writer; iter_from_trajectory then reads it back with zero optional
dependencies (with MDAnalysis installed, any Universe with forces --
e.g. a GROMACS TRR -- works the same way: ``ts.forces`` are the labels).

Run: python examples/06_force_matching.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import jax.numpy as jnp
import numpy as np

import hoomd_tf_tpu as htf
from hoomd_tf_tpu.utils.gsd_io import GSDUniverse, write_gsd_frames


class TrainableLJ(htf.SimModel):
    def setup(self):
        # the LJ force-MSE landscape has a narrow curved valley
        # (eps*sigma^12 ~ const); start inside the physical basin
        self.eps = htf.Variable(0.8, name="epsilon")
        self.sig = htf.Variable(1.1, name="sigma")

    def compute(self, nlist, positions, box):
        rinv = htf.nlist_rinv(nlist)
        sr6 = (self.sig.value * rinv) ** 6
        p_energy = self.eps.value * 4.0 / 2.0 * (sr6 ** 2 - sr6)
        energy = jnp.sum(p_energy, axis=1)
        return htf.compute_nlist_forces(nlist, energy)


class _Observer(htf.SimModel):
    def compute(self, nlist):
        return jnp.zeros(())


def generate_gsd(path, n=64, frames=20, r_cut=3.0):
    """Run the true LJ fluid and dump a GSD trajectory with forces."""
    sim = htf.Simulation(dt=0.002, integrator=htf.md.NVT(kT=1.0, tau=0.5),
                         seed=3)
    sim.init_lattice(n, density=0.3, kT_init=1.0)
    sim.add_force(htf.md.LennardJones(r_cut=r_cut))
    obs = htf.tfcompute(_Observer(n - 1, output_forces=False))
    obs.attach(sim, r_cut=r_cut)
    recorded = []
    for _ in range(frames):
        sim.run(20)
        recorded.append({"positions": np.asarray(sim.state.positions),
                         "velocity": np.asarray(sim.state.velocities),
                         "forces": np.asarray(sim.state.forces)[:, :3],
                         "typeid": np.zeros(n, np.uint32)})
    box_l = np.asarray(htf.box_size(sim.state.box))
    write_gsd_frames(path, recorded, box=box_l)
    return box_l


def main():
    # NN must cover every in-range neighbor or the dropped tails bias
    # the fit (max occupancy here is ~34 at r_cut=3)
    nn, r_cut = 48, 3.0
    path = os.path.join(tempfile.mkdtemp(), "lj_fluid.gsd")
    generate_gsd(path)
    print(f"wrote trajectory with per-frame forces: {path}")

    model = TrainableLJ(nn)
    model.compile(optimizer="adam", loss="mse", learning_rate=2e-2)

    universe = GSDUniverse(path)
    for epoch in range(18):
        losses = []
        # ts.forces: per-frame label forces straight from the trajectory
        for inputs, ts in htf.iter_from_trajectory(nn, universe,
                                                   r_cut=r_cut):
            loss = model.train_on_batch(inputs, jnp.asarray(ts.forces))
            losses.append(float(loss))
        print(f"epoch {epoch}  loss={np.mean(losses):.5f}  "
              f"eps={float(model.eps.value):.3f}  "
              f"sig={float(model.sig.value):.3f}")
    print("true parameters: eps=1.0 sig=1.0")
    assert abs(float(model.eps.value) - 1.0) < 0.2
    assert abs(float(model.sig.value) - 1.0) < 0.1


if __name__ == "__main__":
    main()
