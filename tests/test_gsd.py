"""Native GSD loader: cross-validated against a hoomd-written reference
file, write/read roundtrip, and the iter_from_trajectory adapter."""

import os

import numpy as np
import pytest

import hoomd_tf_tpu as htf
from hoomd_tf_tpu.utils.gsd_io import GSDFile, GSDUniverse, write_gsd_frames

REFERENCE_GSD = "/root/reference/htf/test-py/meth.gsd"


class TestRead:
    @pytest.mark.skipif(not os.path.exists(REFERENCE_GSD),
                        reason="reference fixture not available")
    def test_reads_hoomd_written_file(self):
        with GSDFile(REFERENCE_GSD) as f:
            assert f.schema == "hoomd"
            assert f.nframes == 1
            n = int(f.read_chunk(0, "particles/N")[0])
            pos = f.read_chunk(0, "particles/position")
            box = f.read_chunk(0, "configuration/box")
            assert pos.shape == (n, 3)
            assert pos.dtype == np.float32
            # positions inside the box
            assert np.all(np.abs(pos) <= box[:3].max() / 2 + 1e-3)

    def test_missing_file_raises(self):
        with pytest.raises(OSError):
            GSDFile("/tmp/definitely_not_here.gsd")


class TestRoundtrip:
    def test_write_read(self, tmp_path):
        rng = np.random.RandomState(0)
        frames = [
            {"positions": rng.rand(12, 3).astype(np.float32),
             "typeid": (np.arange(12) % 3).astype(np.uint32),
             "velocity": rng.randn(12, 3).astype(np.float32)}
            for _ in range(4)]
        path = str(tmp_path / "traj.gsd")
        write_gsd_frames(path, frames, box=[6, 6, 6])
        with GSDFile(path) as f:
            assert f.nframes == 4
            for i, fr in enumerate(frames):
                np.testing.assert_allclose(
                    f.read_chunk(i, "particles/position"),
                    fr["positions"])
                np.testing.assert_array_equal(
                    f.read_chunk(i, "particles/typeid"), fr["typeid"])
            # box written once at frame 0, falls back for later frames
            np.testing.assert_allclose(
                f.read_chunk(3, "configuration/box")[:3], [6, 6, 6])

    def test_chunk_fallback_semantics(self, tmp_path):
        path = str(tmp_path / "t.gsd")
        with GSDFile(path, mode="w") as f:
            f.write_chunk("particles/N", np.array([3], np.uint32))
            f.write_chunk("particles/position",
                          np.zeros((3, 3), np.float32))
            f.end_frame()
            f.write_chunk("particles/position",
                          np.ones((3, 3), np.float32))
            f.end_frame()
        with GSDFile(path) as f:
            # N absent in frame 1 -> falls back to frame 0
            assert int(f.read_chunk(1, "particles/N")[0]) == 3
            np.testing.assert_allclose(
                f.read_chunk(1, "particles/position"), 1.0)

    def test_missing_chunk_raises(self, tmp_path):
        path = str(tmp_path / "t.gsd")
        with GSDFile(path, mode="w") as f:
            f.write_chunk("particles/N", np.array([1], np.uint32))
            f.end_frame()
        with GSDFile(path) as f:
            with pytest.raises(KeyError):
                f.read_chunk(0, "particles/nope")


class TestUniverseAdapter:
    def test_iter_from_trajectory(self, tmp_path):
        rng = np.random.RandomState(1)
        frames = [{"positions": (rng.rand(10, 3) * 8 - 4).astype(np.float32)}
                  for _ in range(3)]
        path = str(tmp_path / "traj.gsd")
        write_gsd_frames(path, frames, box=[8, 8, 8])
        u = GSDUniverse(path)
        outs = list(htf.iter_from_trajectory(6, u, r_cut=3.0))
        assert len(outs) == 3
        nlist, positions, box = outs[1][0]
        assert nlist.shape == (10, 6, 4)
        np.testing.assert_allclose(
            np.asarray(positions)[:, :3], frames[1]["positions"],
            atol=1e-6)

    def test_forces_and_velocities_roundtrip(self, tmp_path):
        """Force/velocity labels survive the GSD roundtrip and surface on
        the yielded frame (VERDICT item 7: offline force matching from
        real trajectory files)."""
        rng = np.random.RandomState(2)
        frames = [{"positions": (rng.rand(8, 3) * 6 - 3).astype(np.float32),
                   "velocity": rng.randn(8, 3).astype(np.float32),
                   "forces": rng.randn(8, 3).astype(np.float32)}
                  for _ in range(3)]
        path = str(tmp_path / "traj.gsd")
        write_gsd_frames(path, frames, box=[6, 6, 6])
        u = GSDUniverse(path)
        outs = list(htf.iter_from_trajectory(4, u, r_cut=2.0))
        assert len(outs) == 3
        for i, (inputs, ts) in enumerate(outs):
            np.testing.assert_allclose(ts.forces, frames[i]["forces"])
            np.testing.assert_allclose(ts.velocities,
                                       frames[i]["velocity"])

    def test_forces_absent_raises(self, tmp_path):
        path = str(tmp_path / "t.gsd")
        write_gsd_frames(
            path, [{"positions": np.zeros((3, 3), np.float32)}],
            box=[5, 5, 5])
        u = GSDUniverse(path)
        (inputs, ts), = list(htf.iter_from_trajectory(2, u, r_cut=2.0))
        with pytest.raises(AttributeError):
            ts.forces

    def test_simulation_trajectory_to_gsd_and_back(self, tmp_path):
        """End-to-end: run MD, dump gsd via the native writer, re-read and
        force-match -- the reference's offline pipeline without MDAnalysis."""
        import jax.numpy as jnp
        import zoo
        n = 16
        sim = htf.Simulation(dt=0.002, seed=0,
                             integrator=htf.md.NVT(kT=0.8, tau=0.5))
        sim.init_lattice(n, a=1.5, kT_init=0.8)
        lj = sim.add_force(htf.md.LennardJones(r_cut=3.0))
        obs = htf.tfcompute(zoo.TensorSaveModel(n - 1, output_forces=False))
        obs.attach(sim, r_cut=3.0)
        frames = []
        for _ in range(3):
            sim.run(5)
            frames.append({
                "positions": np.asarray(sim.state.positions),
                "typeid": np.zeros(n, np.uint32)})
        path = str(tmp_path / "md.gsd")
        box_l = np.asarray(htf.box_size(sim.state.box))
        write_gsd_frames(path, frames, box=box_l)
        u = GSDUniverse(path)
        model = zoo.LJModel(n - 1)
        for inputs, ts in htf.iter_from_trajectory(n - 1, u, r_cut=3.0):
            out = model(inputs)
            assert np.all(np.isfinite(np.asarray(out[0])))
