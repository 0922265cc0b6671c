"""CG stack, graph analysis, trajectory iteration -- ports of the
reference's test_utils.py with duck-typed stand-ins for MDAnalysis."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import hoomd_tf_tpu as htf
import zoo


# ---------------------------------------------------------------------------
# duck-typed MDAnalysis stand-ins
# ---------------------------------------------------------------------------

class FakeAtoms:
    def __init__(self, names, masses, resnames=None, types=None,
                 positions=None, resids=None):
        self.names = list(names)
        self.masses = list(masses)
        self.resnames = np.asarray(resnames if resnames is not None
                                   else ["MOL"] * len(names))
        self.types = np.asarray(types if types is not None
                                else ["C"] * len(names))
        self.positions = positions
        self.n_atoms = len(names)

    def __len__(self):
        return self.n_atoms


class FakeBonds:
    def __init__(self, pairs):
        self._pairs = np.asarray(pairs, dtype=np.int64)

    def to_indices(self):
        return self._pairs


class FakeGroup(FakeAtoms):
    def __init__(self, *args, bonds=(), **kwargs):
        super().__init__(*args, **kwargs)
        self.bonds = FakeBonds(bonds)
        self.atoms = self


class FakeTimestep:
    def __init__(self, frame):
        self.frame = frame


class FakeUniverse:
    """Minimal universe protocol for iter_from_trajectory and friends."""

    def __init__(self, positions_frames, names=None, types=None, bonds=(),
                 dimensions=(10, 10, 10, 90, 90, 90), resnames=None,
                 forces_frames=None, velocities_frames=None):
        self._frames = [np.asarray(p, dtype=np.float32)
                        for p in positions_frames]
        self._force_frames = ([np.asarray(f, dtype=np.float32)
                               for f in forces_frames]
                              if forces_frames is not None else None)
        self._vel_frames = ([np.asarray(v, dtype=np.float32)
                             for v in velocities_frames]
                            if velocities_frames is not None else None)
        n = self._frames[0].shape[0]
        names = names or [f"A{i}" for i in range(n)]
        self._group = FakeGroup(
            names, [1.0] * n, resnames=resnames, types=types, bonds=bonds)
        self.dimensions = np.asarray(dimensions, dtype=np.float64)
        self.atoms = self._group

    def select_atoms(self, selection):
        return self._group

    @property
    def trajectory(self):
        def gen():
            for i, f in enumerate(self._frames):
                self._group.positions = f
                if self._force_frames is not None:
                    self._group.forces = self._force_frames[i]
                if self._vel_frames is not None:
                    self._group.velocities = self._vel_frames[i]
                yield FakeTimestep(i)
        return gen()


# ---------------------------------------------------------------------------

class TestFindMolecules:
    def test_union_find(self):
        sim = htf.Simulation()
        sim.init_lattice(6, a=2.0)
        sim.bonds = [[0, 1], [1, 2], [4, 5]]
        mapping = htf.find_molecules(sim)
        assert mapping == [[0, 1, 2], [3], [4, 5]]

    def test_branching(self):
        sim = htf.Simulation()
        sim.init_lattice(5, a=2.0)
        sim.bonds = [[0, 2], [2, 1], [2, 3], [3, 4]]
        mapping = htf.find_molecules(sim)
        assert mapping == [[0, 1, 2, 3, 4]]

    def test_from_topology(self):
        u = FakeUniverse(
            [np.zeros((6, 3))],
            names=["O", "H", "H", "O", "H", "H"],
            resnames=["W", "W", "W", "W", "W", "W"])
        mols = htf.find_molecules_from_topology(u, [["O", "H", "H"]])
        assert mols == [[0, 1, 2], [3, 4, 5]]


class TestMatrixMapping:
    def test_water_like(self):
        mol = FakeAtoms(["O", "H1", "H2"], [16.0, 1.0, 1.0])
        cg = htf.matrix_mapping(mol, [["O", "H1", "H2"]])
        assert cg.shape == (1, 3)
        np.testing.assert_allclose(cg.sum(axis=1), 1.0)
        np.testing.assert_allclose(cg[0], [16 / 18, 1 / 18, 1 / 18])

    def test_two_beads(self):
        mol = FakeAtoms(["C1", "C2", "N1", "N2"], [12.0, 12.0, 14.0, 14.0])
        cg = htf.matrix_mapping(mol, [["C1", "C2"], ["N1", "N2"]])
        assert cg.shape == (2, 4)
        np.testing.assert_allclose(cg[0, :2], 0.5)
        np.testing.assert_allclose(cg[1, 2:], 0.5)

    def test_binary_variant(self):
        mol = FakeAtoms(["O", "H1", "H2"], [16.0, 1.0, 1.0])
        mw, binary = htf.matrix_mapping(mol, [["O", "H1", "H2"]],
                                        mass_weighted=False)
        np.testing.assert_allclose(binary, [[1, 1, 1]])


class TestSparseMapping:
    def _mapping(self, system=None):
        mm = np.array([[1.0, 1.0, 1.0]]) / 3
        mmi = [[0, 1, 2], [3, 4, 5]]
        return htf.sparse_mapping([mm, mm], mmi, system=system)

    def test_shape_and_values(self):
        sm = self._mapping()
        assert sm.shape == (2, 6)
        dense = np.asarray(sm.todense())
        np.testing.assert_allclose(dense[0, :3], 1 / 3)
        np.testing.assert_allclose(dense[1, 3:], 1 / 3)

    def test_mass_weighted(self):
        sim = htf.Simulation()
        sim.init_lattice(6, a=2.0)
        sim.state = dataclasses.replace(
            sim.state,
            masses=jnp.asarray([2.0, 1.0, 1.0, 2.0, 1.0, 1.0]))
        mm = np.array([[1.0, 1.0, 1.0]])
        sm = htf.sparse_mapping([mm, mm], [[0, 1, 2], [3, 4, 5]],
                                system=sim)
        dense = np.asarray(sm.todense())
        np.testing.assert_allclose(dense[0, :3], [0.5, 0.25, 0.25])
        np.testing.assert_allclose(dense.sum(axis=1), 1.0)

    def test_shape_mismatch_raises(self):
        mm = np.array([[1.0, 1.0]])
        with pytest.raises(ValueError):
            htf.sparse_mapping([mm], [[0, 1, 2]])

    def test_type_check(self):
        with pytest.raises(TypeError):
            htf.sparse_mapping([[0, 1]], [[0, 1]])


class TestCenterOfMass:
    def test_pbc_straddling(self):
        """Two atoms straddling the boundary map to the boundary, not the
        box center (reference test_com, test_utils.py:156-185)."""
        box = [10.0, 10.0, 10.0]
        positions = jnp.asarray([[4.8, 0, 0], [-4.8, 0, 0]])
        mapping = htf.sparse_mapping(
            [np.ones((1, 2)) / 2], [[0, 1]])
        com = np.asarray(htf.center_of_mass(positions, mapping, box))
        assert abs(abs(com[0, 0]) - 5.0) < 1e-4
        np.testing.assert_allclose(com[0, 1:], 0.0, atol=1e-5)

    def test_simple_mean_inside_box(self):
        box = [10.0, 10.0, 10.0]
        positions = jnp.asarray([[1.0, 1, 0], [2.0, 3, 0]])
        mapping = htf.sparse_mapping([np.ones((1, 2)) / 2], [[0, 1]])
        com = np.asarray(htf.center_of_mass(positions, mapping, box))
        np.testing.assert_allclose(com[0], [1.5, 2.0, 0.0], atol=1e-3)


class TestOHE:
    def test_golden_indices(self):
        n_btypes = 3
        pos_btype = jnp.asarray([0, 1, 2])
        nlist_btype = jnp.asarray([[0, 1, 2], [0, 1, 2], [0, 1, 2]])
        ohe = np.asarray(htf.compute_ohe_bead_type_interactions(
            pos_btype, nlist_btype, n_btypes))
        assert ohe.shape == (3, 3, 6)
        # unordered pair -> index: (0,0)->0 (0,1)->1 (0,2)->2
        #                          (1,1)->3 (1,2)->4 (2,2)->5
        expect = np.array([[0, 1, 2], [1, 3, 4], [2, 4, 5]])
        got = ohe.argmax(axis=-1)
        np.testing.assert_array_equal(got, expect)


class TestExclusions:
    def _universe(self):
        # two identical 3-atom molecules, bonded 0-1, 1-2 within each
        names = ["A", "B", "C"] * 2
        u = FakeUniverse(
            [np.zeros((6, 3))],
            names=["A", "B", "C", "A", "B", "C"],
            bonds=[[0, 1], [1, 2], [3, 4], [4, 5]])
        return u

    def test_mapped_exclusion(self):
        u = self._universe()
        mol = FakeAtoms(["A", "B", "C"], [1.0, 1.0, 1.0])
        excl = htf.gen_mapped_exclusion_list(
            u, mol, [["A", "B"], ["C"]])
        assert excl.shape == (4, 4)
        # beads 0-1 (mol 0) and 2-3 (mol 1) are bonded -> excluded
        assert excl[0, 1] and excl[1, 0]
        assert excl[2, 3] and excl[3, 2]
        assert not excl[0, 2] and not excl[1, 2]
        assert not np.any(np.diag(excl))

    def test_bonds_group(self):
        excl = np.array([[False, True], [True, False]])
        bonds = htf.gen_bonds_group(excl)
        np.testing.assert_array_equal(bonds, [[0, 1]])


class TestCGGraph:
    def test_chain_adjacency(self):
        adj = np.zeros((4, 4))
        for i in range(3):
            adj[i, i + 1] = adj[i + 1, i] = 1
        rs, angs, dihs = htf.compute_cg_graph(
            DSGPM=False, adj_mat=adj, cg_beads=4)
        assert sorted(map(tuple, rs)) == [(0, 1), (1, 2), (2, 3)]
        assert sorted(map(tuple, angs)) == [(0, 1, 2), (1, 2, 3)]
        assert sorted(map(tuple, dihs)) == [(0, 1, 2, 3)]

    def test_dsgpm_json(self, tmp_path):
        import json
        obj = {"cgnodes": [[0, 1], [2], [3]],
               "edges": [{"source": 1, "target": 2},
                         {"source": 2, "target": 3}]}
        path = tmp_path / "cg.json"
        path.write_text(json.dumps(obj))
        adj = htf.compute_adj_mat(obj)
        np.testing.assert_array_equal(
            adj, [[0, 1, 0], [1, 0, 1], [0, 1, 0]])
        rs, angs, dihs = htf.compute_cg_graph(DSGPM=True, infile=str(path))
        assert sorted(map(tuple, rs)) == [(0, 1), (1, 2)]
        assert sorted(map(tuple, angs)) == [(0, 1, 2)]

    def test_find_cgnode_id(self):
        cg = [[0, 3], [1], [2, 4]]
        assert htf.find_cgnode_id(3, cg) == 0
        assert htf.find_cgnode_id(4, cg) == 2

    def test_mol_features_multiple(self):
        bnd = np.array([[0, 1], [1, 2]])
        ang = np.array([[0, 1, 2]])
        dih = np.array([[0, 1, 2, 3]])
        b, a, d = htf.mol_features_multiple(
            bnd_indices=bnd, ang_indices=ang, dih_indices=dih,
            molecules=2, beads=4)
        np.testing.assert_array_equal(
            b, [[0, 1], [1, 2], [4, 5], [5, 6]])
        np.testing.assert_array_equal(a, [[0, 1, 2], [4, 5, 6]])
        np.testing.assert_array_equal(d, [[0, 1, 2, 3], [4, 5, 6, 7]])


class TestIterFromTrajectory:
    def test_frames_and_shapes(self):
        rng = np.random.RandomState(0)
        frames = [rng.rand(8, 3) * 8 for _ in range(5)]
        u = FakeUniverse(frames, types=["C"] * 4 + ["H"] * 4,
                         dimensions=(8, 8, 8, 90, 90, 90))
        outs = list(htf.iter_from_trajectory(4, u, r_cut=3.0))
        assert len(outs) == 5
        (nlist, positions, box), ts = outs[0]
        assert nlist.shape == (8, 4, 4)
        assert positions.shape == (8, 4)
        assert box.shape == (3, 3)
        # types indexed from unique sorted types: C=0, H=1
        np.testing.assert_allclose(np.asarray(positions)[:4, 3], 0)
        np.testing.assert_allclose(np.asarray(positions)[4:, 3], 1)

    def test_nlist_recomputed_per_frame(self):
        """Deliberate fix of the reference's frame-0 stale-nlist quirk."""
        f0 = np.zeros((2, 3), dtype=np.float32)
        f0[1, 0] = 1.0
        f1 = np.zeros((2, 3), dtype=np.float32)
        f1[1, 0] = 2.5
        u = FakeUniverse([f0, f1], dimensions=(10, 10, 10, 90, 90, 90))
        outs = list(htf.iter_from_trajectory(2, u, r_cut=4.0))
        nl0 = np.asarray(outs[0][0][0])
        nl1 = np.asarray(outs[1][0][0])
        assert abs(nl0[0, 0, 0] - 1.0) < 1e-5
        assert abs(nl1[0, 0, 0] - 2.5) < 1e-5

    def test_period_and_model_consumption(self):
        rng = np.random.RandomState(1)
        frames = [rng.rand(6, 3) * 6 for _ in range(6)]
        u = FakeUniverse(frames, dimensions=(6, 6, 6, 90, 90, 90))
        model = zoo.LJModel(4)
        count = 0
        for inputs, ts in htf.iter_from_trajectory(4, u, r_cut=2.0,
                                                   period=2):
            out = model(inputs)
            assert np.all(np.isfinite(np.asarray(out[0])))
            count += 1
        assert count == 3

    def test_frame_forces_and_velocities(self):
        """The yielded frame surfaces per-frame selection forces and
        velocities when the trajectory has them (reference parity:
        utils.py:666-686 sub-universe for offline force matching)."""
        rng = np.random.RandomState(3)
        frames = [rng.rand(6, 3) * 6 for _ in range(3)]
        forces = [rng.randn(6, 3).astype(np.float32) for _ in range(3)]
        vels = [rng.randn(6, 3).astype(np.float32) for _ in range(3)]
        u = FakeUniverse(frames, dimensions=(6, 6, 6, 90, 90, 90),
                         forces_frames=forces, velocities_frames=vels)
        outs = list(htf.iter_from_trajectory(4, u, r_cut=2.0))
        for i, (inputs, ts) in enumerate(outs):
            np.testing.assert_allclose(ts.forces, forces[i])
            np.testing.assert_allclose(ts.velocities, vels[i])
            np.testing.assert_allclose(ts.positions, frames[i], atol=1e-6)
            assert ts.frame == i

    def test_frame_forces_absent_raises(self):
        u = FakeUniverse([np.zeros((4, 3))],
                         dimensions=(6, 6, 6, 90, 90, 90))
        (inputs, ts), = list(htf.iter_from_trajectory(2, u, r_cut=2.0))
        with pytest.raises(AttributeError):
            ts.forces

    def test_force_matching_on_frame_labels(self):
        """Train directly on ts.forces labels (the reference's offline
        force-matching loop, examples 06/08)."""
        rng = np.random.RandomState(4)
        frames = [rng.rand(8, 3) * 6 for _ in range(4)]
        forces = [np.zeros((8, 3), dtype=np.float32) for _ in range(4)]
        u = FakeUniverse(frames, dimensions=(6, 6, 6, 90, 90, 90),
                         forces_frames=forces)
        model = zoo.TrainableGraph(6)
        model.compile(optimizer="adam", loss="mse", learning_rate=1e-2)
        for inputs, ts in htf.iter_from_trajectory(6, u, r_cut=2.5):
            loss = float(model.train_on_batch(
                inputs, jnp.asarray(ts.forces)))
            assert np.isfinite(loss)

    def test_offline_training_from_trajectory(self):
        """Offline force matching over trajectory frames (the reference's
        examples 06/08 pattern)."""
        rng = np.random.RandomState(2)
        frames = [rng.rand(8, 3) * 6 for _ in range(4)]
        u = FakeUniverse(frames, dimensions=(6, 6, 6, 90, 90, 90))
        model = zoo.TrainableGraph(6)
        model.compile(optimizer="adam", loss="mse", learning_rate=1e-2)
        labels = np.zeros((8, 4), dtype=np.float32)
        losses = []
        for inputs, ts in htf.iter_from_trajectory(6, u, r_cut=2.5):
            losses.append(float(model.train_on_batch(inputs, labels)))
        assert len(losses) == 4
        assert np.all(np.isfinite(losses))
