"""Real-MDAnalysis interop: the duck-typed universe protocol the package
is written against, validated against the actual library over a real TRR
trajectory (reference parity: ``test-py/test_utils.py:571-596`` and the
``iter_from_trajectory`` contract, ``utils.py:627-749``).

Skipped when MDAnalysis is not installed (it is not part of this
package's dependencies); the ``mdanalysis`` CI job installs it and runs
exactly this file.
"""

import os

import numpy as np
import pytest

mda = pytest.importorskip("MDAnalysis")

import jax.numpy as jnp  # noqa: E402

import hoomd_tf_tpu as htf  # noqa: E402
import zoo  # noqa: E402

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
PDB = os.path.join(FIXTURES, "peg2.pdb")
CGMAP = os.path.join(FIXTURES, "peg2_cgmap.json")

N_FRAMES = 4


@pytest.fixture()
def trr_universe(tmp_path):
    """A real ``mda.Universe(pdb, trr)``: topology from the committed PDB
    fixture, trajectory generated in-test as a TRR carrying positions,
    velocities and forces (the GROMACS-format leg of the reference's CG
    pipeline)."""
    from MDAnalysis.coordinates.memory import MemoryReader

    u0 = mda.Universe(PDB)
    n = len(u0.atoms)
    rng = np.random.RandomState(0)
    base = u0.atoms.positions.copy()
    coords = np.stack([base + 0.1 * i for i in range(N_FRAMES)]).astype(
        np.float32)
    vels = rng.randn(N_FRAMES, n, 3).astype(np.float32)
    frcs = rng.randn(N_FRAMES, n, 3).astype(np.float32)
    dims = np.tile(np.array([40.0, 40, 40, 90, 90, 90], np.float32),
                   (N_FRAMES, 1))
    um = mda.Universe(PDB)
    um.load_new(coords, format=MemoryReader, velocities=vels,
                forces=frcs, dimensions=dims)
    trr = str(tmp_path / "peg2.trr")
    with mda.Writer(trr, n) as w:
        for ts in um.trajectory:
            w.write(um.atoms)
    u = mda.Universe(PDB, trr)
    return u, coords, vels, frcs


class TestIterFromTrajectory:
    def test_frames_and_labels(self, trr_universe):
        u, coords, vels, frcs = trr_universe
        count = 0
        for inputs, frame in htf.iter_from_trajectory(8, u, r_cut=3.0):
            nlist, positions, box = inputs
            n = len(u.atoms)
            assert nlist.shape == (n, 8, 4)
            np.testing.assert_allclose(np.asarray(positions)[:, :3],
                                       coords[count], atol=1e-3)
            # TRR round-trips velocities and forces -> training labels
            np.testing.assert_allclose(frame.velocities, vels[count],
                                       atol=1e-3)
            np.testing.assert_allclose(frame.forces, frcs[count],
                                       atol=1e-3)
            # box: orthorhombic 40 A cube -> hoomd lengths row
            np.testing.assert_allclose(np.asarray(box)[1], [40, 40, 40],
                                       atol=1e-4)
            count += 1
        assert count == N_FRAMES

    def test_model_and_train_on_batch(self, trr_universe):
        """The offline force-matching loop of reference example 08, on a
        real MDAnalysis trajectory."""
        u, _, _, _ = trr_universe
        model = zoo.TrainableGraph(8)
        model.compile(optimizer="adam", loss="mse", learning_rate=1e-3)
        losses = []
        for inputs, frame in htf.iter_from_trajectory(8, u, r_cut=3.0):
            labels = np.concatenate(
                [frame.forces, np.zeros((len(u.atoms), 1), np.float32)],
                axis=1)
            losses.append(float(model.train_on_batch(inputs, labels)))
        assert len(losses) == N_FRAMES
        assert all(np.isfinite(l) for l in losses)

    def test_selection_subuniverse(self, trr_universe):
        """A selection restricts positions/labels to the sub-group
        (reference sub-universe semantics, utils.py:666-686)."""
        u, coords, _, frcs = trr_universe
        sel = u.select_atoms("name C*")
        n_sel = len(sel)
        assert 0 < n_sel < len(u.atoms)
        idx = sel.indices
        count = 0
        for inputs, frame in htf.iter_from_trajectory(
                8, u, selection="name C*", r_cut=3.0):
            nlist, positions, box = inputs
            assert nlist.shape == (n_sel, 8, 4)
            np.testing.assert_allclose(np.asarray(positions)[:, :3],
                                       coords[count][idx], atol=1e-3)
            np.testing.assert_allclose(frame.forces, frcs[count][idx],
                                       atol=1e-3)
            count += 1
        assert count == N_FRAMES


class TestCGPipeline:
    def test_find_molecules_from_topology(self):
        u = mda.Universe(PDB)
        mols = htf.find_molecules_from_topology(
            u, [["C1", "C2", "O1", "C3", "C4", "O2",
                 "C5", "C6", "O3", "C7", "C8", "O4"]])
        assert mols == [list(range(12)), list(range(12, 24))]

    def test_full_pipeline(self, trr_universe):
        """PDB topology + TRR frames -> mapping -> CG features, through
        the real library end to end."""
        u, _, _, _ = trr_universe
        mol = u.residues[0].atoms
        names = list(mol.names)
        beads = [names[0:3], names[3:6], names[6:9], names[9:12]]
        mapping = htf.matrix_mapping(mol, beads)
        assert mapping.shape == (4, 12)
        np.testing.assert_allclose(mapping.sum(1), 1.0, rtol=1e-6)

        mols = htf.find_molecules_from_topology(
            u, [["C1", "C2", "O1", "C3", "C4", "O2",
                 "C5", "C6", "O3", "C7", "C8", "O4"]])
        sparse = htf.sparse_mapping([mapping, mapping], mols)
        assert sparse.shape == (8, 24)

        bonds, angles, dihedrals = htf.compute_cg_graph(
            DSGPM=True, infile=CGMAP)
        b_ids, a_ids, d_ids = htf.mol_features_multiple(
            bnd_indices=bonds, ang_indices=angles, dih_indices=dihedrals,
            molecules=2, beads=4)

        box = htf.box_from_lengths(u.dimensions[:3])
        for ts in u.trajectory:
            cg_pos = np.asarray(sparse.todense()) @ u.atoms.positions
            rs = htf.mol_bond_distance(
                CG=True, cg_positions=jnp.asarray(cg_pos),
                b1=b_ids[:, 0], b2=b_ids[:, 1], box=box)
            assert np.all(np.isfinite(np.asarray(rs)))
            assert 2.0 < float(np.mean(np.asarray(rs))) < 6.0

    def test_center_of_mass_matches_mda(self):
        """htf.center_of_mass (PBC circular mean) agrees with
        MDAnalysis's center_of_mass for a compact group away from the
        periodic boundary."""
        u = mda.Universe(PDB)
        grp = u.residues[0].atoms
        n = len(u.atoms)
        mapping = np.zeros((1, n), np.float32)
        mapping[0, grp.indices] = (grp.masses /
                                   grp.masses.sum()).astype(np.float32)
        com_htf = np.asarray(htf.center_of_mass(
            jnp.asarray(u.atoms.positions, jnp.float32),
            jnp.asarray(mapping), u.dimensions[:3]))[0]
        com_ref = grp.center_of_mass()
        np.testing.assert_allclose(com_htf, com_ref, atol=1e-2)
