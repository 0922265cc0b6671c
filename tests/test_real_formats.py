"""Real-file-format CG pipeline: the committed PDB + DSGPM fixtures run
the full topology -> mapping -> features workflow through the native
readers (reference parity: ``test-py/test_utils.py:571-596``, which runs
the same pipeline on ``test_segA.pdb``/``test_cgmap.json`` via
MDAnalysis)."""

import os

import numpy as np
import pytest

import hoomd_tf_tpu as htf
from hoomd_tf_tpu.utils.pdb_io import PDBUniverse
from hoomd_tf_tpu.utils.gsd_io import write_gsd_frames

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
PDB = os.path.join(FIXTURES, "peg2.pdb")
CGMAP = os.path.join(FIXTURES, "peg2_cgmap.json")


class TestPDBUniverse:
    def test_topology(self):
        u = PDBUniverse(PDB)
        assert len(u.atoms) == 24
        assert u.atoms.names[0] == "C1"
        assert u.atoms.names[2] == "O1"
        np.testing.assert_allclose(u.atoms.masses[0], 12.011)
        np.testing.assert_allclose(u.atoms.masses[2], 15.999)
        assert list(u.atoms.resids[:12]) == [1] * 12
        assert list(u.atoms.resids[12:]) == [2] * 12
        np.testing.assert_allclose(u.dimensions,
                                   [40, 40, 40, 90, 90, 90])
        # CONECT chain bonds: 11 per molecule
        assert len(u.atoms.bonds.to_indices()) == 22

    def test_selections(self):
        u = PDBUniverse(PDB)
        assert len(u.select_atoms("all")) == 24
        assert len(u.select_atoms("name C1")) == 2
        assert len(u.select_atoms("name C*")) == 16
        assert len(u.select_atoms("not name O*")) == 16
        assert len(u.select_atoms("type O")) == 8
        with pytest.raises(ValueError):
            u.select_atoms("around 5 name C1")

    def test_model_frames(self):
        u = PDBUniverse(PDB)
        assert u.n_frames == 3
        frames = []
        for ts in u.trajectory:
            frames.append(u.atoms.positions.copy())
        assert len(frames) == 3
        # frame 0 is the unperturbed lattice; frame 2 is jittered
        assert np.abs(frames[2] - frames[0]).max() > 1e-3

    def test_center_of_mass(self):
        u = PDBUniverse(PDB)
        grp = u.select_atoms("name C1 C2 O1")
        com = grp.center_of_mass()
        m = grp.masses[:, None]
        np.testing.assert_allclose(
            com, (grp.positions * m).sum(0) / m.sum(), rtol=1e-6)


class TestRealFormatCGPipeline:
    def test_find_molecules_from_topology(self):
        u = PDBUniverse(PDB)
        mols = htf.find_molecules_from_topology(
            u, [["C1", "C2", "O1", "C3", "C4", "O2",
                 "C5", "C6", "O3", "C7", "C8", "O4"]])
        assert mols == [list(range(12)), list(range(12, 24))]

    def test_dsgpm_graph(self):
        """DSGPM JSON -> CG bonds/angles/dihedrals (4-bead chain)."""
        bonds, angles, dihedrals = htf.compute_cg_graph(
            DSGPM=True, infile=CGMAP)
        assert bonds.shape == (3, 2)
        assert angles.shape == (2, 3)
        assert dihedrals.shape == (1, 4)
        np.testing.assert_array_equal(dihedrals[0], [0, 1, 2, 3])

    def test_full_pipeline(self):
        """PDB + DSGPM + GSD frames -> mapping -> tiled features ->
        internal coordinates, end to end on real file formats."""
        u = PDBUniverse(PDB)
        names = list(u.select_atoms("resname PEG").names[:12])
        beads = [names[0:3], names[3:6], names[6:9], names[9:12]]
        mol = u.select_atoms("all")

        # mass-weighted mapping matrix + system sparse operator
        mapping = htf.matrix_mapping(
            _FirstMol(u), beads)
        assert mapping.shape == (4, 12)
        np.testing.assert_allclose(mapping.sum(1), 1.0, rtol=1e-6)
        mols = htf.find_molecules_from_topology(
            u, [["C1", "C2", "O1", "C3", "C4", "O2",
                 "C5", "C6", "O3", "C7", "C8", "O4"]])
        sparse = htf.sparse_mapping([mapping, mapping], mols)
        assert sparse.shape == (8, 24)

        # CG connectivity from the DSGPM file, tiled across molecules
        bonds, angles, dihedrals = htf.compute_cg_graph(
            DSGPM=True, infile=CGMAP)
        b_ids, a_ids, d_ids = htf.mol_features_multiple(
            bnd_indices=bonds, ang_indices=angles, dih_indices=dihedrals,
            molecules=2, beads=4)
        assert b_ids.shape == (6, 2)
        assert a_ids.shape == (4, 3)
        assert d_ids.shape == (2, 4)

        # CG coordinates + internal coordinates per frame
        import jax.numpy as jnp
        box = htf.box_from_lengths(u.dimensions[:3])
        for ts in u.trajectory:
            cg_pos = np.asarray(sparse.todense()) @ u.atoms.positions
            rs = htf.mol_bond_distance(
                CG=True, cg_positions=jnp.asarray(cg_pos),
                b1=b_ids[:, 0], b2=b_ids[:, 1], box=box)
            angs = htf.mol_angle(
                CG=True, cg_positions=jnp.asarray(cg_pos),
                b1=a_ids[:, 0], b2=a_ids[:, 1], b3=a_ids[:, 2],
                box=box)
            dihs = htf.mol_dihedral(
                CG=True, cg_positions=jnp.asarray(cg_pos),
                b1=d_ids[:, 0], b2=d_ids[:, 1], b3=d_ids[:, 2],
                b4=d_ids[:, 3], box=box)
            assert np.all(np.isfinite(np.asarray(rs)))
            assert np.all(np.isfinite(np.asarray(angs)))
            assert np.all(np.isfinite(np.asarray(dihs)))
            # consecutive-bead bond length ~ 3 x 1.4 A chain spacing
            assert 2.0 < float(np.mean(np.asarray(rs))) < 6.0

    def test_iter_from_trajectory_on_pdb(self):
        """Model consumption of real-PDB frames, incl. types from
        elements."""
        import zoo
        u = PDBUniverse(PDB)
        model = zoo.LJModel(8)
        count = 0
        for inputs, ts in htf.iter_from_trajectory(8, u, r_cut=3.0):
            nlist, positions, box = inputs
            assert nlist.shape == (24, 8, 4)
            out = model(inputs)
            assert np.all(np.isfinite(np.asarray(out[0])))
            count += 1
        assert count == 3

    def test_pdb_topology_with_gsd_frames(self, tmp_path):
        """Topology from PDB + frames from GSD (the native analog of
        mda.Universe(pdb, trr))."""
        rng = np.random.RandomState(0)
        u0 = PDBUniverse(PDB)
        base = u0.atoms.positions
        frames = [{"positions":
                   (base + 0.1 * rng.randn(*base.shape)).astype(
                       np.float32)} for _ in range(5)]
        gsd_path = str(tmp_path / "frames.gsd")
        write_gsd_frames(gsd_path, frames, box=[40, 40, 40])
        u = PDBUniverse(PDB, traj=gsd_path)
        assert u.n_frames == 5
        seen = 0
        for inputs, ts in htf.iter_from_trajectory(8, u, r_cut=3.0):
            np.testing.assert_allclose(
                ts.positions, frames[seen]["positions"], atol=1e-6)
            seen += 1
        assert seen == 5


class _FirstMol:
    """matrix_mapping takes an MDAnalysis molecule (atom names + masses);
    adapt the first 12 atoms of the fixture."""

    def __init__(self, u):
        grp = u.atoms
        self.names = list(grp.names[:12])
        self.masses = list(grp.masses[:12])
        self.n_atoms = 12

    def __len__(self):
        return 12


class TestPDBParserRobustness:
    def _write(self, tmp_path, lines):
        p = tmp_path / "t.pdb"
        p.write_text("\n".join(lines) + "\n")
        return str(p)

    def test_hetatm_and_element_guessing(self, tmp_path):
        path = self._write(tmp_path, [
            "CRYST1   20.000   20.000   20.000  90.00  90.00  90.00 P 1",
            # no element column: guessed from the first alphabetic char
            "ATOM      1  CA  ALA A   1       1.000   2.000   3.000"
            "  1.00  0.00",
            "HETATM    2  O   HOH A   2       4.000   5.000   6.000"
            "  1.00  0.00           O",
            # name starting with a digit: element is the first letter
            "ATOM      3 1HB  ALA A   1       7.000   8.000   9.000"
            "  1.00  0.00",
        ])
        u = PDBUniverse(path)
        assert len(u.atoms) == 3
        assert list(u.atoms.types) == ["C", "O", "H"]
        np.testing.assert_allclose(u.atoms.masses,
                                   [12.011, 15.999, 1.008])
        np.testing.assert_allclose(u.atoms.positions[1], [4, 5, 6])

    def test_single_frame_no_model_records(self, tmp_path):
        path = self._write(tmp_path, [
            "ATOM      1  C   MOL A   1       0.000   0.000   0.000"
            "  1.00  0.00           C",
            "END",
        ])
        u = PDBUniverse(path)
        assert u.n_frames == 1
        assert len(list(u.trajectory)) == 1

    def test_conect_ignores_unknown_serials(self, tmp_path):
        path = self._write(tmp_path, [
            "ATOM      1  C1  MOL A   1       0.000   0.000   0.000"
            "  1.00  0.00           C",
            "ATOM      2  C2  MOL A   1       1.500   0.000   0.000"
            "  1.00  0.00           C",
            "CONECT    1    2",
            "CONECT    1    2",        # duplicate: deduplicated
            "CONECT    2    9",        # unknown serial: ignored
        ])
        u = PDBUniverse(path)
        np.testing.assert_array_equal(u.atoms.bonds.to_indices(),
                                      [[0, 1]])

    def test_subgroup_bonds_and_com(self, tmp_path):
        u = PDBUniverse(PDB)
        grp = u.select_atoms("resname PEG")
        assert len(grp) == 24
        sub = grp.select_atoms("name C1 C2 O1")
        assert len(sub) == 6
        # bonds restricted to the subgroup's atoms
        assert len(sub.bonds.to_indices()) == 4  # 2 per molecule


class TestCommittedGSDFixture:
    """The committed real-data trajectory (``examples/data/dimer_fluid.gsd``)
    drives the trajectory pipeline end to end -- the repo-side analog of the
    reference's committed example data (``examples/CG_tutorial/``,
    ``eds_traj.dcd``) consumed by its examples 06/10."""

    DATA = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "data", "dimer_fluid.gsd")

    def test_fixture_contents(self):
        u = htf.GSDUniverse(self.DATA)
        group = u.select_atoms("all")
        assert len(group) == 64
        assert u.bonds.shape == (32, 2)
        f = htf.GSDFile(self.DATA)
        assert f.nframes == 15
        assert f.chunk_exists(0, "log/particles/force")
        np.testing.assert_allclose(u.dimensions[3:], 90.0)

    def test_iter_and_force_match(self):
        u = htf.GSDUniverse(self.DATA)
        frames = list(htf.iter_from_trajectory(32, u, r_cut=3.0))
        assert len(frames) == 15
        inputs, frame = frames[0]
        assert inputs[1].shape == (64, 4)
        assert frame.forces.shape == (64, 3)
        # molecules recoverable from the file's bond topology
        class _Top:
            bonds = htf.GSDUniverse(self.DATA).bonds
            particles = range(64)
        mols = htf.find_molecules(_Top())
        assert len(mols) == 32
        assert all(len(m) == 2 for m in mols)

    def test_bonds_roundtrip(self, tmp_path):
        pos = np.random.RandomState(0).rand(6, 3).astype(np.float32)
        path = str(tmp_path / "b.gsd")
        write_gsd_frames(path, [{"positions": pos}], box=[3, 3, 3],
                         bonds=[[0, 1], [2, 3], [4, 5]])
        u = htf.GSDUniverse(path)
        np.testing.assert_array_equal(u.bonds, [[0, 1], [2, 3], [4, 5]])
