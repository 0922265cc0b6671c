"""Molecules CG mapping from real files: PDB topology + DSGPM mapping
JSON -> mapping operators, CG connectivity (bonds/angles/dihedrals) and
internal-coordinate features (parity with reference example 07
'Molecules CG Mapping', which runs on a PDB + DSGPM json via MDAnalysis;
here the native readers do it with zero optional dependencies).

Uses the committed test fixtures: two PEG-like 12-atom chains with a
4-bead DSGPM mapping.

Run: python examples/07_cg_mapping_from_files.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

import hoomd_tf_tpu as htf
from hoomd_tf_tpu.utils.pdb_io import PDBUniverse

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "fixtures")


class FirstMolecule:
    """matrix_mapping consumes an MDAnalysis-style molecule (names +
    masses); adapt one chain of the universe."""

    def __init__(self, u, n):
        self.names = list(u.atoms.names[:n])
        self.masses = list(u.atoms.masses[:n])
        self.n_atoms = n

    def __len__(self):
        return self.n_atoms


def main():
    pdb = os.path.join(FIXTURES, "peg2.pdb")
    cgmap = os.path.join(FIXTURES, "peg2_cgmap.json")

    # 1. topology from the PDB (names, elements->masses, CONECT bonds)
    u = PDBUniverse(pdb)
    print(f"{len(u.atoms)} atoms, {len(u.atoms.bonds.to_indices())} bonds,"
          f" {u.n_frames} frames")

    # 2. molecules from the topology
    chain = ["C1", "C2", "O1", "C3", "C4", "O2",
             "C5", "C6", "O3", "C7", "C8", "O4"]
    mols = htf.find_molecules_from_topology(u, [chain])
    print(f"found {len(mols)} molecules of {len(mols[0])} atoms")

    # 3. mass-weighted per-molecule mapping + system sparse operator
    names = list(u.atoms.names[:12])
    beads = [names[0:3], names[3:6], names[6:9], names[9:12]]
    mol_map = htf.matrix_mapping(FirstMolecule(u, 12), beads)
    print("per-molecule mapping matrix (4 beads x 12 atoms):")
    print(np.round(mol_map, 3))
    sparse = htf.sparse_mapping([mol_map] * len(mols), mols)
    print(f"system mapping operator: {sparse.shape}")

    # 4. CG connectivity from the DSGPM mapping file
    bonds, angles, dihedrals = htf.compute_cg_graph(DSGPM=True,
                                                    infile=cgmap)
    print(f"CG graph: {len(bonds)} bonds, {len(angles)} angles, "
          f"{len(dihedrals)} dihedrals per molecule")
    b_ids, a_ids, d_ids = htf.mol_features_multiple(
        bnd_indices=bonds, ang_indices=angles, dih_indices=dihedrals,
        molecules=len(mols), beads=len(beads))

    # 5. CG coordinates + internal-coordinate features per frame
    box = htf.box_from_lengths(u.dimensions[:3])
    M = np.asarray(sparse.todense())
    for ts in u.trajectory:
        cg_pos = M @ u.atoms.positions
        rs = htf.mol_bond_distance(CG=True,
                                   cg_positions=jnp.asarray(cg_pos),
                                   b1=b_ids[:, 0], b2=b_ids[:, 1],
                                   box=box)
        angs = htf.mol_angle(CG=True, cg_positions=jnp.asarray(cg_pos),
                             b1=a_ids[:, 0], b2=a_ids[:, 1],
                             b3=a_ids[:, 2], box=box)
        dihs = htf.mol_dihedral(CG=True,
                                cg_positions=jnp.asarray(cg_pos),
                                b1=d_ids[:, 0], b2=d_ids[:, 1],
                                b3=d_ids[:, 2], b4=d_ids[:, 3], box=box)
        print(f"frame: mean CG bond {float(jnp.mean(rs)):.3f}  "
              f"mean angle {float(jnp.mean(angs)):.3f} rad  "
              f"mean dihedral {float(jnp.mean(dihs)):.3f} rad")
        assert 2.0 < float(jnp.mean(rs)) < 6.0
        assert np.all(np.isfinite(np.asarray(dihs)))


if __name__ == "__main__":
    main()
