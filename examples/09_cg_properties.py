"""Computing coarse-grained properties: mapping operators, PBC centers of
mass, CG bond/angle features (parity with reference examples 02/07/09).

Run: python examples/09_cg_properties.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

import hoomd_tf_tpu as htf


class Mol:
    """Minimal MDAnalysis-like atom selection for matrix_mapping."""

    def __init__(self, names, masses):
        self.names = names
        self.masses = masses
        self.n_atoms = len(names)

    def __len__(self):
        return self.n_atoms


def main():
    # three-bead molecules: (O,H,H)(C,C)
    mol = Mol(["O", "H1", "H2", "C1", "C2"],
              [16.0, 1.0, 1.0, 12.0, 12.0])
    mol_map = htf.matrix_mapping(mol, [["O", "H1", "H2"], ["C1", "C2"]])
    print("molecule mapping (mass weighted):")
    print(np.round(mol_map, 3))

    # 8 molecules on a simulation; system-level sparse operator
    n_mol = 8
    sim = htf.Simulation(seed=0)
    sim.init_lattice(n_mol * 5, a=2.0)
    sim.bonds = [[5 * i + a, 5 * i + b] for i in range(n_mol)
                 for a, b in [(0, 1), (0, 2), (0, 3), (3, 4)]]
    mol_indices = htf.find_molecules(sim)
    assert len(mol_indices) == n_mol
    mapping = htf.sparse_mapping([mol_map] * n_mol, mol_indices, system=sim)
    print("system mapping:", mapping.shape)

    # PBC-aware centers of mass of the beads
    box_l = htf.box_size(sim.state.box)
    cg_pos = htf.center_of_mass(sim.state.positions, mapping, box_l)
    print("CG positions:", np.asarray(cg_pos).shape)

    # CG connectivity from an adjacency matrix (DSGPM-style)
    adj = np.zeros((2, 2))
    adj[0, 1] = adj[1, 0] = 1
    bonds, angles, dihedrals = htf.compute_cg_graph(
        DSGPM=False, adj_mat=adj, cg_beads=2)
    b, a, d = htf.mol_features_multiple(
        bnd_indices=bonds, molecules=n_mol, beads=2)
    print("CG bond index pairs (first 4):", b[:4].tolist())

    # bond lengths of the CG beads
    r = htf.mol_bond_distance(CG=True, cg_positions=cg_pos,
                              b1=b[:, 0], b2=b[:, 1],
                              box=sim.state.box)
    print("CG bond lengths:", np.round(np.asarray(r), 3))
    assert np.all(np.isfinite(np.asarray(r)))
    assert np.all(np.asarray(r) > 0)


if __name__ == "__main__":
    main()
