"""CG graph analysis: DSGPM-JSON mappings to bonds/angles/dihedrals.

Functional parity with the reference graph stack (``utils.py:340-624``).
networkx is used for shortest-path analysis, as upstream.
"""

import json

import numpy as np

__all__ = ["find_cgnode_id", "compute_adj_mat", "compute_cg_graph",
           "mol_features_multiple"]


def find_cgnode_id(atm_id, cg):
    """CG bead index containing atom ``atm_id`` in a DSGPM ``cgnodes``
    list-of-lists (reference parity: ``utils.py:340-354``)."""
    for bead_idx, members in enumerate(cg):
        if atm_id in members:
            return bead_idx
    return None


def compute_adj_mat(obj):
    """Adjacency matrix of a DSGPM mapping dict
    (reference parity: ``utils.py:415-434``)."""
    cg = obj["cgnodes"]
    adj = np.zeros((len(cg), len(cg)))
    for edge in obj["edges"]:
        s = find_cgnode_id(int(edge["source"]), cg)
        t = find_cgnode_id(int(edge["target"]), cg)
        if s != t:
            adj[s, t] = adj[t, s] = 1
    return adj


def compute_cg_graph(DSGPM=True, infile=None, adj_mat=None, cg_beads=None,
                     group_atoms=False, u_no_H=None, u_H=None):
    """Indices of bonded/angle/dihedral CG bead tuples from a CG mapping.

    Reference parity (``utils.py:437-582``): bead pairs at graph distance 1
    are bonds, 2 are angles, 3 are dihedrals; the actual index tuples are the
    shortest paths between those pairs. With ``group_atoms=True`` also
    returns CG coordinates computed as centers of mass (requires two
    MDAnalysis universes, with and without hydrogens).

    :return: ``(bond_idx [B,2], angle_idx [A,3], dihedral_idx [D,4])`` and,
        if ``group_atoms``, also ``cg_positions [M,3]``.
    """
    import networkx as nx

    if DSGPM and infile is not None:
        with open(infile) as f:
            obj = json.load(f)
        cg = obj["cgnodes"]
        cg_num = len(cg)
        adj = compute_adj_mat(obj)
    elif not DSGPM and adj_mat is not None:
        adj = adj_mat
        cg_num = cg_beads
        cg = None
    else:
        print("correct inputs/flags are not given")
        return None

    graph = nx.Graph(adj)
    lengths = dict(nx.all_pairs_shortest_path_length(graph))
    pairs_by_dist = {1: set(), 2: set(), 3: set()}
    for i in lengths:
        for j, d in lengths[i].items():
            if d in pairs_by_dist:
                pairs_by_dist[d].add(tuple(sorted((i, j))))

    def paths(pairs):
        out = []
        for a, b in sorted(pairs):
            out.extend(nx.all_shortest_paths(graph, source=a, target=b))
        return np.asarray(out)

    rs = paths(pairs_by_dist[1])
    angs = paths(pairs_by_dist[2])
    dihs = paths(pairs_by_dist[3])

    if group_atoms:
        if u_no_H is None or u_H is None:
            print("One or both MDAnalysis universe not specified")
            return rs, angs, dihs
        cg_positions = []
        for members in cg:
            group = None
            for atm_id in members:
                atom = u_no_H.atoms[atm_id]
                name, resid = str(atom.name), str(atom.resid)
                heavy = u_H.select_atoms(
                    f"name {name} and resid {resid}")
                hydro = u_H.select_atoms(
                    f"type H and bonded name {name} and resid {resid}")
                sel = heavy + hydro if len(list(hydro)) else heavy
                group = sel if group is None else group + sel
            cg_positions.append(group.center_of_mass())
        return rs, angs, dihs, np.asarray(cg_positions)

    print("CG coordinates are not calculated. "
          "Only connectivities are calculated")
    return rs, angs, dihs


def mol_features_multiple(bnd_indices=None, ang_indices=None,
                          dih_indices=None, molecules=None, beads=None):
    """Tile per-molecule feature index tuples across ``molecules`` copies
    (reference parity: ``utils.py:585-624``).

    :return: ``(bond_ids [?,2], angle_ids [?,3], dihedral_ids [?,4])``.
    """
    def tile(indices, width):
        if indices is None:
            return np.zeros((0, width), dtype=np.int64)
        offs = np.arange(molecules)[:, None, None] * beads
        return (np.asarray(indices)[None] + offs).reshape(-1, width)

    return tile(bnd_indices, 2), tile(ang_indices, 3), tile(dih_indices, 4)
