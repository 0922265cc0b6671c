"""Internal-coordinate features on molecule-batched or CG positions.

Functional parity with the reference (``utils.py:789-1037``): bond
distances, angles and dihedrals, PBC-wrapped, on either ``[M, MN, 4]``
molecule-batched positions (``MolSimModel`` views) or flat CG coordinates
indexed by bead lists from :func:`..utils.graph.compute_cg_graph`.
"""

import jax.numpy as jnp

from ..ops.box import wrap_vector

__all__ = ["mol_bond_distance", "mol_angle", "mol_dihedral"]


def _take(cg_positions, idx):
    return jnp.asarray(cg_positions)[jnp.asarray(idx)][..., :3]


def mol_bond_distance(mol_positions=None, type_i=None, type_j=None,
                      CG=False, cg_positions=None, b1=None, b2=None,
                      box=None):
    """Bond distance between two atom slots batched by molecule, or between
    CG bead index sets (``CG=True``).

    :param mol_positions: ``[M, MN, 4]`` molecule-batched positions.
    :param type_i: first atom slot (column in the molecule view).
    :param type_j: second atom slot.
    :param CG: use flat CG positions with index lists ``b1``/``b2``.
    :param cg_positions: ``[B, 3+]`` CG coordinates.
    :param b1, b2: bead index lists.
    :param box: ``[3,3]`` box for minimum-image wrapping.
    """
    if not CG:
        if mol_positions is None:
            raise ValueError("mol_positions not found. Call build_mol_rep()")
        v_ij = mol_positions[:, type_j, :3] - mol_positions[:, type_i, :3]
        return jnp.linalg.norm(wrap_vector(v_ij, box), axis=-1)
    if cg_positions is None:
        raise ValueError("cg_positions not found")
    u_ij = _take(cg_positions, b2) - _take(cg_positions, b1)
    return jnp.linalg.norm(wrap_vector(u_ij, box), axis=-1)


def mol_angle(mol_positions=None, type_i=None, type_j=None, type_k=None,
              CG=False, cg_positions=None, b1=None, b2=None, b3=None,
              box=None):
    """Angle (radians) formed by three atom slots batched by molecule, or by
    CG bead index sets (``CG=True``). Vertex is the middle slot."""
    if not CG:
        if mol_positions is None:
            raise ValueError("mol_positions not found. Call build_mol_rep()")
        v_ij = mol_positions[:, type_i, :3] - mol_positions[:, type_j, :3]
        v_jk = mol_positions[:, type_k, :3] - mol_positions[:, type_j, :3]
    else:
        if cg_positions is None:
            raise ValueError("cg_positions not found.")
        v_ij = _take(cg_positions, b2) - _take(cg_positions, b1)
        v_jk = _take(cg_positions, b3) - _take(cg_positions, b2)
    v_ij = wrap_vector(v_ij, box)
    v_jk = wrap_vector(v_jk, box)
    cos_a = jnp.sum(v_ij * v_jk, axis=-1) / (
        jnp.linalg.norm(v_ij, axis=-1) * jnp.linalg.norm(v_jk, axis=-1))
    return jnp.arccos(jnp.clip(cos_a, -1.0, 1.0))


def mol_dihedral(mol_positions=None, type_i=None, type_j=None, type_k=None,
                 type_l=None, CG=False, cg_positions=None, b1=None, b2=None,
                 b3=None, b4=None, box=None):
    """Dihedral angle (radians) of four atom slots batched by molecule, or
    of CG bead index sets (``CG=True``)."""
    if not CG:
        if mol_positions is None:
            raise ValueError("mol_positions not found. Call build_mol_rep()")
        p1 = mol_positions[:, type_i, :3]
        p2 = mol_positions[:, type_j, :3]
        p3 = mol_positions[:, type_k, :3]
        p4 = mol_positions[:, type_l, :3]
    else:
        if cg_positions is None:
            raise ValueError("cg_positions not found.")
        p1, p2, p3, p4 = (_take(cg_positions, b)
                          for b in (b1, b2, b3, b4))
    v_ij = wrap_vector(p2 - p1, box)
    v_jk = wrap_vector(p3 - p2, box)
    v_kl = wrap_vector(p4 - p3, box)
    n1 = jnp.cross(v_ij, v_jk)
    n2 = jnp.cross(v_jk, v_kl)
    n1 = n1 / jnp.linalg.norm(n1, axis=-1, keepdims=True)
    n2 = n2 / jnp.linalg.norm(n2, axis=-1, keepdims=True)
    cos_d = jnp.sum(n1 * n2, axis=-1)
    return jnp.arccos(jnp.clip(cos_d, -1.0, 1.0))
