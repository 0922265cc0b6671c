"""End-to-end coarse-grained force matching from a REAL trajectory file
(parity with reference examples 06/10, BASELINE config[3]):

1. load the committed GSD trajectory ``examples/data/dimer_fluid.gsd``
   -- a real HOOMD-schema file carrying positions, velocities,
   per-particle forces AND bond topology (regenerate with
   ``examples/data/generate_fixture.py``). With MDAnalysis installed
   (the CI ``mdanalysis`` leg) the same file is read through
   ``MDAnalysis.Universe``; otherwise the package's native
   ``GSDUniverse`` reads it with zero optional dependencies.
2. stream frames with ``iter_from_trajectory`` (the reference's
   trajectory-driven pipeline, ``utils.py:627-749``), map atoms -> CG
   beads (PBC center of mass) and project forces onto beads with the
   mapping operator,
3. train a CG pair potential on the mapped data.

Run: python examples/10_cg_force_matching.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

import hoomd_tf_tpu as htf

DATA = os.path.join(os.path.dirname(__file__), "data", "dimer_fluid.gsd")
R_CUT = 3.0


def load_universe(path):
    """Open the trajectory: MDAnalysis when installed (CI leg), the native
    GSD reader otherwise. Returns ``(universe, bonds [B,2])``."""
    try:
        import MDAnalysis as mda

        u = mda.Universe(path)
        bonds = np.asarray(u.bonds.to_indices(), dtype=np.int64)
        print(f"loaded {path} via MDAnalysis {mda.__version__}")
    except Exception:  # no MDAnalysis (or no mda GSD reader) -> native
        u = htf.GSDUniverse(path)
        bonds = u.bonds
        print(f"loaded {path} via native GSDUniverse")
    return u, bonds


def read_frames(universe, path, nn):
    """Stream ``(mapped inputs, positions, forces)`` per frame through
    ``iter_from_trajectory``. Force labels come from ``frame.forces`` when
    the universe carries them; otherwise (e.g. an MDAnalysis GSD reader
    without force support) they are re-read with the native ``GSDFile``."""
    native = htf.GSDFile(path)
    data = []
    for i, (inputs, frame) in enumerate(
            htf.iter_from_trajectory(nn, universe, r_cut=R_CUT)):
        try:
            forces = np.asarray(frame.forces)
        except (AttributeError, ValueError):
            forces = np.asarray(
                native.read_chunk(i, "log/particles/force"))
        positions = np.asarray(inputs[1])[:, :3]
        data.append((positions, forces))
    return data


def main():
    if not os.path.exists(DATA):  # regenerate the committed fixture
        sys.path.insert(0, os.path.join(os.path.dirname(DATA)))
        import generate_fixture

        generate_fixture.main()

    universe, bonds = load_universe(DATA)
    n_atoms = len(universe.select_atoms("all"))
    box_l = np.asarray(universe.dimensions[:3], dtype=np.float64)
    data = read_frames(universe, DATA, nn=32)
    print(f"{len(data)} frames x {n_atoms} atoms, {len(bonds)} bonds, "
          f"box {box_l.tolist()}")

    # molecules from the file's bond topology (one dimer per bond here)
    class _Topology:
        pass

    top = _Topology()
    top.bonds = bonds
    top.particles = range(n_atoms)
    mol_indices = htf.find_molecules(top)
    n_mol = len(mol_indices)

    # CG mapping: one bead per dimer, equal weights
    mol_map = np.full((1, 2), 0.5)
    mapping = htf.sparse_mapping([mol_map] * n_mol, mol_indices)

    # CG model: trainable LJ between beads
    NN = 16
    model = htf.TrainableLJ(NN, epsilon=0.5, sigma=0.8)
    model.compile(optimizer="adam", loss="mse", learning_rate=2e-2)
    box = htf.box_from_lengths(box_l)

    for epoch in range(8):
        losses = []
        for positions, forces in data:
            cg_pos = htf.center_of_mass(jnp.asarray(positions), mapping,
                                        box_l)
            # force projection onto beads: the mapping operator applied to
            # atomistic forces (the standard CG force-matching target)
            cg_forces = 2.0 * (mapping @ jnp.asarray(forces))  # d(COM)/dx
            cg_pos4 = jnp.concatenate(
                [cg_pos, jnp.zeros((n_mol, 1))], axis=1)
            nlist = htf.compute_nlist(cg_pos4, R_CUT, NN, box_l,
                                      sorted=True, return_types=True)
            loss = model.train_on_batch(
                [nlist, cg_pos4, box], cg_forces)
            losses.append(float(loss))
        print(f"epoch {epoch}  loss={np.mean(losses):.4f}  "
              f"eps={float(model.eps.value):.3f}  "
              f"sig={float(model.sig.value):.3f}")

    print("trained CG pair potential from the real mapped trajectory")
    assert np.all(np.isfinite(losses))
    assert float(model.eps.value) > 0


if __name__ == "__main__":
    main()
