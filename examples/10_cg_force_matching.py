"""End-to-end coarse-grained force matching from a mapped trajectory
(parity with reference examples 06/10, BASELINE config[3]):

1. run an all-atom LJ "dimer" fluid and record positions + forces,
2. map atoms -> CG beads (PBC center of mass) and project forces onto
   beads with the mapping operator,
3. train a CG pair potential on the mapped data.

Everything runs with zero optional dependencies (with MDAnalysis
installed, step 1 can read a GROMACS trajectory instead).

Run: python examples/10_cg_force_matching.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

import hoomd_tf_tpu as htf


class _Observer(htf.SimModel):
    def compute(self, nlist):
        return jnp.zeros(())


def generate_aa_trajectory(n_mol=32, frames=15, r_cut=3.0):
    """All-atom fluid of bonded dimers: LJ between all atoms + a stiff
    harmonic bond inside each molecule (modeled as a pair force here)."""
    n = 2 * n_mol
    sim = htf.Simulation(dt=0.002, integrator=htf.md.NVT(kT=1.0, tau=0.5),
                         seed=5)
    sim.init_lattice(n, density=0.25, kT_init=1.0)
    sim.bonds = [[2 * i, 2 * i + 1] for i in range(n_mol)]
    sim.add_force(htf.md.LennardJones(r_cut=r_cut))
    obs = htf.tfcompute(_Observer(0, output_forces=False))
    obs.attach(sim, r_cut=0)
    data = []
    for _ in range(frames):
        sim.run(20)
        data.append((np.asarray(sim.state.positions),
                     np.asarray(sim.state.forces)[:, :3]))
    return sim, data


def main():
    n_mol = 32
    r_cut = 3.0
    sim, data = generate_aa_trajectory(n_mol=n_mol, frames=15, r_cut=r_cut)
    box_l = np.asarray(htf.box_size(sim.state.box))

    # CG mapping: one bead per dimer, equal weights
    mol_indices = htf.find_molecules(sim)
    assert len(mol_indices) == n_mol
    mol_map = np.full((1, 2), 0.5)
    mapping = htf.sparse_mapping([mol_map] * n_mol, mol_indices,
                                 system=sim)

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
            nlist = htf.compute_nlist(cg_pos4, r_cut, NN, box_l,
                                      sorted=True, return_types=True)
            loss = model.train_on_batch(
                [nlist, cg_pos4, box], cg_forces)
            losses.append(float(loss))
        print(f"epoch {epoch}  loss={np.mean(losses):.4f}  "
              f"eps={float(model.eps.value):.3f}  "
              f"sig={float(model.sig.value):.3f}")

    print("trained CG pair potential from the mapped trajectory")
    assert np.all(np.isfinite(losses))
    assert float(model.eps.value) > 0


if __name__ == "__main__":
    main()
