"""Preparing a coarse-grained mapped simulation: CG beads live alongside
the all-atom particles so the engine builds bead-bead neighbor lists
natively (parity with reference example 02).

Run: python examples/02_mapped_cg_simulation.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

import hoomd_tf_tpu as htf


class MappedModel(htf.SimModel):
    @staticmethod
    def com_mapping(pos4, box_lengths):
        """Map 27 atoms into 3 CG beads of 9 atoms (columns: xyz + bead
        type)."""
        groups = pos4[:, :3].reshape(3, 9, 3)
        cg = jnp.mean(groups, axis=1)
        types = jnp.zeros((3, 1), dtype=cg.dtype)
        return jnp.concatenate([cg, types], axis=1)

    def setup(self):
        self.avg_cg_rdf = htf.MeanTensor()

    def compute(self, nlist, positions, box):
        aa_nlist, cg_nlist = self.mapped_nlist(nlist)
        aa_pos, cg_pos = self.mapped_positions(positions)
        # observable on the CG beads only
        rdf, rs = htf.compute_rdf(cg_nlist, [0.5, 6.0], nbins=20)
        self.avg_cg_rdf.update_state(rdf)
        # forces act on the all-atom particles (simple 1/r repulsion)
        rinv = htf.nlist_rinv(aa_nlist)
        energy = jnp.sum(rinv, axis=1)
        return htf.compute_nlist_forces(aa_nlist, energy)


def main():
    n = 27
    model = MappedModel(16)
    sim = htf.Simulation(dt=0.002, integrator=htf.md.NVT(kT=0.8, tau=0.5),
                         seed=3)
    sim.init_lattice(n, a=2.0, kT_init=0.8)
    tfc = htf.tfcompute(model)
    aa_group, cg_group = tfc.enable_mapped_nlist(sim,
                                                 MappedModel.com_mapping)
    print(f"{len(aa_group)} atoms + {len(cg_group)} mapped beads")
    tfc.attach(sim, r_cut=6.0)
    sim.run(200)
    print("CG bead positions (recomputed from the mapping every step):")
    print(np.round(tfc.get_positions_array()[n:], 3))
    rdf_sum = float(np.asarray(model.avg_cg_rdf.result()).sum())
    print("CG-CG rdf mean:", rdf_sum)
    assert np.all(np.isfinite(tfc.get_positions_array()))
    assert rdf_sum > 0.0


if __name__ == "__main__":
    main()
