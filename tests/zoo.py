"""Model zoo for tests, mirroring the reference's fixture models
(``test-py/build_examples.py``) so the test suites stay terse and parity is
easy to audit."""

import jax.numpy as jnp

import hoomd_tf_tpu as htf


class SimplePotential(htf.SimModel):
    def compute(self, nlist, positions):
        nlist = nlist[:, :, :3]
        rs = jnp.linalg.norm(nlist, axis=2, keepdims=True)
        fr = htf.divide_no_nan(-1.0 * nlist, rs)
        return jnp.sum(fr, axis=1)


class BenchmarkPotential(htf.SimModel):
    def compute(self, nlist):
        rinv = htf.nlist_rinv(nlist)
        energy = rinv
        return htf.compute_nlist_forces(nlist, energy)


class NoForceModel(htf.SimModel):
    def compute(self, nlist, positions):
        rs = jnp.linalg.norm(nlist[:, :, :3], axis=2)
        energy = htf.divide_no_nan(jnp.ones_like(rs), rs)
        pos_norm = jnp.linalg.norm(positions, axis=1)
        return energy, pos_norm


class TensorSaveModel(htf.SimModel):
    def compute(self, nlist, positions):
        return jnp.linalg.norm(positions, axis=1)


class WrapModel(htf.SimModel):
    def compute(self, nlist, positions, box):
        p1 = positions[0, :3]
        p2 = positions[-1, :3]
        return htf.wrap_vector(p1 - p2, box)


class LJModel(htf.SimModel):
    def compute(self, nlist, positions, box):
        rinv = htf.nlist_rinv(nlist)
        inv_r6 = rinv ** 6
        p_energy = 4.0 / 2.0 * (inv_r6 * inv_r6 - inv_r6)
        energy = jnp.sum(p_energy, axis=1)
        return htf.compute_nlist_forces(nlist, energy)


class PairLJ(htf.PairModel):
    """Declared pair potential: rides the analytic cellwise fast path."""

    def pair_energy(self, r2):
        u = 1.0 / r2
        sr6 = u * u * u
        return 4.0 * (sr6 * sr6 - sr6)


class LJVirialModel(htf.SimModel):
    def compute(self, nlist, positions, box):
        rinv = htf.nlist_rinv(nlist)
        inv_r6 = rinv ** 6
        p_energy = 4.0 / 2.0 * (inv_r6 * inv_r6 - inv_r6)
        energy = jnp.sum(p_energy, axis=1)
        return htf.compute_nlist_forces(nlist, energy, virial=True)


class LJTypedModel(htf.SimModel):
    def setup(self):
        self.avg_rdfa = htf.MeanTensor()
        self.avg_rdfb = htf.MeanTensor()

    def compute(self, nlist, positions, box):
        rinv = htf.nlist_rinv(nlist)
        inv_r6 = rinv ** 6
        p_energy = 1e-10 * (inv_r6 * inv_r6 - inv_r6)
        energy = jnp.sum(p_energy, axis=1)
        forces = htf.compute_nlist_forces(nlist, energy)
        rdfa, _ = htf.compute_rdf(nlist, [0, 10], positions[:, 3],
                                  type_i=0, type_j=1)
        rdfb, _ = htf.compute_rdf(nlist, [0, 10], positions[:, 3],
                                  type_i=1, type_j=0)
        self.avg_rdfa.update_state(rdfa)
        self.avg_rdfb.update_state(rdfb)
        return forces


class LJRunningMeanModel(htf.SimModel):
    def setup(self):
        self.avg_energy = htf.Mean()

    def compute(self, nlist, positions, box):
        r = jnp.linalg.norm(nlist[:, :, :3], axis=2)
        inv_r6 = htf.divide_no_nan(1.0, r ** 6)
        p_energy = 4.0 / 2.0 * (inv_r6 * inv_r6 - inv_r6)
        energy = jnp.sum(p_energy, axis=1)
        self.avg_energy.update_state(energy)
        return htf.compute_nlist_forces(nlist, energy)


class LJRDF(htf.SimModel):
    def setup(self):
        self.avg_rdf = htf.MeanTensor()

    def compute(self, nlist, positions, box):
        r = jnp.linalg.norm(nlist[:, :, :3], axis=2)
        inv_r6 = htf.divide_no_nan(1.0, r ** 6)
        p_energy = 4.0 / 2.0 * (inv_r6 * inv_r6 - inv_r6)
        rdf, rs = htf.compute_rdf(nlist, [3, 5], positions[:, 3])
        _, _ = htf.compute_rdf(nlist, [3, 5])
        self.avg_rdf.update_state(rdf)
        return htf.compute_nlist_forces(nlist, p_energy)


class EDSModel(htf.SimModel):
    def setup(self, set_point):
        self.cv_avg = htf.Mean()
        self.eds_bias = htf.EDSLayer(set_point, 5, 1 / 5)

    def compute(self, nlist, positions, box):
        rvec = htf.wrap_vector(positions[0, :3], box)
        cv = jnp.linalg.norm(rvec)
        self.cv_avg.update_state(cv)
        alpha = self.eds_bias(cv)
        energy = (cv - 5) ** 2 + cv * alpha
        forces = htf.compute_positions_forces(positions, energy)
        return forces, alpha


class MolFeatureModel(htf.MolSimModel):
    def mol_compute(self, nlist, positions, mol_nlist, mol_pos, box):
        r = htf.mol_bond_distance(mol_pos, 2, 1, box=box)
        a = htf.mol_angle(mol_pos, 1, 2, 3, box=box)
        d = htf.mol_dihedral(mol_pos, 1, 2, 3, 4, box=box)
        return jnp.mean(r), jnp.mean(a), jnp.mean(d)


class LJMolModel(htf.MolSimModel):
    def mol_compute(self, nlist, positions, mol_nlist, mol_positions, box):
        # nlist_rinv (not a bare norm) so padded rows have zero gradient;
        # the reference zoo's tf.norm-based version NaNs on padded rows and
        # its tests never assert force values -- ours do.
        rinv = htf.nlist_rinv(mol_nlist)
        mol_p_energy = 4.0 / 2.0 * (rinv ** 12 - rinv ** 6)
        total_e = jnp.sum(mol_p_energy)
        return htf.compute_nlist_forces(nlist, total_e)


class CustomNlist(htf.SimModel):
    """Builds its own neighbor list inside compute (reference CustomNlist:
    cross-checks the engine's nlist against compute_nlist in-graph)."""

    def setup(self, r_cut):
        self.r_cut = r_cut

    def compute(self, nlist, positions, box):
        r = jnp.linalg.norm(nlist[:, :, :3], axis=2)
        cnlist = htf.compute_nlist(positions[:, :3], self.r_cut,
                                   self.nneighbor_cutoff, htf.box_size(box))
        cr = jnp.linalg.norm(cnlist[:, :, :3], axis=2)
        return r, cr


class MappedNlist(htf.SimModel):
    @staticmethod
    def my_map(pos, box):
        x = jnp.mean(pos[:, :3], axis=0, keepdims=True)
        cg1 = jnp.concatenate((x, jnp.zeros((1, 1), dtype=x.dtype)), -1)
        cg2 = jnp.asarray([[0, 0, 0.1, 1]], dtype=x.dtype)
        return jnp.concatenate((cg1, cg2), axis=0)

    def compute(self, nlist, positions, box):
        aa_nlist, cnlist = self.mapped_nlist(nlist)
        return positions, aa_nlist, cnlist


class NlistNN(htf.SimModel):
    def setup(self, dim, top_neighs):
        self.dense1 = htf.Dense(dim)
        self.dense2 = htf.Dense(dim)
        self.last = htf.Dense(1)
        self.top_neighs = top_neighs

    def compute(self, nlist, positions, box):
        rinv = htf.nlist_rinv(nlist)
        top_n = jnp.sort(rinv, axis=1)[:, ::-1][:, :self.top_neighs]
        top_n = jnp.reshape(top_n, (-1, self.top_neighs))
        x = self.dense1(top_n)
        x = self.dense2(x)
        energy = self.last(x)
        return htf.compute_nlist_forces(nlist, energy)


class TrainModel(htf.SimModel):
    def setup(self, dim, top_neighs):
        self.dense1 = htf.Dense(dim)
        self.dense2 = htf.Dense(dim)
        self.last = htf.Dense(1)
        self.top_neighs = top_neighs
        self.output_zero = False

    def compute(self, nlist, positions, training):
        rinv = htf.nlist_rinv(nlist)
        top_n = jnp.sort(rinv, axis=1)[:, ::-1][:, :self.top_neighs]
        x = self.dense1(top_n)
        x = self.dense2(x)
        energy = self.last(x)
        if training:
            energy = energy * 2
        forces = htf.compute_nlist_forces(nlist, energy)
        if self.output_zero:
            energy = energy * 0.0
        return forces, jnp.sum(energy)


class WCAModel(htf.SimModel):
    def setup(self):
        self.wca = htf.WCARepulsion(0.5)

    def compute(self, nlist):
        energy = self.wca(nlist)
        return htf.compute_nlist_forces(nlist, energy)


class RBFModel(htf.SimModel):
    def setup(self, low, high, count):
        self.rbf = htf.RBFExpansion(low, high, count)
        self.dense = htf.Dense(1)

    def compute(self, nlist):
        r = htf.safe_norm(nlist[:, :, :3], axis=2)
        rbf = self.rbf(r)
        energy = jnp.sum(self.dense(rbf))
        return htf.compute_nlist_forces(nlist, energy)


class LJLayer(htf.Layer):
    """Trainable LJ as a layer, like the reference's TrainableGraph."""

    def __init__(self, sig, eps):
        super().__init__(name="lj")
        self.start = [sig, eps]
        self.w = self.add_weight(
            (2,), initializer=jnp.asarray([sig, eps]),
            constraint=lambda x: jnp.maximum(x, 0.0),
            trainable=True, name="lj-params")

    def call(self, r):
        r6 = htf.divide_no_nan(self.w.value[1] ** 6, r ** 6)
        energy = self.w.value[0] * 4.0 * (r6 ** 2 - r6)
        return energy / 2.0

    def get_config(self):
        return {"sig": self.start[0], "eps": self.start[1]}


class TrainableGraph(htf.SimModel):
    def setup(self):
        self.lj = LJLayer(1.0, 1.0)

    def compute(self, nlist, positions, box):
        r = htf.safe_norm(nlist[:, :, :3], axis=2)
        p_energy = self.lj(r)
        energy = jnp.sum(p_energy, axis=1)
        return htf.compute_nlist_forces(nlist, energy)
