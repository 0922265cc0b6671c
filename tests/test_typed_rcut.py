"""Per-type-pair r_cut matrix (reference rcut(),
tensorflowcompute.py:284-305): scalar-or-matrix attach, negative entries
exclude pairs, enforced identically on every neighbor-build path, and the
mapped AA<->CG exclusion rides it onto the fast (cell) path."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import hoomd_tf_tpu as htf
from hoomd_tf_tpu.ops.nlist import pair_rc2
import zoo


def two_type_fluid(n=512, density=0.3, seed=0, jitter=0.08):
    sim = htf.Simulation(dt=0.005, integrator=htf.md.NVE(), seed=seed)
    sim.init_lattice(n, density=density, kT_init=0.8)
    rng = np.random.RandomState(seed)
    sim.state = dataclasses.replace(
        sim.state,
        positions=sim.state.positions + jitter * jnp.asarray(
            rng.uniform(-1, 1, (n, 3)).astype(np.float32)),
        types=jnp.asarray(np.arange(n) % 2, dtype=jnp.int32))
    return sim


class LJ(htf.SimModel):
    def compute(self, nlist, positions, box):
        rinv = htf.nlist_rinv(nlist)
        i6 = rinv ** 6
        return htf.compute_nlist_forces(
            nlist, jnp.sum(2.0 * (i6 * i6 - i6), axis=1))


class TestPairRc2:
    def test_values_and_negative(self):
        m = [[2.0, -1.0], [-1.0, 3.0]]
        ti = jnp.asarray([0, 0, 1, 1])
        tj = jnp.asarray([0, 1, 0, 1])
        rc2 = np.asarray(pair_rc2(ti, tj, m, jnp.float32))
        np.testing.assert_allclose(rc2, [4.0, -1.0, -1.0, 9.0])


class TestComputeNlistMatrix:
    def test_negative_excludes_cross_pairs(self):
        sim = two_type_fluid()
        m = np.array([[2.5, -1.0], [-1.0, 2.5]], np.float32)
        nl = htf.compute_nlist(sim.state.positions4, 2.5, 64,
                               htf.box_size(sim.state.box), sorted=True,
                               return_types=True, r_cut_matrix=m)
        nl = np.asarray(nl)
        types = np.asarray(sim.state.types)
        r = np.linalg.norm(nl[:, :, :3], axis=-1)
        # every real neighbor must share the center particle's type parity
        for i in range(nl.shape[0]):
            real = r[i] > 0
            assert np.all(nl[i, real, 3].astype(int) == types[i])

    def test_per_pair_radius(self):
        sim = two_type_fluid()
        m = np.array([[1.2, 2.5], [2.5, 1.2]], np.float32)
        nl = htf.compute_nlist(sim.state.positions4, 2.5, 64,
                               htf.box_size(sim.state.box), sorted=True,
                               return_types=True, r_cut_matrix=m)
        nl = np.asarray(nl)
        types = np.asarray(sim.state.types)
        r = np.linalg.norm(nl[:, :, :3], axis=-1)
        for i in range(nl.shape[0]):
            real = r[i] > 0
            same = nl[i, real, 3].astype(int) == types[i]
            assert np.all(r[i, real][same] <= 1.2 + 1e-5)
            assert np.all(r[i, real][~same] <= 2.5 + 1e-5)


class TestMatrixAcrossPaths:
    """Same typed-cutoff forces from the dense, cell, direct and cellwise
    builds (the per-pair filter must behave identically everywhere)."""

    M = np.array([[1.8, 2.4], [2.4, 1.3]], np.float32)

    def _run(self, nlist_mode, seed=11):
        sim = two_type_fluid(seed=seed)
        tfc = htf.tfcompute(LJ(64))
        tfc.attach(sim, r_cut=self.M, nlist=nlist_mode)
        assert tfc.r_cut == pytest.approx(2.4)
        sim.run(1)
        return np.asarray(sim.state.forces)

    @pytest.mark.slow
    def test_all_paths_match(self):
        ref = self._run("n2")
        for mode in ("cell", "direct", "cellwise"):
            got = self._run(mode)
            np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5,
                                       err_msg=mode)

    def test_scalar_attach_unchanged(self):
        sim = two_type_fluid(seed=12)
        tfc = htf.tfcompute(LJ(64))
        tfc.attach(sim, r_cut=2.4, nlist="n2")
        assert tfc.r_cut_matrix is None


class TestMappedOnFastPath:
    def test_mapped_cell_matches_dense(self):
        """Mapped-CG systems run on the cell-list path with the AA<->CG
        exclusion carried by the synthesized r_cut matrix (round-1 gap:
        want_cell excluded every mapped system)."""
        n = 600  # > 512 so 'auto' picks the cell path
        sim = htf.Simulation(dt=0.0, integrator=htf.md.NVE(), seed=3)
        sim.init_lattice(n, density=0.25, kT_init=0.5)
        rng = np.random.RandomState(3)
        sim.state = dataclasses.replace(
            sim.state, positions=sim.state.positions + 0.08 * jnp.asarray(
                rng.uniform(-1, 1, (n, 3)).astype(np.float32)))

        def mapping(pos4, box):
            # one bead per 3 particles: plain mean + bead type 0
            k = pos4.shape[0] // 3
            com = pos4[:3 * k, :3].reshape(k, 3, 3).mean(axis=1)
            return jnp.concatenate(
                [com, jnp.zeros((k, 1), dtype=pos4.dtype)], axis=1)

        def build(nlist_mode):
            s = htf.Simulation(dt=0.0, integrator=htf.md.NVE(), seed=3)
            s.state = sim.state
            s._post_init()
            model = zoo.MappedNlist(32)
            tfc = htf.tfcompute(model)
            tfc.enable_mapped_nlist(s, mapping)
            tfc.attach(s, r_cut=2.5, nlist=nlist_mode,
                       save_output_period=1)
            s.run(1)
            return s, tfc

        s1, t1 = build("n2")
        s2, t2 = build("cell")
        # the synthesized matrix excludes AA<->CG on both paths
        assert t2.r_cut_matrix is not None
        assert t2.r_cut_matrix[0, 1] < 0
        for o1, o2 in zip(t1.outputs, t2.outputs):
            np.testing.assert_allclose(o2, o1, rtol=2e-4, atol=2e-5)
