"""Core ops: box math, neighbor lists, NaN-safe numerics, forces, RDF."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hoomd_tf_tpu as htf


def np_min_image(r, box_lengths):
    return r - np.round(r / box_lengths) * box_lengths


def brute_force_neighbors(positions, box_lengths, r_cut):
    """All (i, j, disp) neighbor pairs within r_cut, python reference."""
    n = len(positions)
    out = [[] for _ in range(n)]
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            disp = np_min_image(positions[j] - positions[i], box_lengths)
            r = np.linalg.norm(disp)
            if 5e-4 <= r <= r_cut:
                out[i].append((j, disp, r))
    return out


class TestBox:
    def test_box_size(self):
        box = htf.make_box([-2, -3, -4], [2, 3, 4])
        np.testing.assert_allclose(htf.box_size(box), [4, 6, 8])

    def test_wrap_vector(self):
        box = htf.box_from_lengths([10.0, 10.0, 10.0])
        r = jnp.asarray([6.0, -7.0, 2.0])
        np.testing.assert_allclose(
            htf.wrap_vector(r, box), [-4.0, 3.0, 2.0], atol=1e-6)

    def test_wrap_batched(self):
        box = htf.box_from_lengths([5.0, 5.0, 5.0])
        r = jnp.asarray([[3.0, 0.0, 0.0], [0.0, -3.0, 0.0]])
        w = htf.wrap_vector(r, box)
        np.testing.assert_allclose(w, [[-2, 0, 0], [0, 2, 0]], atol=1e-6)


class TestNumerics:
    def test_divide_no_nan(self):
        x = jnp.asarray([1.0, 2.0, 3.0])
        y = jnp.asarray([2.0, 0.0, 1.0])
        np.testing.assert_allclose(
            htf.divide_no_nan(x, y), [0.5, 0.0, 3.0])

    def test_divide_no_nan_grad_is_finite(self):
        def f(y):
            return jnp.sum(htf.divide_no_nan(1.0, y))
        g = jax.grad(f)(jnp.asarray([0.0, 2.0]))
        assert np.all(np.isfinite(g))

    def test_nlist_rinv_zero_rows(self):
        nlist = np.zeros((2, 4, 4), dtype=np.float32)
        nlist[0, 0, :3] = [2.0, 0, 0]
        rinv = htf.nlist_rinv(jnp.asarray(nlist))
        assert rinv.shape == (2, 4)
        np.testing.assert_allclose(rinv[0, 0], 0.5, rtol=1e-4)
        np.testing.assert_allclose(rinv[0, 1:], 0.0)
        np.testing.assert_allclose(rinv[1], 0.0)

    def test_nlist_rinv_grad_no_nan(self):
        """Padded zero rows must have exactly zero gradient (the 'dark
        magic' requirement, reference simmodel.py:618-635)."""
        nlist = np.zeros((1, 2, 4), dtype=np.float32)
        nlist[0, 0, :3] = [1.5, 0.5, 0]

        def energy(nl):
            return jnp.sum(htf.nlist_rinv(nl) ** 2)

        g = jax.grad(energy)(jnp.asarray(nlist))
        assert np.all(np.isfinite(np.asarray(g)))
        np.testing.assert_allclose(np.asarray(g)[0, 1], 0.0)

    def test_safe_norm(self):
        x = jnp.zeros((3,))
        assert float(htf.safe_norm(x)) < 1e-5
        g = jax.grad(lambda v: htf.safe_norm(v))(x)
        assert np.all(np.isfinite(g))

    def test_masked_nlist(self):
        nlist = np.random.rand(4, 3, 4).astype(np.float32) + 1
        nlist[:, :, 3] = np.array([0, 1, 1])
        types = jnp.asarray([0.0, 0, 1, 1])
        m = htf.masked_nlist(jnp.asarray(nlist), types, type_i=0)
        np.testing.assert_allclose(np.asarray(m)[2:], 0.0)
        assert np.all(np.asarray(m)[:2, :, :3] > 0)
        m2 = htf.masked_nlist(jnp.asarray(nlist), types, type_j=1)
        np.testing.assert_allclose(np.asarray(m2)[:, 0], 0.0)
        assert np.all(np.asarray(m2)[:, 1:, :3] > 0)


class TestComputeNlist:
    def setup_method(self, _):
        rng = np.random.RandomState(0)
        self.n = 24
        self.box = np.array([8.0, 8.0, 8.0])
        self.pos = (rng.rand(self.n, 3) * self.box - self.box / 2).astype(
            np.float32)

    def test_matches_brute_force(self):
        r_cut = 3.0
        NN = 16
        nlist = np.asarray(htf.compute_nlist(
            jnp.asarray(self.pos), r_cut, NN, self.box, sorted=True))
        ref = brute_force_neighbors(self.pos, self.box, r_cut)
        for i in range(self.n):
            got = {int(nlist[i, k, 3]) for k in range(NN)
                   if np.any(nlist[i, k, :3] != 0)}
            want = {j for j, _, _ in ref[i]}
            assert got == want, f"particle {i}"

    def test_displacement_values(self):
        r_cut = 3.0
        NN = 16
        nlist = np.asarray(htf.compute_nlist(
            jnp.asarray(self.pos), r_cut, NN, self.box, sorted=True))
        ref = brute_force_neighbors(self.pos, self.box, r_cut)
        for i in range(self.n):
            for k in range(NN):
                if not np.any(nlist[i, k, :3] != 0):
                    continue
                j = int(nlist[i, k, 3])
                disp = dict((jj, d) for jj, d, _ in ref[i])[j]
                np.testing.assert_allclose(nlist[i, k, :3], disp, atol=1e-5)

    def test_sorted_ascending(self):
        nlist = np.asarray(htf.compute_nlist(
            jnp.asarray(self.pos), 4.0, 8, self.box, sorted=True))
        for i in range(self.n):
            rs = np.linalg.norm(nlist[i, :, :3], axis=-1)
            rs = rs[rs > 0]
            assert np.all(np.diff(rs) >= -1e-6)

    def test_return_types(self):
        types = np.arange(self.n) % 3
        pos4 = np.concatenate([self.pos, types[:, None]], axis=1)
        nlist = np.asarray(htf.compute_nlist(
            jnp.asarray(pos4.astype(np.float32)), 3.0, 16, self.box,
            sorted=True, return_types=True))
        idx_nlist = np.asarray(htf.compute_nlist(
            jnp.asarray(pos4.astype(np.float32)), 3.0, 16, self.box,
            sorted=True))
        for i in range(self.n):
            for k in range(16):
                if np.any(nlist[i, k, :3] != 0):
                    j = int(idx_nlist[i, k, 3])
                    assert int(nlist[i, k, 3]) == types[j]

    def test_exclusion_matrix(self):
        excl = np.zeros((self.n, self.n), dtype=bool)
        excl[0, :] = True  # exclude all pairs involving particle 0
        nlist = np.asarray(htf.compute_nlist(
            jnp.asarray(self.pos), 3.0, 16, self.box, sorted=True,
            exclusion_matrix=jnp.asarray(excl)))
        np.testing.assert_allclose(nlist[0], 0.0)
        # particle 0 must not appear as a neighbor of others
        for i in range(1, self.n):
            present = {int(nlist[i, k, 3]) for k in range(16)
                       if np.any(nlist[i, k, :3] != 0)}
            assert 0 not in present

    def test_overflow_keeps_nn(self):
        nlist = np.asarray(htf.compute_nlist(
            jnp.asarray(self.pos), 6.0, 4, self.box, sorted=True))
        # with sorted=True the nearest 4 are kept
        ref = brute_force_neighbors(self.pos, self.box, 6.0)
        for i in range(self.n):
            dists = sorted(r for _, _, r in ref[i])[:4]
            got = sorted(np.linalg.norm(nlist[i, :, :3], axis=-1))
            np.testing.assert_allclose(got, dists, atol=1e-5)


class TestForces:
    def test_positions_forces_callable(self):
        pos = jnp.asarray(np.random.RandomState(1).rand(8, 4).astype(
            np.float32))

        def energy_fn(p):
            return jnp.sum(p[:, :3] ** 2)

        f = htf.compute_positions_forces(pos, energy_fn)
        assert f.shape == (8, 4)
        np.testing.assert_allclose(f[:, :3], -2 * pos[:, :3], rtol=1e-5)
        np.testing.assert_allclose(f[:, 3], float(energy_fn(pos)), rtol=1e-5)

    def test_nlist_forces_callable_lj(self):
        """Force from compute_nlist_forces matches the analytic LJ force."""
        r0 = 1.3
        nlist = np.zeros((2, 4, 4), dtype=np.float32)
        nlist[0, 0, 0] = r0
        nlist[1, 0, 0] = -r0

        def energy_fn(nl):
            rinv = htf.nlist_rinv(nl)
            inv_r6 = rinv ** 6
            return jnp.sum(4.0 / 2.0 * (inv_r6 ** 2 - inv_r6), axis=1)

        f = htf.compute_nlist_forces(jnp.asarray(nlist), energy_fn)
        # analytic: F_x on particle 0 = -dU/dr * (r̂ pointing from 1 to 0)
        f_analytic = 24 * (2 * r0 ** -13 - r0 ** -7)
        np.testing.assert_allclose(f[0, 0], -f_analytic, rtol=1e-4)
        np.testing.assert_allclose(f[1, 0], f_analytic, rtol=1e-4)
        np.testing.assert_allclose(f[0, :3], -np.asarray(f[1, :3]),
                                   rtol=1e-4, atol=1e-5)

    def test_nlist_forces_virial_shape_and_sign(self):
        # repulsive-only pair => positive virial trace (pressure > 0)
        r0 = 0.9
        nlist = np.zeros((2, 4, 4), dtype=np.float32)
        nlist[0, 0, 0] = r0
        nlist[1, 0, 0] = -r0

        def energy_fn(nl):
            rinv = htf.nlist_rinv(nl)
            return jnp.sum((rinv ** 12) / 2.0, axis=1)

        f, v = htf.compute_nlist_forces(jnp.asarray(nlist), energy_fn,
                                        virial=True)
        assert v.shape == (2, 3, 3)
        assert float(jnp.sum(jnp.trace(v, axis1=-2, axis2=-1))) > 0

    def test_value_energy_outside_model_raises(self):
        nlist = jnp.zeros((2, 4, 4))
        with pytest.raises(ValueError):
            htf.compute_nlist_forces(nlist, jnp.asarray(1.0))


class TestRDF:
    def test_uniform_pair_counts(self):
        # two particles at fixed distance -> single occupied bin
        nlist = np.zeros((2, 4, 4), dtype=np.float32)
        nlist[0, 0, 0] = 2.5
        nlist[1, 0, 0] = -2.5
        rdf, rs = htf.compute_rdf(jnp.asarray(nlist), [0, 5], nbins=10)
        rdf = np.asarray(rdf)
        assert rs.shape == (10,)
        occupied = np.nonzero(rdf)[0]
        assert len(occupied) == 1
        assert abs(float(rs[occupied[0]]) - 2.5) < 0.5

    def test_padding_excluded(self):
        nlist = np.zeros((4, 8, 4), dtype=np.float32)
        rdf, _ = htf.compute_rdf(jnp.asarray(nlist), [0, 5], nbins=10)
        np.testing.assert_allclose(np.asarray(rdf), 0.0)

    def test_type_filtering(self):
        nlist = np.zeros((2, 4, 4), dtype=np.float32)
        nlist[0, 0, :] = [2.5, 0, 0, 1]   # neighbor of type 1
        nlist[1, 0, :] = [-2.5, 0, 0, 0]  # neighbor of type 0
        types = jnp.asarray([0.0, 1.0])
        rdf_ab, _ = htf.compute_rdf(jnp.asarray(nlist), [0, 5], types,
                                    type_i=0, type_j=1)
        rdf_aa, _ = htf.compute_rdf(jnp.asarray(nlist), [0, 5], types,
                                    type_i=0, type_j=0)
        assert np.asarray(rdf_ab).sum() > 0
        np.testing.assert_allclose(np.asarray(rdf_aa), 0.0)
