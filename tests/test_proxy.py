"""Chebyshev pair-potential proxy (ops/chebyshev.py,
PairModel(proxy_degree=...)).

Beyond reference scope (the closest reference analog is tabulated
potentials); these tests pin the numerical contract: near-exact for
inverse-power potentials over the fit range, finite repulsive barrier
below it, exact-gradient-of-the-evaluated-function training semantics.
"""

import dataclasses

import pytest
import jax
import jax.numpy as jnp
import numpy as np

import hoomd_tf_tpu as htf
from hoomd_tf_tpu.ops.chebyshev import make_pair_proxy, pair_proxy


def lj_es(r2):
    u = 1.0 / r2
    sr6 = u * u * u
    return 4.0 * (sr6 * sr6 - sr6), -12.0 * (2.0 * sr6 - 1.0) * sr6 * u


class PairLJ(htf.PairModel):
    def pair_energy(self, r2):
        u = 1.0 / r2
        sr6 = u * u * u
        return 4.0 * (sr6 * sr6 - sr6)


class NNPair(htf.PairModel):
    def setup(self):
        self.dense1 = htf.Dense(16)
        self.last = htf.Dense(1)

    def pair_energy(self, r2):
        rinv = jax.lax.rsqrt(r2)
        x = jax.nn.tanh(self.dense1(rinv[..., None]))
        return 2.0 * self.last(x)[..., 0]


class TestProxyNumerics:
    def test_lj_near_exact_in_range(self):
        """LJ is a degree-6 polynomial in 1/r^2: the fit is exact up to
        f32 rounding of the node fit."""
        fn = pair_proxy(lj_es, 16, 0.5625, 9.0)
        r2 = jnp.asarray(np.linspace(0.5625, 9.0, 2001), jnp.float32)
        U, s = fn(r2)
        Ue, se = lj_es(r2)
        np.testing.assert_allclose(np.asarray(U), np.asarray(Ue),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(s), np.asarray(se),
                                   rtol=2e-3, atol=2e-3)

    def test_barrier_finite_and_repulsive(self):
        fn = pair_proxy(lj_es, 16, 0.5625, 9.0)
        r2 = jnp.asarray([1e-4, 0.01, 0.1, 0.5], jnp.float32)
        U, s = fn(r2)
        assert np.all(np.isfinite(np.asarray(U)))
        assert np.all(np.asarray(U) > 0)      # strongly repulsive core
        assert np.all(np.asarray(s) < 0)      # force pushes apart
        # stiffening: |dU/dr2| grows monotonically inward (r2 ascending)
        assert np.all(np.diff(np.asarray(s)) > 0)

    def test_gradients_flow_through_fit(self):
        fit, ev = make_pair_proxy(12, 0.5625, 9.0)

        def loss(eps):
            def es(r2):
                U, s = lj_es(r2)
                return eps * U, eps * s
            c = fit(es)
            U, s = ev(c, jnp.asarray([1.2, 2.0], jnp.float32))
            return jnp.sum(s)

        g = jax.grad(loss)(jnp.asarray(1.0))
        fd = (loss(jnp.asarray(1.0 + 1e-2)) -
              loss(jnp.asarray(1.0 - 1e-2))) / 2e-2
        np.testing.assert_allclose(float(g), float(fd), rtol=1e-2)

    def test_typed_proxy_needs_proxy_types(self):
        class Typed(htf.PairModel):
            def pair_energy(self, r2, type_i, type_j):
                return 1.0 / r2

        with pytest.raises(ValueError, match="proxy_types"):
            Typed(16, proxy_degree=16)

    def test_typed_proxy_matches_exact(self):
        """Per-type-pair coefficient tables: the typed proxy reproduces
        a typed LJ (epsilon by type pair) to node-fit rounding."""
        from hoomd_tf_tpu.ops.chebyshev import make_typed_pair_proxy

        def typed_es(r2, ti, tj):
            eps = jnp.where((ti == 0) & (tj == 0), 1.0,
                            jnp.where((ti == 1) & (tj == 1), 0.5, 0.75))
            U, s = lj_es(r2)
            return eps * U, eps * s

        fit, ev = make_typed_pair_proxy(16, 0.5625, 9.0, 2)
        coeffs = fit(typed_es)
        rng = np.random.RandomState(0)
        r2 = jnp.asarray(
            rng.uniform(0.5625, 9.0, (64, 32)).astype(np.float32))
        ti = jnp.asarray(rng.randint(0, 2, (64, 1)).astype(np.float32))
        tj = jnp.asarray(rng.randint(0, 2, (64, 32)).astype(np.float32))
        U, s = ev(coeffs, r2, ti, tj)
        Ue, se = typed_es(r2, ti, tj)
        np.testing.assert_allclose(np.asarray(U), np.asarray(Ue),
                                   rtol=3e-3, atol=3e-3)
        np.testing.assert_allclose(np.asarray(s), np.asarray(se),
                                   rtol=3e-3, atol=3e-3)


def _fluid(model, n=512, seed=0, train=False, lr=1e-2):
    sim = htf.Simulation(dt=0.005,
                         integrator=htf.md.NVT(kT=1.0, tau=0.5),
                         seed=seed)
    sim.init_lattice(n, density=0.4, kT_init=1.0)
    rng = np.random.RandomState(seed)
    sim.state = dataclasses.replace(
        sim.state, positions=sim.state.positions + 0.08 * jnp.asarray(
            rng.uniform(-1, 1, (n, 3)).astype(np.float32)))
    tfc = htf.tfcompute(model)
    if train:
        sim.add_force(htf.md.LennardJones(r_cut=2.5))
        loss = lambda yt, yp: jnp.mean((yt[:, :3] - yp[:, :3]) ** 2)
        model.compile(optimizer="adam", loss=loss, learning_rate=lr)
        tfc.attach(sim, r_cut=2.5, nlist="cellwise", train=True)
    else:
        tfc.attach(sim, r_cut=2.5, nlist="cellwise")
    return sim, tfc


class TestProxyInSimulation:
    @pytest.mark.slow
    def test_eval_trajectory_matches_exact(self):
        s1, _ = _fluid(PairLJ(48))
        s2, _ = _fluid(PairLJ(48, proxy_degree=16))
        s1._choose_repack_interval = lambda layout: 3
        s2._choose_repack_interval = lambda layout: 3
        s1.run(10)
        s2.run(10)
        L = np.asarray(htf.box_size(s1.state.box))
        d = (np.asarray(s1.state.positions) -
             np.asarray(s2.state.positions))
        d = d - np.round(d / L) * L
        assert np.abs(d).max() < 2e-3

    @pytest.mark.slow
    def test_online_training_converges(self):
        """An NN pair potential with the proxy learns LJ labels online
        (the north-star protocol at smoke scale: equilibrate the
        supercritical fluid FIRST, then train -- training during a
        coexistence-region melt chases growing label forces and the
        loss rises for proxy and exact alike)."""
        sim = htf.Simulation(dt=0.005,
                             integrator=htf.md.NVT(kT=1.5, tau=0.5),
                             seed=0)
        sim.init_lattice(512, density=0.4, kT_init=1.5)
        sim.add_force(htf.md.LennardJones(r_cut=2.5))
        sim.run(200)
        m = NNPair(48, output_forces=False, proxy_degree=16)
        loss = lambda yt, yp: jnp.mean((yt[:, :3] - yp[:, :3]) ** 2)
        m.compile(optimizer="adam", loss=loss, learning_rate=1e-2)
        tfc = htf.tfcompute(m)
        tfc.attach(sim, r_cut=2.5, nlist="cellwise", train=True)
        sim.run(300)
        lh = tfc.loss_history
        assert lh[-1] < lh[0] * 0.3, (lh[0], lh[-1])

    def test_proxy_serialization_roundtrip(self):
        m = PairLJ(32, proxy_degree=12, proxy_r_lo=0.8)
        cfg = m.get_config()
        assert cfg["proxy_degree"] == 12 and cfg["proxy_r_lo"] == 0.8
        m2 = PairLJ.from_config(cfg)
        assert m2.proxy_degree == 12 and m2.proxy_r_lo == 0.8

    @pytest.mark.slow
    def test_typed_proxy_in_sim_matches_exact(self):
        """Typed proxy end-to-end: trajectory parity vs the exact typed
        model through the engine's fast path."""
        class TypedLJ(htf.PairModel):
            def pair_energy(self, r2, ti, tj):
                eps = jnp.where((ti == 0) & (tj == 0), 1.0,
                                jnp.where((ti == 1) & (tj == 1), 0.5,
                                          0.75))
                u = 1.0 / r2
                sr6 = u * u * u
                return 4.0 * eps * (sr6 * sr6 - sr6)

        def fluid(model, seed=0):
            n = 512
            sim = htf.Simulation(dt=0.005,
                                 integrator=htf.md.NVT(kT=1.0, tau=0.5),
                                 seed=seed)
            sim.init_lattice(n, density=0.4, kT_init=1.0)
            rng = np.random.RandomState(seed)
            sim.state = dataclasses.replace(
                sim.state,
                positions=sim.state.positions + 0.08 * jnp.asarray(
                    rng.uniform(-1, 1, (n, 3)).astype(np.float32)),
                types=jnp.asarray(np.arange(n) % 2, jnp.int32))
            htf.tfcompute(model).attach(sim, r_cut=2.5, nlist="cellwise")
            sim._choose_repack_interval = lambda layout: 3
            return sim

        s1 = fluid(TypedLJ(48))
        s2 = fluid(TypedLJ(48, proxy_degree=16, proxy_types=2))
        s1.run(10)
        s2.run(10)
        L = np.asarray(htf.box_size(s1.state.box))
        d = (np.asarray(s1.state.positions) -
             np.asarray(s2.state.positions))
        d = d - np.round(d / L) * L
        assert np.abs(d).max() < 2e-3, np.abs(d).max()
