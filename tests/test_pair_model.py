"""PairModel: the analytic pair-potential fast path vs the generic
vjp route -- identical physics on every path (packed nlist, cellwise
planes, cellwise analytic)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import hoomd_tf_tpu as htf
import zoo


class PairLJ(htf.PairModel):
    def pair_energy(self, r2):
        u = 1.0 / r2
        sr6 = u * u * u
        return 4.0 * (sr6 * sr6 - sr6)


class TypedPairLJ(htf.PairModel):
    """eps depends on the type pair: eps=1 for (0,0), 0.5 otherwise."""

    def pair_energy(self, r2, type_i, type_j):
        u = 1.0 / r2
        sr6 = u * u * u
        eps = jnp.where((type_i == 0) & (type_j == 0), 1.0, 0.5)
        return 4.0 * eps * (sr6 * sr6 - sr6)


class TrainablePairLJ(htf.PairModel):
    def setup(self):
        self.eps = htf.Variable(0.8, name="eps")

    def pair_energy(self, r2):
        u = 1.0 / r2
        sr6 = u * u * u
        return 4.0 * self.eps.value * (sr6 * sr6 - sr6)


def make_fluid(n=64, seed=0, kT=0.9):
    sim = htf.Simulation(dt=0.002, seed=seed,
                         integrator=htf.md.NVT(kT=kT, tau=0.5))
    sim.init_lattice(n, density=0.35, kT_init=kT)
    rng = np.random.RandomState(seed)
    sim.state = dataclasses.replace(
        sim.state, positions=sim.state.positions +
        0.05 * jnp.asarray(rng.randn(n, 3).astype(np.float32)))
    return sim


class TestFallbackCompute:
    @pytest.mark.slow
    def test_matches_simmodel_lj(self):
        """PairModel's generic compute == a hand-written LJ SimModel."""
        n = 32
        sim = make_fluid(n)
        nlist = htf.compute_nlist(sim.state.positions4, 2.5, 16,
                                  htf.box_size(sim.state.box),
                                  sorted=True, return_types=True)
        inputs = [nlist, sim.state.positions4, sim.state.box]
        ref = zoo.LJModel(16)(inputs)
        got = PairLJ(16)(inputs)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                                   rtol=2e-4, atol=2e-4)

    @pytest.mark.slow
    def test_virial_matches(self):
        n = 27
        sim = make_fluid(n)
        nlist = htf.compute_nlist(sim.state.positions4, 2.5, 16,
                                  htf.box_size(sim.state.box),
                                  sorted=True, return_types=True)
        inputs = [nlist, sim.state.positions4, sim.state.box]
        ref = zoo.LJVirialModel(16, virial=True)(inputs)
        got = PairLJ(16, virial=True)(inputs)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                                   rtol=2e-4, atol=2e-4)


class TestCellwiseFastPath:
    @pytest.mark.slow
    def test_trajectory_matches_generic_model(self):
        """A cellwise run with PairLJ reproduces the same run with the
        equivalent generic SimModel (which uses the planes + vjp route)."""
        def trajectory(model_cls):
            sim = make_fluid(125, seed=2)
            tfc = htf.tfcompute(model_cls(16))
            tfc.attach(sim, r_cut=2.0, nlist="cellwise")
            sim.run(15)
            return np.asarray(sim.state.positions)

        np.testing.assert_allclose(trajectory(PairLJ),
                                   trajectory(zoo.LJModel),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.slow
    def test_forces_and_energy_match(self):
        sim = make_fluid(125, seed=3)
        tfc = htf.tfcompute(PairLJ(16))
        tfc.attach(sim, r_cut=2.0, nlist="cellwise")
        sim.run(2)
        f_fast = tfc.get_forces_array()

        sim2 = make_fluid(125, seed=3)
        tfc2 = htf.tfcompute(zoo.LJModel(16))
        tfc2.attach(sim2, r_cut=2.0, nlist="cellwise")
        sim2.run(2)
        f_ref = tfc2.get_forces_array()
        np.testing.assert_allclose(f_fast, f_ref, rtol=1e-4, atol=1e-4)

    @pytest.mark.slow
    def test_pressure_matches(self):
        """Virial through the analytic fast path: logged pressure equals
        the generic route's."""
        def pressure(model_cls, **kw):
            sim = make_fluid(125, seed=4)
            tfc = htf.tfcompute(model_cls(16, **kw))
            tfc.attach(sim, r_cut=2.0, nlist="cellwise")
            sim.run(5, log_period=1)
            return sim.log["pressure"]

        np.testing.assert_allclose(
            pressure(PairLJ, virial=True),
            pressure(zoo.LJVirialModel, virial=True),
            rtol=1e-4, atol=1e-5)

    @pytest.mark.slow
    def test_typed_pair_energy(self):
        """Typed pair_energy on the fast path vs the same model through
        the dense route."""
        n = 125
        types = np.arange(n) % 2

        def run(nlist_mode):
            sim = make_fluid(n, seed=5)
            sim.state = dataclasses.replace(
                sim.state, types=jnp.asarray(types, dtype=jnp.int32))
            tfc = htf.tfcompute(TypedPairLJ(24))
            tfc.attach(sim, r_cut=2.0, nlist=nlist_mode)
            sim.run(5)
            return np.asarray(sim.state.positions)

        np.testing.assert_allclose(run("cellwise"), run("n2"),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.slow
    def test_variables_resolve_on_fast_path(self):
        """pair_energy reading a Variable works under the fast path."""
        def traj(eps):
            sim = make_fluid(125, seed=6)
            m = TrainablePairLJ(16)
            m.ensure_built([jnp.zeros((1, 1, 4)), jnp.zeros((1, 4)),
                            sim.state.box], training=False)
            m.eps.assign(eps)
            tfc = htf.tfcompute(m)
            tfc.attach(sim, r_cut=2.0, nlist="cellwise")
            sim.run(5)
            return np.asarray(sim.state.positions)

        a, b = traj(0.4), traj(1.2)
        assert np.abs(a - b).max() > 1e-5  # eps actually flows through

    def test_period_gating(self):
        """Stale-force persistence works with the fast path."""
        sim = make_fluid(125, seed=7)
        tfc = htf.tfcompute(PairLJ(16))
        tfc.attach(sim, r_cut=2.0, nlist="cellwise", period=3)
        sim.run(7)
        assert np.all(np.isfinite(np.asarray(sim.state.positions)))

    def test_nve_energy_conservation(self):
        """The analytic force is the exact gradient: NVE conserves
        energy through repacks."""
        sim = htf.Simulation(dt=0.001, seed=8)
        sim.init_lattice(216, density=0.3, kT_init=0.4)
        tfc = htf.tfcompute(PairLJ(24))
        tfc.attach(sim, r_cut=2.5, nlist="cellwise")
        sim.run(10, log_period=1)
        e = sim.log["potential_energy"] + sim.log["kinetic_energy"]
        drift = np.abs(e - e[0]).max() / max(abs(e[0]), 1e-9)
        assert drift < 5e-4


class TestReplan:
    @pytest.mark.slow
    def test_replan_continues_trajectory(self):
        sim = make_fluid(125, seed=9)
        tfc = htf.tfcompute(PairLJ(16))
        tfc.attach(sim, r_cut=2.0, nlist="cellwise")
        sim.run(10)
        pos_before = np.asarray(sim.state.positions)
        sim.replan()
        sim.run(5)
        assert np.all(np.isfinite(np.asarray(sim.state.positions)))
        assert np.abs(np.asarray(sim.state.positions) -
                      pos_before).max() > 0


class TestValidation:
    def test_unimplemented_pair_energy_raises(self):
        with pytest.raises((NotImplementedError, AttributeError)):
            m = htf.PairModel(8)
            m.pair_energy(jnp.ones((2, 2)))

    def test_bad_arity_raises(self):
        class Bad(htf.PairModel):
            def pair_energy(self, r2, type_i):
                return r2

        with pytest.raises(ValueError, match="pair_energy"):
            Bad(8)


class TestBuiltinAnalyticRoute:
    """Built-in pair potentials (LJ/WCA) take the analytic route in
    cellwise mode -- identical trajectories and virial vs the generic
    planes route (nlist='n2' baseline forces the generic path)."""

    @pytest.mark.slow
    def test_builtin_lj_trajectory_parity(self):
        def traj(nlist_mode):
            sim = make_fluid(125, seed=11)
            sim.add_force(htf.md.LennardJones(r_cut=2.0))
            obs = htf.tfcompute(_Observer(16, output_forces=False))
            obs.attach(sim, r_cut=2.0, nlist=nlist_mode)
            sim.run(10, log_period=2)
            return (np.asarray(sim.state.positions),
                    sim.log["pressure"])

        p_cw, pr_cw = traj("cellwise")
        p_n2, pr_n2 = traj("n2")
        np.testing.assert_allclose(p_cw, p_n2, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(pr_cw, pr_n2, rtol=1e-4, atol=1e-5)

    @pytest.mark.slow
    def test_builtin_wca_parity(self):
        def traj(nlist_mode):
            sim = make_fluid(125, seed=12, kT=0.5)
            sim.add_force(htf.md.WCA(sigma=1.0))
            obs = htf.tfcompute(_Observer(16, output_forces=False))
            obs.attach(sim, r_cut=2.0, nlist=nlist_mode)
            sim.run(8)
            return np.asarray(sim.state.positions)

        np.testing.assert_allclose(traj("cellwise"), traj("n2"),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.slow
    def test_typed_builtin_lj_parity(self):
        eps = np.array([[1.0, 0.5], [0.5, 0.8]], np.float32)
        sig = np.ones((2, 2), np.float32)

        def traj(nlist_mode):
            sim = make_fluid(125, seed=13)
            sim.state = dataclasses.replace(
                sim.state,
                types=jnp.asarray(np.arange(125) % 2, dtype=jnp.int32))
            sim.add_force(htf.md.LennardJones(epsilon=eps, sigma=sig,
                                              r_cut=2.0))
            obs = htf.tfcompute(_Observer(16, output_forces=False))
            obs.attach(sim, r_cut=2.0, nlist=nlist_mode)
            sim.run(8)
            return np.asarray(sim.state.positions)

        np.testing.assert_allclose(traj("cellwise"), traj("n2"),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.slow
    def test_online_training_with_analytic_labels(self):
        """Training against analytic-builtin labels learns: the
        trainable eps moves toward the label potential's eps=1."""
        sim = make_fluid(125, seed=14)
        sim.add_force(htf.md.LennardJones(r_cut=2.0))
        model = _TrainableLJPlanes(16)
        model.compile(optimizer="adam", loss="mse", learning_rate=2e-2)
        tfc = htf.tfcompute(model)
        tfc.attach(sim, r_cut=2.0, nlist="cellwise", train=True)
        sim.run(40)
        losses = np.asarray(tfc.loss_history)
        assert np.all(np.isfinite(losses))
        assert losses[-1] < losses[0]
        assert float(model.eps.value) > 0.55  # moved from 0.5 toward 1


class _Observer(htf.SimModel):
    def compute(self, nlist):
        return jnp.zeros(())


class _TrainableLJPlanes(htf.SimModel):
    """Planes-compatible trainable model (uses nlist_rinv, no packed
    indexing)."""

    def setup(self):
        self.eps = htf.Variable(0.5, name="eps")

    def compute(self, nlist, positions, box):
        rinv = htf.nlist_rinv(nlist)
        iv6 = rinv ** 6
        e = jnp.sum(4.0 / 2.0 * self.eps.value * (iv6 * iv6 - iv6),
                    axis=1)
        return htf.compute_nlist_forces(nlist, e)


class TestSlopeOverride:
    @pytest.mark.slow
    def test_override_matches_jvp_default(self):
        """A hand-written pair_energy_and_slope must reproduce the jvp
        default exactly (engine physics does not depend on which form
        the model provides)."""
        class Fast(htf.PairModel):
            def pair_energy(self, r2):
                u = 1.0 / r2
                sr6 = u * u * u
                return 4.0 * (sr6 * sr6 - sr6)

            def pair_energy_and_slope(self, r2):
                u = 1.0 / r2
                sr6 = u * u * u
                return (4.0 * (sr6 * sr6 - sr6),
                        -12.0 * (2.0 * sr6 - 1.0) * sr6 * u)

        def traj(cls):
            sim = make_fluid(125, seed=15)
            tfc = htf.tfcompute(cls(16))
            tfc.attach(sim, r_cut=2.0, nlist="cellwise")
            sim.run(10)
            return np.asarray(sim.state.positions)

        np.testing.assert_allclose(traj(Fast), traj(PairLJ),
                                   rtol=1e-5, atol=1e-5)

    def test_builtin_slope_matches_jvp(self):
        """Builtin LJ's hand slope == jvp of its pair_energy."""
        import jax
        lj = htf.md.LennardJones(epsilon=0.8, sigma=1.1, r_cut=2.5)
        r2 = jnp.linspace(0.5, 8.0, 64).reshape(8, 8)
        ti = tj = jnp.zeros_like(r2)
        u_fast, du_fast = lj.pair_energy_and_slope(r2, ti, tj)
        u_ref, du_ref = jax.jvp(
            lambda x: lj.pair_energy(x, ti, tj), (r2,),
            (jnp.ones_like(r2),))
        np.testing.assert_allclose(np.asarray(u_fast), np.asarray(u_ref),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(du_fast),
                                   np.asarray(du_ref), rtol=1e-5,
                                   atol=1e-6)


class TestAutoReplan:
    def _stale(self, sim):
        """Install a deliberately fat (cold-start-like) plan."""
        import dataclasses as _dc
        from hoomd_tf_tpu.md.slots import SlotLayout
        layout = sim._ensure_layout()
        fat = SlotLayout(
            _dc.replace(layout.plan, capacity=layout.plan.capacity * 2),
            sim.state.n_particles, layout.lo)
        sim._layout = fat
        sim._replan_check_step = -1
        return fat

    @pytest.mark.slow
    def test_auto_replan_tightens(self):
        """A stale plan is automatically replaced at the next run()
        boundary (the engine's analog of HOOMD's self-resizing cell
        list), and the trajectory continues unchanged."""
        sim = make_fluid(216, seed=20)
        tfc = htf.tfcompute(PairLJ(16))
        tfc.attach(sim, r_cut=2.0, nlist="cellwise")
        sim.run(120)
        fat = self._stale(sim)
        sim.run(5)
        new_plan = sim._ensure_layout().plan
        assert new_plan.capacity < fat.plan.capacity

    @pytest.mark.slow
    def test_opt_out_warns_instead(self):
        import warnings as _w
        sim = make_fluid(216, seed=20)
        sim.auto_replan = False
        tfc = htf.tfcompute(PairLJ(16))
        tfc.attach(sim, r_cut=2.0, nlist="cellwise")
        sim.run(120)
        fat = self._stale(sim)
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            sim.run(5)
        assert any("replan" in str(r.message) for r in rec)
        assert sim._ensure_layout() is fat  # plan untouched

    @pytest.mark.slow
    def test_no_replan_when_tight(self):
        sim = make_fluid(216, seed=21)
        tfc = htf.tfcompute(PairLJ(16))
        tfc.attach(sim, r_cut=2.0, nlist="cellwise")
        sim.run(120)
        layout = sim._ensure_layout()
        sim._replan_check_step = -1
        sim.run(5)
        assert sim._ensure_layout() is layout


class TestPairModelSerialization:
    def test_save_load_roundtrip(self, tmp_path):
        m = TrainablePairLJ(16)
        m.ensure_built([jnp.zeros((2, 2, 4)), jnp.zeros((2, 4)),
                        jnp.zeros((3, 3))])
        m.eps.assign(0.67)
        path = str(tmp_path / "pair.pkl")
        htf.save_model(m, path)
        m2 = htf.load_model(
            path, custom_objects_arg={"TrainablePairLJ": TrainablePairLJ})
        assert isinstance(m2, htf.PairModel)
        np.testing.assert_allclose(float(m2.eps.value), 0.67, rtol=1e-6)
        assert m2.min_r2 == m.min_r2

    @pytest.mark.slow
    def test_checkpoint_resume_mid_run(self, tmp_path):
        from hoomd_tf_tpu.serialize import (save_checkpoint,
                                            load_checkpoint)
        sim = make_fluid(125, seed=30)
        tfc = htf.tfcompute(PairLJ(16))
        tfc.attach(sim, r_cut=2.0, nlist="cellwise")
        sim.run(7)
        path = str(tmp_path / "ck.pkl")
        save_checkpoint(path, model=tfc.model, sim=sim, tfc=tfc)
        sim.run(5)
        ref = np.asarray(sim.state.positions)

        sim2 = make_fluid(125, seed=30)
        tfc2 = htf.tfcompute(PairLJ(16))
        tfc2.attach(sim2, r_cut=2.0, nlist="cellwise")
        load_checkpoint(path, model=tfc2.model, sim=sim2, tfc=tfc2)
        sim2.run(5)
        np.testing.assert_allclose(np.asarray(sim2.state.positions), ref,
                                   rtol=1e-5, atol=1e-5)
