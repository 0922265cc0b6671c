"""Multi-device execution on the 8-device virtual CPU mesh: the unified
sharded engine (Simulation + mesh), frame-data-parallel training, and the
explicit halo-ring reference implementation."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

import hoomd_tf_tpu as htf
import zoo
from hoomd_tf_tpu.models.module import get_state
from hoomd_tf_tpu.parallel import make_mesh, sharded_train_step


def random_pos4(n, L, seed=0):
    rng = np.random.RandomState(seed)
    pos = (rng.rand(n, 3) * L - L / 2).astype(np.float32)
    return jnp.asarray(np.concatenate(
        [pos, np.zeros((n, 1), np.float32)], axis=1))


def lattice_pos4(n, a=1.3, seed=0, jitter=0.05):
    """Well-separated positions so LJ labels stay O(1)."""
    pos, lengths = htf.md.lattice_positions(n, a=a)
    rng = np.random.RandomState(seed)
    pos = pos + jitter * rng.randn(*pos.shape).astype(np.float32)
    pos4 = np.concatenate([pos, np.zeros((n, 1), np.float32)], axis=1)
    return jnp.asarray(pos4), lengths


class TestHaloExchange:
    @pytest.mark.slow
    def test_matches_single_device(self):
        """Slab decomposition + ring ppermute halo exchange reproduces the
        single-device forces exactly (the MD twin of ring attention)."""
        from hoomd_tf_tpu.parallel import domain_decompose, halo_force_fn

        n, r_cut, NN = 4096, 2.0, 32
        model = zoo.LJModel(NN)
        pos4, lengths = lattice_pos4(n, a=1.1, seed=4, jitter=0.05)
        L = float(lengths[0])
        box = htf.box_from_lengths(lengths)
        mesh = make_mesh(8)

        perm, counts = domain_decompose(pos4, box, 8, r_cut=r_cut)
        assert counts.sum() == n
        # pad each slab to the max count with NaN dummies (distance-invalid
        # everywhere; finite far coordinates would wrap back into the box)
        cmax = int(counts.max())
        slabs = []
        offs = 0
        pos_np = np.asarray(pos4)[perm]
        for c in counts:
            slab = pos_np[offs:offs + c]
            pad = np.full((cmax - c, 4), np.nan, np.float32)
            slabs.append(np.concatenate([slab, pad], axis=0))
            offs += c
        pos_sharded = jnp.asarray(np.concatenate(slabs, axis=0))

        nlist = htf.compute_nlist(pos4, r_cut, NN, [L, L, L],
                                  sorted=True, return_types=True)
        model.ensure_built([nlist, pos4, box])
        from hoomd_tf_tpu.models.module import get_state
        values = get_state(model)

        fn = halo_force_fn(model, r_cut, mesh, halo_capacity=1024)
        forces_sh, overflow, _ = jax.jit(fn)(values, pos_sharded, box)
        assert not bool(overflow)

        # single-device oracle on the same (permuted, padded) layout:
        # compare only the real rows
        forces_ref = model([nlist, pos4, box])[0]
        forces_ref = np.asarray(forces_ref)[perm]
        got = np.asarray(forces_sh)
        offs = 0
        row = 0
        for c in counts:
            np.testing.assert_allclose(
                got[row:row + c], forces_ref[offs:offs + c],
                rtol=1e-4, atol=1e-5)
            offs += c
            row += cmax


class TestShardedSimulation:
    def test_nvt_run_and_thermo(self):
        """The multi-chip Simulation front end: lattice init, attach,
        run NVT, thermo -- all sharded over 8 devices."""
        from hoomd_tf_tpu.parallel import ShardedSimulation

        sim = ShardedSimulation(dt=0.002, kT=0.8, tau=0.5,
                                mesh=make_mesh(8), seed=1)
        sim.init_lattice(128, a=1.4, kT_init=0.8)
        sim.attach(zoo.LJModel(24), r_cut=2.5)
        sim.run(50)
        t = sim.thermo()
        assert np.isfinite(t["potential_energy"])
        assert 0.1 < t["temperature"] < 3.0
        assert int(sim.state.step) == 50
        # state stays sharded over the particle axis
        shard_shapes = {d.shape for d in
                        [s.data for s in
                         sim.state.positions.addressable_shards]}
        assert shard_shapes == {(16, 3)}

    def test_matches_single_device(self):
        """NVE through ShardedSimulation == single-device Simulation."""
        from hoomd_tf_tpu.parallel import ShardedSimulation

        n, r_cut, NN, dt, steps = 64, 2.5, 16, 0.001, 10
        pos4, lengths = lattice_pos4(n, a=1.3, seed=9, jitter=0.05)

        ssim = ShardedSimulation(dt=dt, mesh=make_mesh(8), seed=0)
        ssim.init_lattice(n, a=1.3)
        import dataclasses
        ssim.state = dataclasses.replace(
            ssim.state, positions=jnp.asarray(pos4[:, :3]),
            velocities=jnp.zeros((n, 3), jnp.float32))
        ssim._shard_state()
        ssim.attach(zoo.LJModel(NN), r_cut=r_cut)
        ssim.run(steps)

        sim = htf.Simulation(dt=dt, integrator=htf.md.NVE(), seed=0)
        sim.init_state(np.asarray(pos4), lengths,
                       velocities=np.zeros((n, 3), np.float32))
        tfc = htf.tfcompute(zoo.LJModel(NN))
        tfc.attach(sim, r_cut=r_cut, nlist="n2")
        sim.run(steps)

        np.testing.assert_allclose(np.asarray(ssim.state.positions),
                                   np.asarray(sim.state.positions),
                                   atol=1e-4)


class TestFrameDataParallelTraining:
    """Offline force-matching with trajectory FRAMES sharded over the
    mesh -- the data-parallel axis of SURVEY.md section 2.3 (reference
    examples 06/08), built on the model's standard call (no second
    force engine)."""

    @staticmethod
    def _frames(n=64, NN=16, r_cut=3.0, n_frames=8, seed=2):
        """n_frames jittered-lattice frames + LJ label forces."""
        import hoomd_tf_tpu.md as md
        rng = np.random.RandomState(seed)
        base, lengths = htf.md.lattice_positions(n, a=1.3)
        L = float(lengths[0])
        box = htf.box_from_lengths(lengths)
        lj = md.LennardJones(r_cut=r_cut)
        sim = htf.Simulation()
        nls, p4s, labs = [], [], []
        for _ in range(n_frames):
            pos = base + 0.05 * rng.randn(n, 3).astype(np.float32)
            pos4 = jnp.asarray(np.concatenate(
                [pos, np.zeros((n, 1), np.float32)], axis=1))
            nl = htf.compute_nlist(pos4, r_cut, NN, [L, L, L],
                                   sorted=True, return_types=True)
            sim.init_state(np.asarray(pos), [L, L, L])
            lab, _ = lj(sim.state, nl)
            nls.append(nl)
            p4s.append(pos4)
            labs.append(lab)
        return (jnp.stack(nls), jnp.stack(p4s), jnp.stack(labs), box)

    @pytest.mark.slow
    def test_loss_decreases(self):
        import optax
        NN = 16
        model = zoo.TrainableGraph(NN)
        model.lj.w.assign(jnp.asarray([0.7, 1.2]))
        nlist_b, pos4_b, labels_b, box = self._frames(NN=NN)
        model.ensure_built([nlist_b[0], pos4_b[0], box])
        mesh = make_mesh(8)

        values = get_state(model)
        variables = model.variables
        t_idx = [i for i, v in enumerate(variables) if v.trainable]
        params = [values[i] for i in t_idx]
        optimizer = optax.adam(5e-2)
        opt_state = optimizer.init(params)
        step = jax.jit(sharded_train_step(model, optimizer, mesh))
        losses = []
        for _ in range(30):
            loss, params, opt_state = step(params, values, opt_state,
                                           nlist_b, pos4_b, box, labels_b)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    @pytest.mark.slow
    def test_grads_match_single_device(self):
        """pmean'd frame-sharded gradients == single-device gradients of
        the mean-over-frames loss."""
        import optax
        NN = 8
        model = zoo.TrainableGraph(NN)
        nlist_b, pos4_b, labels_b, box = self._frames(n=32, NN=NN, seed=3)
        model.ensure_built([nlist_b[0], pos4_b[0], box])
        values = get_state(model)
        variables = model.variables
        t_idx = [i for i, v in enumerate(variables) if v.trainable]
        params = [values[i] for i in t_idx]

        def loss_single(params):
            vals = list(values)
            for i, p in zip(t_idx, params):
                vals[i] = p
            from hoomd_tf_tpu.models.module import functional_call

            def frame(nl, p4, lab):
                (out,), _ = functional_call(
                    model, vals, lambda: model([nl, p4, box],
                                               training=True))
                return jnp.mean((out[:, :3] - lab[:, :3]) ** 2)

            return jnp.mean(jax.vmap(frame)(nlist_b, pos4_b, labels_b))

        g_single = jax.grad(loss_single)(params)

        # sgd(1.0): params' delta == -grad
        mesh = make_mesh(8)
        optimizer = optax.sgd(1.0)
        opt_state = optimizer.init(params)
        step = jax.jit(sharded_train_step(model, optimizer, mesh))
        _, new_params, _ = step(params, values, opt_state, nlist_b,
                                pos4_b, box, labels_b)
        g_sharded = [p - np_ for p, np_ in zip(params, new_params)]
        for gs, g1 in zip(g_sharded, g_single):
            np.testing.assert_allclose(np.asarray(gs), np.asarray(g1),
                                       rtol=1e-3, atol=1e-6)


class TestUnifiedShardedEngine:
    """The multi-chip engine IS the single-chip engine with a mesh
    (VERDICT round-1 item 3): the full driver feature matrix runs sharded,
    and the cellwise hot path matches single-device exactly (the analog of
    the reference's MPI force-match bar, test_mpi_tensorflow.py:57-79)."""

    @staticmethod
    def _fluid(n=4096, mesh=None, integrator=None, seed=0, kT_init=1.0):
        import dataclasses
        sim = htf.Simulation(dt=0.005,
                             integrator=integrator or htf.md.NVE(),
                             seed=seed, mesh=mesh)
        sim.init_lattice(n, density=0.4, kT_init=kT_init)
        rng = np.random.RandomState(seed)
        sim.state = dataclasses.replace(
            sim.state, positions=sim.state.positions + 0.08 * jnp.asarray(
                rng.uniform(-1, 1, (n, 3)).astype(np.float32)))
        return sim

    @pytest.mark.slow
    def test_sharded_cellwise_matches_single_device(self):
        """20 NVT steps (crossing a repack) on an 8-device mesh equal the
        single-device cellwise trajectory; no O(N^2) build anywhere."""
        ref = self._fluid(integrator=htf.md.NVT(kT=1.0, tau=0.5))
        shd = self._fluid(mesh=make_mesh(8),
                          integrator=htf.md.NVT(kT=1.0, tau=0.5))
        htf.tfcompute(zoo.LJModel(48)).attach(ref, r_cut=2.5,
                                              nlist="cellwise")
        htf.tfcompute(zoo.LJModel(48)).attach(shd, r_cut=2.5,
                                              nlist="cellwise")
        # the plan must be the z-decomposed grid, not a fallback
        assert shd._ensure_layout().plan.grid[2] % 8 == 0
        # pin the SAME static repack interval on both engines: the grids
        # differ (z-divisible vs free), so the derived intervals can
        # differ, and rebuilds at different steps seed f32-ordering
        # noise that LJ chaos amplifies past any tolerance. K=3 is
        # safely under the Verlet bound of BOTH plans (the sharded nz%8
        # grid has the smaller skin, ~0.2 here); 8 steps cross two
        # mid-run rebuilds while staying inside the horizon where the
        # different grids' f32 summation orders (seeded at every force
        # eval AND every rebuild) have not yet been chaos-amplified
        # past the tolerance (measured: 4.8e-3 by step 20).
        ref._choose_repack_interval = lambda layout: 3
        shd._choose_repack_interval = lambda layout: 3
        ref.run(8)
        shd.run(8)
        L = np.asarray(htf.box_size(ref.state.box))
        d = np.asarray(ref.state.positions) - np.asarray(shd.state.positions)
        d = d - np.round(d / L) * L
        # 5e-4: two mid-run rebuilds reorder the f32 sums differently on
        # the two grids (measured max 1.8e-4 here); a real neighbor
        # error (missed/duplicated pair) shows up as O(0.1+)
        np.testing.assert_allclose(d, np.zeros_like(d), atol=5e-4)

    @pytest.mark.slow
    def test_sharded_pallas_stencil_matches_single_device(self):
        """The Pallas half-stencil kernel runs SPMD under a mesh (a
        shard_map-wrapped pallas_call on the z-slab cell sharding; the
        halo exchange lives in the XLA candidate-plane rolls around it,
        ops/cellwise_pallas.py) and reproduces the single-device
        full-stencil trajectory. On this CPU mesh the kernel runs in
        interpret mode; on TPU the same wrapper is the sharded fast
        path (VERDICT r3 item 3)."""
        import os
        ref = self._fluid(integrator=htf.md.NVT(kT=1.0, tau=0.5))
        shd = self._fluid(mesh=make_mesh(8),
                          integrator=htf.md.NVT(kT=1.0, tau=0.5))
        htf.tfcompute(zoo.PairLJ(48)).attach(ref, r_cut=2.5,
                                             nlist="cellwise")
        htf.tfcompute(zoo.PairLJ(48)).attach(shd, r_cut=2.5,
                                             nlist="cellwise")
        assert shd._ensure_layout().plan.grid[2] % 8 == 0
        ref._choose_repack_interval = lambda layout: 3
        shd._choose_repack_interval = lambda layout: 3
        os.environ["HTF_CELLWISE_STENCIL"] = "pallas"
        try:
            shd.run(8)
        finally:
            del os.environ["HTF_CELLWISE_STENCIL"]
        ref.run(8)
        L = np.asarray(htf.box_size(ref.state.box))
        d = (np.asarray(ref.state.positions) -
             np.asarray(shd.state.positions))
        d = d - np.round(d / L) * L
        np.testing.assert_allclose(d, np.zeros_like(d), atol=5e-4)
        # energy logging rides the same kernel (needs_energy lanes)
        pe = shd.thermo()["potential_energy"]
        pe_ref = ref.thermo()["potential_energy"]
        assert abs(pe - pe_ref) < 1e-2 * abs(pe_ref)

    @pytest.mark.slow
    def test_uneven_particle_count(self):
        """n = 4093 (prime: not divisible by the 8-device mesh). The
        slot layout decouples particle count from the sharded slot axis
        (ghost rows pad each cell), so uneven spatial decomposition
        works like the reference's x=[0.33] MPI fractions
        (test_mpi_tensorflow.py:57-79): particles distribute unevenly
        over z-slabs and the trajectory matches single-device."""
        n = 4093
        ref = self._fluid(n=n, integrator=htf.md.NVT(kT=1.0, tau=0.5))
        shd = self._fluid(n=n, mesh=make_mesh(8),
                          integrator=htf.md.NVT(kT=1.0, tau=0.5))
        htf.tfcompute(zoo.LJModel(48)).attach(ref, r_cut=2.5,
                                              nlist="cellwise")
        htf.tfcompute(zoo.LJModel(48)).attach(shd, r_cut=2.5,
                                              nlist="cellwise")
        layout = shd._ensure_layout()
        assert layout.plan.grid[2] % 8 == 0
        assert n % 8 != 0 and layout.plan.n_slots % 8 == 0
        # per-shard real-particle counts are genuinely uneven
        ref._choose_repack_interval = lambda layout: 3
        shd._choose_repack_interval = lambda layout: 3
        ref.run(8)
        shd.run(8)
        L = np.asarray(htf.box_size(ref.state.box))
        d = (np.asarray(ref.state.positions) -
             np.asarray(shd.state.positions))
        d = d - np.round(d / L) * L
        np.testing.assert_allclose(d, np.zeros_like(d), atol=5e-4)
        t = shd.thermo()["temperature"]
        assert 0.3 < t < 2.5, t

    @pytest.mark.slow
    def test_sharded_langevin_and_logging(self):
        from hoomd_tf_tpu.parallel import ShardedSimulation
        sim = ShardedSimulation(dt=0.005, mesh=make_mesh(8), seed=2,
                                integrator=htf.md.Langevin(kT=0.9,
                                                           gamma=1.0))
        sim.init_lattice(4096, density=0.4, kT_init=0.9)
        sim.attach(zoo.LJModel(48), r_cut=2.5)
        sim.run(30, log_period=10)
        assert sim.log["temperature"].shape == (3,)
        assert np.all(np.isfinite(sim.log["potential_energy"]))
        t = sim.thermo()["temperature"]
        assert 0.3 < t < 2.5, t

    @pytest.mark.slow
    def test_sharded_builtin_forces_and_period(self):
        from hoomd_tf_tpu.parallel import ShardedSimulation
        sim = ShardedSimulation(dt=0.005, kT=1.0, mesh=make_mesh(8), seed=3)
        sim.init_lattice(4096, density=0.4, kT_init=1.0)
        sim.add_force(htf.md.LennardJones(epsilon=0.5, sigma=1.0,
                                          r_cut=2.5))
        tfc = sim.attach(zoo.LJModel(48), r_cut=2.5, period=2)
        sim.run(10)
        assert int(sim.state.step) == 10
        assert np.all(np.isfinite(np.asarray(sim.state.forces)))

    @pytest.mark.slow
    def test_sharded_online_training(self):
        """hoomd2tf training inside the sharded engine: loss decreases."""
        import dataclasses
        from hoomd_tf_tpu.parallel import ShardedSimulation
        from test_cellwise import TrainablePlanes
        sim = ShardedSimulation(dt=0.005, mesh=make_mesh(8), seed=4,
                                integrator=htf.md.Langevin(kT=0.8,
                                                           gamma=1.0))
        sim.init_lattice(4096, density=0.4, kT_init=0.8)
        lj = sim.add_force(htf.md.LennardJones(epsilon=1.0, sigma=1.0,
                                               r_cut=2.5))
        model = TrainablePlanes(48, output_forces=False)
        model.lj.w.assign(jnp.asarray([0.6, 1.3]))
        model.compile(optimizer="adam", loss="mse", learning_rate=5e-2)
        tfc = sim.attach(model, r_cut=2.5, train=True)
        tfc.set_reference_forces(lj)
        sim.run(40)
        losses = tfc.loss_history
        assert len(losses) == 40
        assert np.mean(losses[-10:]) < np.mean(losses[:10])

    def test_small_box_falls_back_to_n2(self):
        from hoomd_tf_tpu.parallel import ShardedSimulation
        sim = ShardedSimulation(dt=0.005, kT=0.8, mesh=make_mesh(8), seed=5)
        sim.init_lattice(128, a=1.4, kT_init=0.8)
        tfc = sim.attach(zoo.LJModel(24), r_cut=2.5)
        assert tfc.nlist_method == "n2"
        sim.run(10)
        assert np.isfinite(sim.thermo()["potential_energy"])


class TestShardedReplan:
    @pytest.mark.slow
    def test_replan_on_mesh_keeps_z_divisibility(self):
        """replan() under a mesh re-plans with the z-divisor constraint
        and the sharded run continues."""
        from hoomd_tf_tpu.parallel import ShardedSimulation
        sim = ShardedSimulation(dt=0.002, kT=0.9, mesh=make_mesh(8),
                                seed=6)
        sim.init_lattice(4096, density=0.4, kT_init=0.9)
        tfc = sim.attach(zoo.LJModel(48), r_cut=2.5)
        assert tfc.nlist_method == "cellwise"
        sim.run(10)
        sim.replan()
        plan = sim._ensure_layout().plan
        assert plan.grid[2] % 8 == 0, plan
        sim.run(5)
        assert np.isfinite(sim.thermo()["potential_energy"])


class TestShardedThroughputRegression:
    @pytest.mark.slow
    def test_sharded_beats_single_device(self):
        """The sharded engine must BEAT single-device on the virtual
        8-mesh once per-shard compute dominates the halo (VERDICT r4
        item 4; trend artifact: benchmarks/sharded_scale.json, which
        carries the 64k row -- measured there at 16384 the margin is
        ~1.2x, wide enough for a stable CI assertion where the 64k
        point's 1.02x is not)."""
        import dataclasses
        import os
        import time

        # a wall-clock comparison is only meaningful on a quiet host:
        # the sharded run's 8 device threads lose their parallelism
        # under external CPU contention (observed: a concurrent pytest
        # run flips the comparison)
        try:
            load = os.getloadavg()[0]
        except OSError:
            load = 0.0
        # own-run load is ~cpu_count on a saturated box; only skip on
        # clear EXTERNAL contention on top of that
        if load > (os.cpu_count() or 1) + 1.0:
            pytest.skip(f"host too loaded for a timing regression "
                        f"(loadavg {load:.1f})")

        class LJPair(htf.PairModel):
            def pair_energy(self, r2):
                u = 1.0 / r2
                sr6 = u * u * u
                return 4.0 * (sr6 * sr6 - sr6)

        n = 16384

        def fluid(mesh):
            sim = htf.Simulation(
                dt=0.005, integrator=htf.md.NVT(kT=1.0, tau=0.5),
                seed=0, mesh=mesh)
            sim.init_lattice(n, density=0.4, kT_init=1.0)
            rng = np.random.RandomState(0)
            sim.state = dataclasses.replace(
                sim.state, positions=sim.state.positions +
                0.08 * jnp.asarray(
                    rng.uniform(-1, 1, (n, 3)).astype(np.float32)))
            htf.tfcompute(LJPair(48)).attach(sim, r_cut=2.5,
                                             nlist="cellwise")
            return sim

        def make(mesh):
            sim = fluid(mesh)
            sim.run(5)
            jax.block_until_ready(sim.state.positions)
            return sim

        def one_round(sim):
            t0 = time.perf_counter()
            sim.run(8)
            jax.block_until_ready(sim.state.positions)
            return (time.perf_counter() - t0) / 8 * 1e3

        # interleave A/B rounds and take each side's min: transient
        # host noise then has to hit every round of one side to flip
        # the comparison
        sim_s, sim_m = make(None), make(make_mesh(8))
        singles, shardeds = [], []
        for _ in range(2):
            singles.append(one_round(sim_s))
            shardeds.append(one_round(sim_m))
        single, sharded = min(singles), min(shardeds)
        if sharded >= single * 1.02:
            # before declaring a regression, rule out external
            # contention DURING the measurement (the pre-check above
            # races whatever starts after it): our own measurement
            # saturates ~cpu_count of load; anything beyond that is a
            # competing process stealing exactly the parallelism the
            # sharded run needs
            load = os.getloadavg()[0]
            if load > (os.cpu_count() or 1) + 0.5:
                pytest.skip(
                    f"sharded {sharded:.1f} vs single {single:.1f} ms "
                    f"under external load (loadavg {load:.1f}) -- "
                    "timing not attributable")
        # expect ~1.2x; 1.02 leaves room for CPU-host timing noise
        # without ever passing a real regression to slower-than-single
        assert sharded < single * 1.02, (
            f"sharded step ({sharded:.1f} ms) does not beat "
            f"single-device ({single:.1f} ms) at n={n}")
