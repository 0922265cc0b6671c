"""tfcompute driver: saved outputs, metrics, online training, EDS biasing,
mapped nlist, retrace -- ports of the reference's driver-level tests."""

import jax.numpy as jnp
import numpy as np
import pytest

import hoomd_tf_tpu as htf
import zoo


def make_sim(n=9, a=4.0, integrator=None, seed=1, kT_init=None, dt=0.005):
    sim = htf.Simulation(dt=dt, integrator=integrator or htf.md.NVE(),
                         seed=seed)
    sim.init_lattice(n, a=a, kT_init=kT_init)
    return sim


class TestAccess:
    def test_arrays(self):
        n = 9
        model = zoo.SimplePotential(n - 1)
        sim = make_sim(n=n, kT_init=1.0)
        # three particle types
        import dataclasses
        sim.state = dataclasses.replace(
            sim.state, types=jnp.asarray(np.arange(n) % 3, dtype=jnp.int32))
        tfc = htf.tfcompute(model)
        tfc.attach(sim, r_cut=5.0)
        sim.run(1)
        tfc.get_virial_array()
        tfc.get_forces_array()
        pa = tfc.get_positions_array()
        nl = tfc.get_nlist_array()
        assert len(np.unique(nl[:, :, 3].astype(int))) == 3
        assert len(np.unique(pa[:, 3].astype(int))) == 3
        assert tfc.get_virial_array().shape == (n, 9)


class TestSavedOutputs:
    def test_save_output_period(self):
        """Port of the reference's save_output_period shape checks
        (test_tensorflow.py:784-796)."""
        n = 9
        model = zoo.TensorSaveModel(n - 1, output_forces=False)
        sim = make_sim(n=n, kT_init=0.8)
        tfc = htf.tfcompute(model)
        tfc.attach(sim, r_cut=5.0, save_output_period=2)
        sim.run(8)
        # calls 1..8, saved at calls 2,4,6,8 -> 4 captures
        assert tfc.outputs[0].shape == (4, n)

    def test_multiple_outputs(self):
        n = 9
        model = zoo.NoForceModel(n - 1, output_forces=False)
        sim = make_sim(n=n, kT_init=0.8)
        tfc = htf.tfcompute(model)
        tfc.attach(sim, r_cut=5.0, save_output_period=1)
        sim.run(3)
        assert len(tfc.outputs) == 2
        assert tfc.outputs[0].shape == (3, n, n - 1)
        assert tfc.outputs[1].shape == (3, n)

    def test_outputs_accumulate_across_runs(self):
        n = 9
        model = zoo.TensorSaveModel(n - 1, output_forces=False)
        sim = make_sim(n=n, kT_init=0.8)
        tfc = htf.tfcompute(model)
        tfc.attach(sim, r_cut=5.0, save_output_period=1)
        sim.run(2)
        sim.run(3)
        assert tfc.outputs[0].shape == (5, n)


class TestMetrics:
    def test_running_mean(self):
        n = 9
        model = zoo.LJRunningMeanModel(n - 1)
        sim = make_sim(n=n, kT_init=0.8, dt=0.001)
        tfc = htf.tfcompute(model)
        tfc.attach(sim, r_cut=5.0)
        sim.run(10)
        assert float(model.avg_energy.result()) < 0
        assert float(model.avg_energy.count.value) == 10 * n

    def test_rdf(self):
        n = 9
        model = zoo.LJRDF(n - 1)
        sim = make_sim(n=n, kT_init=0.8, dt=0.001)
        tfc = htf.tfcompute(model)
        tfc.attach(sim, r_cut=5.0)
        sim.run(10)
        rdf = np.asarray(model.avg_rdf.result())
        assert len(rdf) > 5
        assert rdf.sum() > 0

    def test_typed_rdf_symmetric(self):
        """A-B rdf must equal B-A rdf (reference test_typed_rdf)."""
        n = 27
        model = zoo.LJTypedModel(n - 1)
        sim = make_sim(n=n, a=2.0, kT_init=0.8, dt=0.001)
        import dataclasses
        types = np.zeros(n, dtype=np.int32)
        types[n // 2:] = 1
        sim.state = dataclasses.replace(
            sim.state, types=jnp.asarray(types))
        tfc = htf.tfcompute(model)
        tfc.attach(sim, r_cut=5.0)
        sim.run(10)
        rdfa = np.asarray(model.avg_rdfa.result())
        rdfb = np.asarray(model.avg_rdfb.result())
        assert rdfa.sum() > 0
        np.testing.assert_allclose(rdfa, rdfb, atol=1e-5)


class TestTraining:
    def test_online_force_matching(self):
        """Train a parameterized LJ against built-in LJ labels during MD
        (the hoomd2tf path; reference test_force_output)."""
        n = 25
        r_cut = 3.0
        model = zoo.TrainableGraph(n - 1, output_forces=False)
        # perturb initial params away from truth
        model.lj.w.assign(jnp.asarray([0.6, 1.3]))
        model.compile(optimizer="adam", loss="mse", learning_rate=5e-2)
        sim = make_sim(n=n, a=1.2, kT_init=0.8, dt=0.0,
                       integrator=htf.md.NVE())
        lj = sim.add_force(htf.md.LennardJones(epsilon=1.0, sigma=1.0,
                                               r_cut=r_cut))
        tfc = htf.tfcompute(model)
        tfc.attach(sim, r_cut=r_cut, train=True)
        tfc.set_reference_forces(lj)
        sim.run(150)
        losses = tfc.loss_history
        assert len(losses) == 150
        assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
        # parameters moved toward (sigma=1 -> w close to [?, 1])
        w = np.asarray(model.lj.w.value)
        assert abs(w[1] - 1.0) < 0.35, w

    def test_get_forces_array_returns_labels_in_train_mode(self):
        n = 16
        r_cut = 3.0
        model = zoo.TrainableGraph(n - 1, output_forces=False)
        model.compile(optimizer="adam", loss="mse")
        sim = make_sim(n=n, a=1.5, kT_init=0.5, dt=0.001)
        lj = sim.add_force(htf.md.LennardJones(r_cut=r_cut))
        lj2 = sim.add_force(htf.md.LennardJones(epsilon=4.0, sigma=0.8,
                                                r_cut=r_cut))
        tfc = htf.tfcompute(model)
        tfc.attach(sim, r_cut=r_cut, train=True)
        tfc.set_reference_forces(lj)
        sim.run(5)
        staged = tfc.get_forces_array()
        nlist = sim._build_nlist(sim.state)
        f_lj, _ = lj(sim.state, nlist)
        np.testing.assert_allclose(staged, np.asarray(f_lj), atol=1e-5)

    def test_train_uncompiled_raises(self):
        model = zoo.TrainableGraph(8, output_forces=False)
        sim = make_sim(n=9)
        with pytest.raises(AttributeError):
            htf.tfcompute(model).attach(sim, r_cut=3.0, train=True)

    def test_online_training_batched(self):
        """Train with particle batching active (reference
        test_training_flag uses batch_size=4)."""
        n = 16
        r_cut = 3.0
        model = zoo.TrainableGraph(n - 1, output_forces=False)
        model.lj.w.assign(jnp.asarray([0.6, 1.3]))
        model.compile(optimizer="adam", loss="mse", learning_rate=5e-2)
        sim = make_sim(n=n, a=1.2, kT_init=0.8, dt=0.0)
        lj = sim.add_force(htf.md.LennardJones(r_cut=r_cut))
        tfc = htf.tfcompute(model)
        tfc.attach(sim, r_cut=r_cut, train=True, batch_size=5)
        tfc.set_reference_forces(lj)
        sim.run(100)
        losses = tfc.loss_history
        assert len(losses) == 100
        assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])

    def test_training_flag_switch(self):
        """attach can be re-done with train on/off (reference
        test_training_flag)."""
        n = 9
        model = zoo.TrainModel(4, dim=1, top_neighs=2)
        model.compile(optimizer="adam", loss=["mse", None],
                      learning_rate=1e-2)
        sim = make_sim(n=n, kT_init=0.8, dt=0.001)
        tfc = htf.tfcompute(model)
        tfc.attach(sim, r_cut=5.0, train=True)
        sim.run(10)
        tfc.attach(sim, r_cut=5.0, train=False)
        sim.run(10)


class TestRetrace:
    def test_retrace(self):
        """Python-attribute changes take effect only after retrace_compute
        (reference test_retrace)."""
        n = 9
        model = zoo.TrainModel(4, dim=1, top_neighs=2)
        sim = make_sim(n=n, kT_init=0.8, dt=0.001)
        tfc = htf.tfcompute(model)
        tfc.attach(sim, r_cut=5.0, save_output_period=1)
        sim.run(1)
        assert tfc.outputs[0][-1] != 0
        model.output_zero = True  # no retrace: cached scan still used
        sim.run(1)
        assert tfc.outputs[0][-1] != 0
        model.retrace_compute()
        sim.run(1)
        assert tfc.outputs[0][-1] == 0


class TestCustomNlist:
    def test_in_graph_nlist_cross_check(self):
        """The engine's neighbor distances match an in-compute
        compute_nlist rebuild (reference CustomNlist model)."""
        n = 9
        r_cut = 5.0
        model = zoo.CustomNlist(n - 1, output_forces=False, r_cut=r_cut)
        sim = make_sim(n=n, kT_init=0.5, dt=0.001)
        tfc = htf.tfcompute(model)
        tfc.attach(sim, r_cut=r_cut, save_output_period=1)
        sim.run(2)
        r, cr = tfc.outputs
        np.testing.assert_allclose(np.sort(r, axis=-1),
                                   np.sort(cr, axis=-1), atol=1e-4)


class TestMiscParity:
    def test_wrap_model(self):
        """WrapModel smoke (reference test_wrap)."""
        n = 9
        model = zoo.WrapModel(0, output_forces=False)
        sim = make_sim(n=n, a=4.0)
        tfc = htf.tfcompute(model)
        tfc.attach(sim, r_cut=0)
        sim.run(1)

    def test_print_model(self):
        """In-compute debug printing works under jit (reference
        test_print used tf.print)."""
        import jax
        n = 9

        class PrintModel(htf.SimModel):
            def compute(self, nlist, positions, box):
                rinv = htf.nlist_rinv(nlist)
                energy = jnp.sum(rinv, axis=1)
                jax.debug.print("energy sum: {}", jnp.sum(energy))
                return htf.compute_nlist_forces(nlist, energy)

        model = PrintModel(n - 1)
        sim = make_sim(n=n, kT_init=0.5)
        tfc = htf.tfcompute(model)
        tfc.attach(sim, r_cut=5.0)
        sim.run(2)

    def test_full_batch(self):
        """batch_size == N behaves like unbatched (reference
        test_full_batch)."""
        n = 9
        model = zoo.SimplePotential(n - 1)
        sim = make_sim(n=n, a=4.0, kT_init=1.0)
        tfc = htf.tfcompute(model)
        tfc.attach(sim, r_cut=5.0, batch_size=n)
        sim.run(5)
        sim2 = make_sim(n=n, a=4.0, kT_init=1.0)
        t2 = htf.tfcompute(zoo.SimplePotential(n - 1))
        t2.attach(sim2, r_cut=5.0)
        sim2.run(5)
        np.testing.assert_allclose(tfc.get_forces_array(),
                                   t2.get_forces_array(), atol=1e-5)


class TestEDS:
    def test_eds_convergence(self):
        """EDS drives the collective variable to the set point
        (reference test_utils.py:447-461; stochastic, loose tolerance)."""
        n = 9
        model = zoo.EDSModel(0, set_point=4.0)
        sim = make_sim(n=n, a=4.0, kT_init=0.2, seed=2, dt=0.05)
        tfc = htf.tfcompute(model)
        tfc.attach(sim, r_cut=0, save_output_period=10)
        sim.run(1000)
        assert np.isfinite(np.mean(tfc.outputs[0]))
        cv_avg = float(model.cv_avg.result())
        assert (cv_avg - 4) ** 2 < 0.5, cv_avg


class TestMappedNlist:
    def test_mapped_nlist_separation(self):
        """CG beads and AA particles never mix in the nlist; bead positions
        follow the mapping (reference test_mapped_nlist,
        test_tensorflow.py:581-617)."""
        n = 9
        NN = 10
        model = zoo.MappedNlist(NN, output_forces=False)
        sim = make_sim(n=n, a=4.0, kT_init=0.8, dt=0.001)
        tfc = htf.tfcompute(model)
        aa_group, mapped_group = tfc.enable_mapped_nlist(
            sim, zoo.MappedNlist.my_map)
        assert len(mapped_group) == 2
        assert sim.state.n_particles == n + 2
        tfc.attach(sim, r_cut=5.0, save_output_period=2)
        sim.run(8)
        positions = tfc.outputs[0].reshape(-1, n + 2, 4)
        # mapping applied: first CG bead is the AA centroid
        np.testing.assert_allclose(
            positions[1:, n, :3],
            np.mean(positions[1:, :n, :3], axis=1), atol=1e-5)
        # no mixing between AA and CG neighbor lists
        aa_types = np.unique(tfc.outputs[1][..., -1].astype(int))
        cg_types = np.unique(tfc.outputs[2][..., -1].astype(int))
        assert set(aa_types) & set(cg_types) <= {0}


class TestMappedForces:
    def test_aa_only_forces_padded(self):
        """A mapped model emitting forces only for the all-atom rows runs;
        CG bead rows stay zero."""
        n = 9

        class M(htf.SimModel):
            def compute(self, nlist, positions, box):
                aa_nlist, cg_nlist = self.mapped_nlist(nlist)
                rinv = htf.nlist_rinv(aa_nlist)
                return htf.compute_nlist_forces(
                    aa_nlist, jnp.sum(rinv, axis=1))

        model = M(8)
        sim = make_sim(n=n, a=4.0, kT_init=0.5, dt=0.001)
        tfc = htf.tfcompute(model)
        tfc.enable_mapped_nlist(sim, zoo.MappedNlist.my_map)
        tfc.attach(sim, r_cut=5.0)
        sim.run(3)
        f = tfc.get_forces_array()
        assert f.shape == (n + 2, 4)
        np.testing.assert_allclose(f[n:], 0.0)
        assert np.abs(f[:n, :3]).sum() > 0


class TestGuards:
    def test_overflow_raises_under_jit(self):
        n = 12
        NN = 3  # far too few
        model = zoo.LJModel(NN, check_nlist=True)
        sim = make_sim(n=n, a=1.1, kT_init=0.1, dt=0.0005)
        tfc = htf.tfcompute(model)
        tfc.attach(sim, r_cut=3.0)
        with pytest.raises(ValueError):
            sim.run(2)

    def test_mol_batch_size_conflict(self):
        mol_indices = [[i] for i in range(9)]
        model = zoo.LJMolModel(MN=1, mol_indices=mol_indices,
                               nneighbor_cutoff=8)
        sim = make_sim(n=9)
        with pytest.raises(ValueError):
            htf.tfcompute(model).attach(sim, r_cut=5.0, batch_size=3)


class TestCheckpoint:
    def test_full_resume(self, tmp_path):
        n = 9
        model = zoo.LJModel(n - 1)
        sim = make_sim(n=n, kT_init=0.8, dt=0.001)
        tfc = htf.tfcompute(model)
        tfc.attach(sim, r_cut=5.0)
        sim.run(5)
        path = str(tmp_path / "ckpt.pkl")
        from hoomd_tf_tpu.serialize import save_checkpoint, load_checkpoint
        save_checkpoint(path, model=model, sim=sim, tfc=tfc,
                        extra={"note": 1})
        pos_saved = np.array(sim.state.positions)
        sim.run(5)
        assert np.abs(np.array(sim.state.positions) - pos_saved).max() > 0
        extra = load_checkpoint(path, model=model, sim=sim, tfc=tfc)
        assert extra == {"note": 1}
        np.testing.assert_allclose(np.array(sim.state.positions), pos_saved)
        # resume and the trajectory reproduces exactly
        sim2 = htf.Simulation(dt=0.001, integrator=htf.md.NVE(), seed=1)
        sim2.init_lattice(n, a=4.0, kT_init=0.8)
        tfc2 = htf.tfcompute(zoo.LJModel(n - 1))
        tfc2.attach(sim2, r_cut=5.0)
        load_checkpoint(path, model=tfc2.model, sim=sim2, tfc=tfc2)
        sim.run(7)
        sim2.run(7)
        np.testing.assert_allclose(np.array(sim.state.positions),
                                   np.array(sim2.state.positions),
                                   atol=1e-6)


class TestCheckpointThermostat:
    def test_nvt_state_survives_resume(self, tmp_path):
        """Checkpoint resume preserves the Nose-Hoover degree of freedom
        (exact resume, SURVEY section 5 checkpoint/resume)."""
        from hoomd_tf_tpu.serialize import save_checkpoint, load_checkpoint
        n = 9
        model = zoo.LJModel(n - 1)
        sim = make_sim(n=n, kT_init=0.8, dt=0.002,
                       integrator=htf.md.NVT(kT=0.8, tau=0.3))
        tfc = htf.tfcompute(model)
        tfc.attach(sim, r_cut=5.0)
        sim.run(50)
        xi_before = float(sim.state.thermostat["xi"])
        assert xi_before != 0.0
        path = str(tmp_path / "ckpt.pkl")
        save_checkpoint(path, model=model, sim=sim, tfc=tfc)
        sim.run(25)
        load_checkpoint(path, model=model, sim=sim, tfc=tfc)
        assert float(sim.state.thermostat["xi"]) == xi_before
        sim.run(25)
        a = np.array(sim.state.positions)
        # fresh resume from the same checkpoint reproduces it exactly
        sim2 = make_sim(n=n, kT_init=0.8, dt=0.002,
                        integrator=htf.md.NVT(kT=0.8, tau=0.3))
        t2 = htf.tfcompute(zoo.LJModel(n - 1))
        t2.attach(sim2, r_cut=5.0)
        load_checkpoint(path, model=t2.model, sim=sim2, tfc=t2)
        sim2.run(25)
        np.testing.assert_allclose(a, np.array(sim2.state.positions),
                                   atol=1e-6)


class TestComputePairwise:
    def test_compute_pairwise(self):
        model = zoo.LJModel(4)
        r = np.linspace(0.5, 1.5, 5)
        output = htf.compute_pairwise(model, r)
        assert output[0].shape[0] == len(r)
        # force at r<1 strongly repulsive along x
        assert output[0][0][0, 0] < 0
