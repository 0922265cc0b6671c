"""Built-in potential model families."""

import pytest
import jax.numpy as jnp
import numpy as np

import hoomd_tf_tpu as htf
import zoo


def make_inputs(n=16, NN=12, a=1.3, seed=0, r_cut=3.0):
    pos, lengths = htf.md.lattice_positions(n, a=a)
    rng = np.random.RandomState(seed)
    pos = pos + 0.05 * rng.randn(*pos.shape).astype(np.float32)
    pos4 = np.concatenate([pos, np.zeros((n, 1), np.float32)], axis=1)
    nlist = htf.compute_nlist(jnp.asarray(pos4), r_cut, NN, lengths,
                              sorted=True, return_types=True)
    return [nlist, jnp.asarray(pos4), htf.box_from_lengths(lengths)]


class TestLJPotential:
    def test_matches_zoo_lj(self):
        inputs = make_inputs()
        builtin = htf.LJPotential(12)
        handwritten = zoo.LJModel(12)
        np.testing.assert_allclose(
            np.asarray(builtin(inputs)[0]),
            np.asarray(handwritten(inputs)[0]), rtol=1e-4, atol=1e-5)

    def test_virial(self):
        builtin = htf.LJPotential(12, virial=True)
        f, w = builtin(make_inputs())
        assert w.shape == (16, 3, 3)


class TestTrainableLJ:
    def test_force_matching_converges(self):
        # dense configuration: strong repulsive forces make eps/sigma
        # identifiable (at lattice spacings near the potential minimum a
        # single frame under-determines them)
        inputs = make_inputs(a=1.05)
        truth = htf.LJPotential(12)
        labels = truth(inputs)[0]
        model = htf.TrainableLJ(12, epsilon=0.5, sigma=1.2)
        model.compile(optimizer="adam", loss="mse", learning_rate=2e-2)
        losses = [float(model.train_on_batch(inputs, labels))
                  for _ in range(300)]
        assert losses[-1] < losses[0] * 1e-3, (losses[0], losses[-1])
        pred = np.asarray(model(inputs)[0][:, :3])
        ref = np.asarray(labels[:, :3])
        scale = np.abs(ref).max()
        np.testing.assert_allclose(pred, ref, atol=0.1 * scale)


class TestNeuralPairPotential:
    def test_runs_and_trains(self):
        inputs = make_inputs()
        truth = htf.LJPotential(12)
        labels = truth(inputs)[0]
        model = htf.NeuralPairPotential(12, hidden=16, layers=1, count=8)
        model.compile(optimizer="adam", loss="mse", learning_rate=1e-2)
        l0 = float(model.train_on_batch(inputs, labels))
        for _ in range(30):
            l1 = float(model.train_on_batch(inputs, labels))
        assert np.isfinite(l1)
        assert l1 < l0, (l0, l1)

    @pytest.mark.slow
    def test_zero_rows_zero_force(self):
        # isolated particles (no neighbors) must feel zero force
        n, NN = 4, 6
        pos4 = np.zeros((n, 4), np.float32)
        pos4[:, 0] = np.arange(n) * 20.0 - 30
        nlist = htf.compute_nlist(jnp.asarray(pos4), 3.0, NN,
                                  [100.0, 100, 100], sorted=True,
                                  return_types=True)
        model = htf.NeuralPairPotential(NN, hidden=8, layers=1, count=4)
        f = np.asarray(model([nlist, jnp.asarray(pos4),
                              htf.box_from_lengths([100.0, 100, 100])])[0])
        np.testing.assert_allclose(f[:, :3], 0.0, atol=1e-6)
