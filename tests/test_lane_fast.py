"""Lane-separability probe for generic SimModels (ops/lane_fast.py).

The reference's users write pair potentials as generic computes (e.g.
``build_examples.py:31-43`` LJModel); these tests pin that the engine
auto-detects that structure, routes it through the analytic cellwise
kernel, and *refuses* the fast path for any model whose energy is not a
sum of independent per-lane terms.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

import hoomd_tf_tpu as htf


class GenericLJ(htf.SimModel):
    def compute(self, nlist, positions, box):
        rinv = htf.nlist_rinv(nlist)
        e = jnp.sum(2.0 * (rinv ** 12 - rinv ** 6), axis=1)
        return htf.compute_nlist_forces(nlist, e)


class TypedLJ(htf.SimModel):
    """Per-type-pair epsilon through the nlist type column + positions
    type column -- separable, but only with the (ti, tj) probe planes."""

    def compute(self, nlist, positions, box):
        from hoomd_tf_tpu.ops.direct import NlistPlanes
        if isinstance(nlist, NlistPlanes):
            r2, tj = nlist.r2(), nlist.type
        else:
            r2 = jnp.sum(nlist[..., :3] ** 2, axis=-1)
            tj = nlist[..., 3]
        pad = r2 > 0
        rinv2 = jnp.where(pad, 1.0 / jnp.maximum(r2, 1e-4),
                          jnp.zeros_like(r2))
        eps = 0.5 + 0.25 * (positions[:, 3][:, None] + tj)
        u = 4.0 * eps * (rinv2 ** 6 - rinv2 ** 3)
        e = 0.5 * jnp.sum(jnp.where(pad, u, 0.0), axis=1)
        return htf.compute_nlist_forces(nlist, e)


class CrossLane(htf.SimModel):
    """Energy quadratic in the lane sum -- NOT separable."""

    def compute(self, nlist, positions, box):
        rinv = htf.nlist_rinv(nlist)
        s = jnp.sum(rinv ** 6, axis=1)
        return htf.compute_nlist_forces(nlist, 0.01 * s * s)


class WithFieldForce(htf.SimModel):
    """Pair term plus a position-dependent harmonic field -- the field
    force is invisible to a pair_fn, so the probe must reject it."""

    def compute(self, nlist, positions, box):
        rinv = htf.nlist_rinv(nlist)
        e = jnp.sum(2.0 * (rinv ** 12 - rinv ** 6), axis=1)
        f_pair = htf.compute_nlist_forces(nlist, e)
        f_field = htf.compute_positions_forces(
            positions, 0.05 * jnp.sum(positions[:, :3] ** 2, axis=-1))
        return f_pair + f_field


def _sim(model, n=256, mode="cellwise", kT=1.0, two_types=False):
    sim = htf.Simulation(dt=0.005, integrator=htf.md.NVE(), seed=11)
    sim.init_lattice(n=n, density=0.3, kT_init=kT)
    if two_types:
        types = jnp.asarray(np.arange(n) % 2, dtype=jnp.int32)
        sim.state = dataclasses.replace(sim.state, types=types)
    tfc = htf.tfcompute(model)
    tfc.attach(sim, r_cut=2.5, nlist=mode)
    return sim, tfc


@pytest.mark.slow
def test_separable_detected_and_matches():
    s1, t1 = _sim(GenericLJ(48))
    s2, _ = _sim(GenericLJ(48), mode="cell")
    s1.run(20)
    assert t1._lane_fast_ok is True
    s2.run(20)
    np.testing.assert_allclose(np.asarray(s1.state.positions),
                               np.asarray(s2.state.positions),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(s1.state.velocities),
                               np.asarray(s2.state.velocities),
                               rtol=1e-2, atol=5e-3)


@pytest.mark.slow
def test_typed_separable():
    s1, t1 = _sim(TypedLJ(48), two_types=True)
    s2, _ = _sim(TypedLJ(48), mode="cell", two_types=True)
    s1.run(20)
    assert t1._lane_fast_ok is True
    s2.run(20)
    np.testing.assert_allclose(np.asarray(s1.state.positions),
                               np.asarray(s2.state.positions),
                               rtol=1e-3, atol=2e-3)


@pytest.mark.slow
def test_cross_lane_rejected():
    s1, t1 = _sim(CrossLane(48))
    s2, _ = _sim(CrossLane(48), mode="cell")
    s1.run(15)
    assert t1._lane_fast_ok is False
    # and the generic route still runs the right physics
    s2.run(15)
    np.testing.assert_allclose(np.asarray(s1.state.positions),
                               np.asarray(s2.state.positions),
                               rtol=1e-3, atol=2e-3)


@pytest.mark.slow
def test_position_force_rejected():
    s1, t1 = _sim(WithFieldForce(48))
    s2, _ = _sim(WithFieldForce(48), mode="cell")
    s1.run(15)
    assert t1._lane_fast_ok is False
    s2.run(15)
    np.testing.assert_allclose(np.asarray(s1.state.positions),
                               np.asarray(s2.state.positions),
                               rtol=1e-3, atol=2e-3)


@pytest.mark.slow
def test_env_opt_out(monkeypatch):
    monkeypatch.setenv("HTF_LANE_FAST", "0")
    s1, t1 = _sim(GenericLJ(48))
    s1.run(5)
    assert t1._lane_fast_ok is False


@pytest.mark.slow
def test_pair_model_untouched():
    """PairModel keeps its declared fast path (no probe)."""

    class LJPair(htf.PairModel):
        def pair_energy(self, r2):
            rinv2 = 1.0 / r2
            return 4.0 * (rinv2 ** 6 - rinv2 ** 3)

    s1, t1 = _sim(LJPair(48))
    s1.run(5)
    assert getattr(t1, "_lane_fast_ok", False) is False
    assert np.isfinite(np.asarray(s1.state.positions)).all()


def test_smoke_probe_verdicts():
    """Fast subsystem smoke (the full parity tests are @slow): the probe
    accepts a separable model and rejects a cross-lane one, on a tiny
    system with one short scan each."""
    s1, t1 = _sim(GenericLJ(24), n=128)
    s1.run(3)
    assert t1._lane_fast_ok is True
    s2, t2 = _sim(CrossLane(24), n=128)
    s2.run(3)
    assert t2._lane_fast_ok is False
