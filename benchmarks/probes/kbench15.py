"""Round-3 probe 8: phase breakdown of the honest 64k production step.

kbench14 found: production 2.80 ms/step, slim force call 1.46 ms. Where
does the other 1.34 ms go? Candidates: NVT integrator halves + ghost
pins, the rebuild lax.cond's pass-through rewrite, the amortized repack
itself, and the scan/dispatch machinery of run().

Variants (all identical force route: Pallas half-stencil, slim):
  V0 : force only
  V1 : NVT pre + pin + force + mask + post + pin        (no rebuild)
  V2 : V1 + lax.cond(False) rebuild                     (cond overhead)
  V3 : V1 + lax.cond(needs_rebuild) rebuild             (production shape)
plus: repack fire count over 1000 steps, single rebuild() latency.
"""
import dataclasses
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import hoomd_tf_tpu as htf
from hoomd_tf_tpu.ops import cellwise as cw
from hoomd_tf_tpu.ops.cellwise_pallas import half_stencil_pair_forces

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_htf"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

n = 65536


class LJ(htf.PairModel):
    def pair_energy(self, r2):
        u = 1.0 / r2
        sr6 = u * u * u
        return 4.0 * (sr6 * sr6 - sr6)

    def pair_energy_and_slope(self, r2):
        u = 1.0 / r2
        sr6 = u * u * u
        return (4.0 * (sr6 * sr6 - sr6),
                -12.0 * (2.0 * sr6 - 1.0) * sr6 * u)


model = LJ(64)
sim = htf.Simulation(dt=0.005, integrator=htf.md.Minimize(max_disp=0.05),
                     seed=0)
sim.init_lattice(n, density=0.4, kT_init=1.5)
rng = np.random.RandomState(0)
sim.state = dataclasses.replace(
    sim.state, positions=sim.state.positions +
    0.3 * jnp.asarray(rng.randn(n, 3).astype(np.float32)))
tfc = htf.tfcompute(model)
tfc.attach(sim, r_cut=3.0, nlist="cellwise")
sim.run(60)
sim.thermalize_velocities(1.5)
sim.integrator = htf.md.NVT(kT=1.5, tau=0.5)
sim.run(1000)
jax.block_until_ready(sim.state.positions)
for _ in range(4):
    plan_before = sim._layout.plan if sim._layout else None
    sim.run(1000)
    jax.block_until_ready(sim.state.positions)
    if sim._layout is None or sim._layout.plan == plan_before:
        break

t0 = time.perf_counter()
sim.run(1000)
jax.block_until_ready(sim.state.positions)
prod_ms = time.perf_counter() - t0
print(f"production: {prod_ms:.3f} ms/step ({1000/prod_ms:.1f} steps/s)")

layout = sim._layout
plan = layout.plan
print(f"plan: grid={plan.grid}, cap={plan.capacity}, skin={plan.skin:.3f}")
ss, aux, _ = layout.pack_jit(sim.state, ())
jax.block_until_ready(ss.positions)
integ = sim.integrator
dt = sim.dt


def pair_fn(r2):
    u = 1.0 / r2
    sr6 = u * u * u
    return (4.0 * (sr6 * sr6 - sr6),
            -12.0 * (2.0 * sr6 - 1.0) * sr6 * u)


def force4(state, aux):
    f4, _ = half_stencil_pair_forces(
        state.positions, state.types, aux["valid"], plan, layout.lo,
        pair_fn, needs_energy=False)
    return f4


def v0_step(carry, _):
    state, aux = carry
    f4 = force4(state, aux)
    state = dataclasses.replace(
        state, positions=state.positions + 1e-20 * f4[:, :3])
    return (state, aux), ()


def body_core(state, aux):
    state = integ.pre_force(state, dt)
    state = layout.ghost_pin(state, aux)
    f4 = force4(state, aux)
    f4 = f4 * aux["valid"][:, None]
    state = dataclasses.replace(state, forces=f4)
    state = integ.post_force(state, dt)
    state = layout.ghost_pin(state, aux)
    return state


def v1_step(carry, _):
    state, aux = carry
    return (body_core(state, aux), aux), ()


def mk_cond_step(pred_fn):
    def step(carry, _):
        state, aux = carry

        def do_rebuild(args):
            st, ax, _ = layout.rebuild(args[0], args[1], ())
            return (st, ax)

        state, aux = jax.lax.cond(pred_fn(state, aux), do_rebuild,
                                  lambda a: a, (state, aux))
        return (body_core(state, aux), aux), ()
    return step


v2_step = mk_cond_step(lambda s, a: jnp.asarray(False))
v3_step = mk_cond_step(layout.needs_rebuild)


def scan_time(step, carry, iters=1000):
    @functools.partial(jax.jit, static_argnums=1)
    def run(c, k):
        return jax.lax.scan(step, c, None, length=k)[0]
    jax.block_until_ready(run(carry, 1))
    jax.block_until_ready(run(carry, iters))
    t0 = time.perf_counter(); jax.block_until_ready(run(carry, 1))
    t1 = time.perf_counter()
    t2 = time.perf_counter(); jax.block_until_ready(run(carry, iters))
    t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / (iters - 1) * 1e3


c0 = (ss, aux)
print("V0 force only        :", round(scan_time(v0_step, c0), 3), "ms")
print("V1 +NVT+pins         :", round(scan_time(v1_step, c0), 3), "ms")
print("V2 +cond(False)      :", round(scan_time(v2_step, c0), 3), "ms")
print("V3 +cond(needs)      :", round(scan_time(v3_step, c0), 3), "ms")


# repack fire count over 1000 production-like steps
def count_step(carry, _):
    state, aux, k = carry
    fire = layout.needs_rebuild(state, aux)

    def do_rebuild(args):
        st, ax, _ = layout.rebuild(args[0], args[1], ())
        return (st, ax)

    state, aux = jax.lax.cond(fire, do_rebuild, lambda a: a, (state, aux))
    return (body_core(state, aux), aux, k + fire.astype(jnp.int32)), ()


@jax.jit
def count_run(c):
    return jax.lax.scan(count_step, c, None, length=1000)[0]


fires = int(count_run((ss, aux, jnp.asarray(0, jnp.int32)))[2])
print(f"repack fires/1000 steps: {fires}")


# single rebuild latency
@jax.jit
def one_rebuild(state, aux):
    st, ax, _ = layout.rebuild(state, aux, ())
    return st.positions, ax["valid"]


jax.block_until_ready(one_rebuild(ss, aux))
t0 = time.perf_counter()
for _ in range(20):
    jax.block_until_ready(one_rebuild(ss, aux))
t1 = time.perf_counter()
print(f"one rebuild(): {(t1-t0)/20*1e3:.3f} ms")
