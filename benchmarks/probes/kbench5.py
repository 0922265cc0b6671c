"""Incrementally rebuild the engine step around the pallas kernel to find
where the ~0.9ms of non-force time goes at 64k."""
import time, functools, dataclasses
import numpy as np
import jax, jax.numpy as jnp
import hoomd_tf_tpu as htf
from hoomd_tf_tpu.ops import cellwise as cw
from hoomd_tf_tpu.ops.cellwise_pallas import half_stencil_pair_forces
from hoomd_tf_tpu.md.slots import SlotLayout
from hoomd_tf_tpu.md import integrators as integ_mod

n = 65536
sim = htf.Simulation(dt=0.005, seed=0)
sim.init_lattice(n, density=0.4, kT_init=1.2)
rng = np.random.RandomState(0)
sim.state = dataclasses.replace(sim.state, positions=sim.state.positions +
    0.1*jnp.asarray(rng.randn(n,3).astype(np.float32)))
state = sim.state
lengths = np.asarray(htf.box_size(state.box)); lo = np.asarray(state.box[0])
plan = cw.plan_cellwise(n, lengths, 3.0, positions=np.asarray(state.positions), lo=lo)
print("plan:", plan.grid, plan.capacity, "skin:", round(plan.skin,3))
layout = SlotLayout(plan, n, lo)
ss, aux, _ = layout.pack_jit(state, ())
jax.block_until_ready(ss.positions)
integ = integ_mod.NVT(kT=1.2, tau=0.5)
ss = dataclasses.replace(ss, thermostat={**integ.init(ss), "dof": ss.thermostat["dof"]})
dt = 0.005

def lj(r2):
    u = 1.0/r2; sr6 = u*u*u
    return 4.0*(sr6*sr6-sr6), -12.0*(2.0*sr6-1.0)*sr6*u

def force(st, ax):
    f4, _ = half_stencil_pair_forces(st.positions, st.types, ax["valid"],
                                     plan, layout.lo, lj, block_cells=8)
    return f4 * ax["valid"][:, None]

def mk(step):
    @functools.partial(jax.jit, static_argnums=2)
    def run(st, ax, k):
        (st, ax), _ = jax.lax.scan(lambda c, _: (step(*c), ()), (st, ax), None, length=k)
        return st, ax
    return run

def timeit(name, step, iters=50):
    run = mk(step)
    jax.block_until_ready(run(ss, aux, 1)[0].positions)
    jax.block_until_ready(run(ss, aux, iters)[0].positions)
    t0=time.perf_counter(); jax.block_until_ready(run(ss, aux, 1)[0].positions); t1=time.perf_counter()
    t2=time.perf_counter(); jax.block_until_ready(run(ss, aux, iters)[0].positions); t3=time.perf_counter()
    print(f"{name}: {((t3-t2)-(t1-t0))/(iters-1)*1e3:.3f} ms")

# 1. force only
def s1(st, ax):
    f = force(st, ax)
    return dataclasses.replace(st, forces=f), ax
timeit("force only                 ", s1)

# 2. + NVT integrate (pre/post), ghost pins
def s2(st, ax):
    st = integ.pre_force(st, dt)
    st = layout.ghost_pin(st, ax)
    f = force(st, ax)
    st = dataclasses.replace(st, forces=f)
    st = integ.post_force(st, dt)
    st = layout.ghost_pin(st, ax)
    return dataclasses.replace(st, step=st.step+1), ax
timeit("+ NVT + ghost pins         ", s2)

# 3. + repack cond
def s3(st, ax):
    st = integ.pre_force(st, dt)
    st = layout.ghost_pin(st, ax)
    def do(args):
        a, b = layout.rebuild(args[0], args[1], ())[:2]
        return a, b
    st, ax = jax.lax.cond(layout.needs_rebuild(st, ax), do, lambda x: x, (st, ax))
    f = force(st, ax)
    st = dataclasses.replace(st, forces=f)
    st = integ.post_force(st, dt)
    st = layout.ghost_pin(st, ax)
    return dataclasses.replace(st, step=st.step+1), ax
timeit("+ repack cond              ", s3)
