"""Round-3 probe 3: (a) is the integrator/cond cost the [N,3] padding
tax? Measure NVT-ish update on [n,3] arrays vs component-separated [n]
arrays. (b) bf16-lane kernel, dtype-fixed, vs f32.
"""
import time, functools, dataclasses
import numpy as np
import jax, jax.numpy as jnp
import hoomd_tf_tpu as htf
from hoomd_tf_tpu.ops import cellwise as cw
from hoomd_tf_tpu.ops.cellwise_pallas import half_stencil_pair_forces
from hoomd_tf_tpu.md.slots import SlotLayout

n = 65536
sim = htf.Simulation(dt=0.005, seed=0)
sim.init_lattice(n, density=0.4, kT_init=1.2)
rng = np.random.RandomState(0)
sim.state = dataclasses.replace(sim.state, positions=sim.state.positions +
    0.1*jnp.asarray(rng.randn(n,3).astype(np.float32)))
state = sim.state
lengths = np.asarray(htf.box_size(state.box)); lo = np.asarray(state.box[0])

def pair_fn(r2):
    u = 1.0 / r2
    sr6 = u * u * u
    return (4.0 * (sr6 * sr6 - sr6),
            -12.0 * (2.0 * sr6 - 1.0) * sr6 * u)

plan = cw.plan_cellwise(n, lengths, 3.0, positions=np.asarray(state.positions),
                        lo=lo, width_blocks=14, drift_per_step=0.02)
layout = SlotLayout(plan, n, lo)
ss, aux, _ = layout.pack_jit(state, ())
jax.block_until_ready(ss.positions)
valid = aux["valid"]
ns = ss.positions.shape[0]
print("n_slots", ns, "cells", plan.n_cells, "cap", plan.capacity)

def scan_time(fn, arg, iters=30):
    @functools.partial(jax.jit, static_argnums=1)
    def run(p, k):
        def body(c, _):
            return fn(c), ()
        return jax.lax.scan(body, p, None, length=k)[0]
    jax.block_until_ready(run(arg, 1))
    jax.block_until_ready(run(arg, iters))
    t0=time.perf_counter(); jax.block_until_ready(run(arg, 1)); t1=time.perf_counter()
    t2=time.perf_counter(); jax.block_until_ready(run(arg, iters)); t3=time.perf_counter()
    return ((t3-t2)-(t1-t0))/(iters-1)*1e3

# ---- (a1) integrator math alone on [n,3] arrays ----
f3 = jnp.asarray(rng.randn(ns,3).astype(np.float32))
def integ3(c):
    p, v = c
    v = v + 0.0025 * f3
    ke = 0.5 * jnp.sum(v * v)
    v = v * (1.0 - 1e-12 * ke)
    p = p + 0.005 * v * valid[:, None]
    v = v + 0.0025 * f3
    return (p, v)
v0 = jnp.zeros_like(ss.positions)
print("a1) integrator on [n,3]      :", round(scan_time(integ3, (ss.positions, v0)), 3), "ms")

# ---- (a2) same math, component-separated [n] arrays ----
fx, fy, fz = f3[:,0], f3[:,1], f3[:,2]
def integ1(c):
    px, py, pz, vx, vy, vz = c
    vx = vx + 0.0025 * fx; vy = vy + 0.0025 * fy; vz = vz + 0.0025 * fz
    ke = 0.5 * (jnp.sum(vx*vx) + jnp.sum(vy*vy) + jnp.sum(vz*vz))
    s = (1.0 - 1e-12 * ke)
    vx = vx * s; vy = vy * s; vz = vz * s
    px = px + 0.005 * vx * valid; py = py + 0.005 * vy * valid
    pz = pz + 0.005 * vz * valid
    vx = vx + 0.0025 * fx; vy = vy + 0.0025 * fy; vz = vz + 0.0025 * fz
    return (px, py, pz, vx, vy, vz)
args1 = (ss.positions[:,0], ss.positions[:,1], ss.positions[:,2],
         v0[:,0], v0[:,1], v0[:,2])
print("a2) integrator separated [n] :", round(scan_time(integ1, args1), 3), "ms")

# ---- (a3) wide-cond pass-through on [n,3] state vs separated ----
def cond3(c):
    p, v = c
    drift = jnp.max(jnp.abs(p))
    p, v = jax.lax.cond(drift > 1e9,
                        lambda a: (a[0] + 1.0, a[1]),
                        lambda a: a, (p, v))
    return (p + 1e-20 * v, v)
print("a3) cond pass-thru [n,3]     :", round(scan_time(cond3, (ss.positions, v0)), 3), "ms")

def cond1(c):
    px, py, pz, vx, vy, vz = c
    drift = jnp.max(jnp.abs(px))
    out = jax.lax.cond(drift > 1e9,
                       lambda a: tuple(x + 1.0 for x in a),
                       lambda a: a, c)
    px, py, pz, vx, vy, vz = out
    return (px + 1e-20*vx, py + 1e-20*vy, pz + 1e-20*vz, vx, vy, vz)
print("a3) cond pass-thru separated :", round(scan_time(cond1, args1), 3), "ms")

# ---- (b) bf16-lane kernel: cast candidate planes only, f32 out ----
from hoomd_tf_tpu.ops.cellwise import _relative_coords, _roll_back, _HALF_OFFS
def f_bf16(p):
    f4, _ = half_stencil_pair_forces(p, None, valid, plan, layout.lo,
                                     pair_fn, needs_energy=False,
                                     lane_dtype=jnp.bfloat16)
    return p + 1e-20 * f4[:, :3]
try:
    print("b) bf16-lane force           :", round(scan_time(f_bf16, ss.positions), 3), "ms")
except TypeError as e:
    print("b) bf16: no lane_dtype arg yet:", repr(e)[:80])
except Exception as e:
    print("b) bf16 failed:", repr(e).splitlines()[0][:140])
