"""Round-3 probe 4: engine-shaped step (force kernel + NVT-ish update +
rebuild cond) with three carry layouts:
  A) AoS carry [n,3] (today's engine)
  B) SoA carry ([n] components), math still AoS via stack/split views
  C) SoA carry, SoA math (no [n,3] anywhere)
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

centers = cw.slot_cell_centers(plan, layout.lo, jnp.float32)

def aos_math(p, v, p0):
    """NVT-ish: cond(rebuild) -> force -> kick -> rescale -> drift -> pin."""
    drift = jnp.max(jnp.abs(p - p0))
    def rebuild(args):
        pp, vv, _ = args
        src, ovf = cw.repack_src(pp, valid, layout.lo, plan)
        has = (src < ns)[:, None]
        pp2 = jnp.where(has, pp[jnp.minimum(src, ns - 1)], centers)
        vv2 = jnp.where(has, vv[jnp.minimum(src, ns - 1)], 0.0)
        return (pp2, vv2, pp2)
    p, v, p0 = jax.lax.cond(drift > 1e9, rebuild, lambda a: a, (p, v, p0))
    f4, _ = half_stencil_pair_forces(p, None, valid, plan, layout.lo,
                                     pair_fn, needs_energy=False)
    f = f4[:, :3] * valid[:, None]
    v = v + 0.0025 * f
    ke = 0.5 * jnp.sum(v * v)
    v = v * (1.0 - 1e-12 * ke)
    p = p + 0.005 * v * valid[:, None]
    v = v + 0.0025 * f
    return p, v, p0

# ---- A) AoS carry ----
def stepA(c):
    return aos_math(*c)
v0 = jnp.zeros_like(ss.positions)
print("A) AoS carry                :", round(scan_time(stepA, (ss.positions, v0, ss.positions)), 3), "ms")

# ---- B) SoA carry, AoS math via views ----
def split(a):
    return (a[:, 0], a[:, 1], a[:, 2])
def stepB(c):
    p = jnp.stack(c[0:3], axis=-1)
    v = jnp.stack(c[3:6], axis=-1)
    p0 = jnp.stack(c[6:9], axis=-1)
    p, v, p0 = aos_math(p, v, p0)
    return split(p) + split(v) + split(p0)
argB = split(ss.positions) + split(v0) + split(ss.positions)
print("B) SoA carry / AoS math     :", round(scan_time(stepB, argB), 3), "ms")

# ---- C) SoA carry, SoA math ----
def stepC(c):
    px, py, pz, vx, vy, vz, qx, qy, qz = c
    drift = jnp.maximum(jnp.max(jnp.abs(px - qx)),
                        jnp.maximum(jnp.max(jnp.abs(py - qy)),
                                    jnp.max(jnp.abs(pz - qz))))
    def rebuild(args):
        px, py, pz, vx, vy, vz = args[:6]
        pp = jnp.stack([px, py, pz], axis=-1)
        src, ovf = cw.repack_src(pp, valid, layout.lo, plan)
        has = src < ns
        g = jnp.minimum(src, ns - 1)
        out = []
        for i, a in enumerate((px, py, pz)):
            out.append(jnp.where(has, a[g], centers[:, i]))
        for a in (vx, vy, vz):
            out.append(jnp.where(has, a[g], 0.0))
        return tuple(out) + tuple(out[:3])
    out = jax.lax.cond(drift > 1e9, rebuild, lambda a: a[:6] + a[6:9], c)
    px, py, pz, vx, vy, vz = out[:6]
    qx, qy, qz = out[6:9]
    p = jnp.stack([px, py, pz], axis=-1)   # kernel still takes [n,3]
    f4, _ = half_stencil_pair_forces(p, None, valid, plan, layout.lo,
                                     pair_fn, needs_energy=False)
    fx, fy, fz = f4[:, 0] * valid, f4[:, 1] * valid, f4[:, 2] * valid
    vx = vx + 0.0025 * fx; vy = vy + 0.0025 * fy; vz = vz + 0.0025 * fz
    ke = 0.5 * (jnp.sum(vx*vx) + jnp.sum(vy*vy) + jnp.sum(vz*vz))
    s = 1.0 - 1e-12 * ke
    vx = vx*s; vy = vy*s; vz = vz*s
    px = px + 0.005 * vx * valid; py = py + 0.005 * vy * valid
    pz = pz + 0.005 * vz * valid
    vx = vx + 0.0025 * fx; vy = vy + 0.0025 * fy; vz = vz + 0.0025 * fz
    return (px, py, pz, vx, vy, vz, qx, qy, qz)
print("C) SoA carry / SoA math     :", round(scan_time(stepC, argB), 3), "ms")
