"""Round-3 probe 2: decompose the 1.71 ms step tail, and measure
(a) slim force kernel alone, (b) + integrator/pins, (c) + rebuild cond,
(d) bf16-lane kernel variant, (e) scan_block dispatch overhead.
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

def scan_time(fn, arg, iters=30):
    @functools.partial(jax.jit, static_argnums=1)
    def run(p, k):
        def body(c, _):
            return fn(c), ()
        return jax.lax.scan(body, arg if False else p, None, length=k)[0]
    jax.block_until_ready(run(arg, 1))
    jax.block_until_ready(run(arg, iters))
    t0=time.perf_counter(); jax.block_until_ready(run(arg, 1)); t1=time.perf_counter()
    t2=time.perf_counter(); jax.block_until_ready(run(arg, iters)); t3=time.perf_counter()
    return ((t3-t2)-(t1-t0))/(iters-1)*1e3

# (a) slim force alone (positions -> positions + eps*f)
def f_force(p):
    f4, _ = half_stencil_pair_forces(p, None, valid, plan, layout.lo,
                                     pair_fn, needs_energy=False)
    return p + 1e-20 * f4[:, :3]
print("a) slim force alone          :", round(scan_time(f_force, ss.positions), 3), "ms")

# (b) + velocity-verlet-ish update + ghost pin (state-shaped carry)
def f_integ(c):
    p, v = c
    f4, _ = half_stencil_pair_forces(p, None, valid, plan, layout.lo,
                                     pair_fn, needs_energy=False)
    f = f4[:, :3] * valid[:, None]
    v = v + 0.005 * f
    ke = 0.5 * jnp.sum(v * v)
    v = v * (1.0 - 1e-12 * ke)          # NVT-ish rescale w/ reduction
    p = p + 0.005 * v * valid[:, None]  # ghost rows pinned
    return (p, v)
v0 = jnp.zeros_like(ss.positions)
print("b) force+integrator+pin      :", round(scan_time(f_integ, (ss.positions, v0)), 3), "ms")

# (c) + the rebuild cond (never fires in this probe)
def f_cond(c):
    p, v, p0 = c
    drift = jnp.max(jnp.abs(p - p0))
    def rebuild(args):
        pp, vv, _ = args
        src, ovf = cw.repack_src(pp, valid, layout.lo, plan)
        pp2 = jnp.where((src >= 0)[:, None], pp[jnp.maximum(src, 0)], pp)
        return (pp2, vv, pp2)
    p, v, p0 = jax.lax.cond(drift > 1e9, rebuild, lambda a: a, (p, v, p0))
    f4, _ = half_stencil_pair_forces(p, None, valid, plan, layout.lo,
                                     pair_fn, needs_energy=False)
    f = f4[:, :3] * valid[:, None]
    v = v + 0.005 * f
    ke = 0.5 * jnp.sum(v * v)
    v = v * (1.0 - 1e-12 * ke)
    p = p + 0.005 * v * valid[:, None]
    return (p, v, p0)
print("c) + rebuild cond (cold)     :", round(scan_time(f_cond, (ss.positions, v0, ss.positions)), 3), "ms")

# (d) bf16 lanes: inputs cast to bf16, f32 step math
def f_bf16(p):
    f4, _ = half_stencil_pair_forces(p.astype(jnp.bfloat16), None,
                                     valid.astype(jnp.bfloat16), plan,
                                     layout.lo, pair_fn, needs_energy=False)
    return p + 1e-20 * f4[:, :3].astype(jnp.float32)
try:
    print("d) bf16-lane force           :", round(scan_time(f_bf16, ss.positions), 3), "ms")
except Exception as e:
    print("d) bf16-lane force failed    :", repr(e).splitlines()[0][:120])
