import time, functools, dataclasses
import numpy as np
import jax, jax.numpy as jnp
import hoomd_tf_tpu as htf
from hoomd_tf_tpu.ops import cellwise as cw
from hoomd_tf_tpu.md.slots import SlotLayout

n = 65536
sim = htf.Simulation(dt=0.005, seed=0)
sim.init_lattice(n, density=0.4, kT_init=1.2)
rng = np.random.RandomState(0)
sim.state = dataclasses.replace(sim.state, positions=sim.state.positions +
    0.1*jnp.asarray(rng.randn(n,3).astype(np.float32)))
state = sim.state
lengths = np.asarray(htf.box_size(state.box)); lo = np.asarray(state.box[0])
plan = cw.plan_cellwise(n, lengths, 3.0, positions=np.asarray(state.positions),
                        lo=lo, width_blocks=14, drift_per_step=0.02)
print("plan:", plan.grid, plan.capacity, "n_slots:", plan.n_slots)
layout = SlotLayout(plan, n, lo)
ss, aux, _ = layout.pack_jit(state, ())
jax.block_until_ready(ss.positions)

def scan_time(fn, iters=30):
    # chain output into input to serialize
    @functools.partial(jax.jit, static_argnums=1)
    def run(p, k):
        def body(p, _):
            out = fn(p)
            return p + 1e-20 * out, ()
        return jax.lax.scan(body, p, None, length=k)[0]
    jax.block_until_ready(run(ss.positions, 1))
    jax.block_until_ready(run(ss.positions, iters))
    t0=time.perf_counter(); jax.block_until_ready(run(ss.positions, 1)); t1=time.perf_counter()
    t2=time.perf_counter(); jax.block_until_ready(run(ss.positions, iters)); t3=time.perf_counter()
    return ((t3-t2)-(t1-t0))/(iters-1)*1e3

# a) argsort of cell keys
def f_sort(p):
    cell = cw.bin_cells(p, layout.lo, plan)
    order = jnp.argsort(cell)
    return order[:1].astype(p.dtype) * jnp.ones_like(p[:1])
print("argsort keys      :", round(scan_time(f_sort),3), "ms")

# b) full repack_src
def f_src(p):
    src, ovf = cw.repack_src(p, aux["valid"], layout.lo, plan)
    return src[:1].astype(p.dtype) * jnp.ones_like(p[:1])
print("repack_src        :", round(scan_time(f_src),3), "ms")

# c) src + one 3-col gather
src0, _ = jax.jit(lambda p: cw.repack_src(p, aux["valid"], layout.lo, plan))(ss.positions)
has0 = src0 < plan.n_slots
def f_gather3(p):
    g = jnp.where(has0[:,None], p[jnp.minimum(src0, p.shape[0]-1)], 0.0)
    return g[:1]
print("one [.,3] gather  :", round(scan_time(f_gather3),3), "ms")

# d) full rebuild
def f_rebuild(p):
    st = dataclasses.replace(ss, positions=p)
    new_state, new_aux, _ = layout.rebuild(st, aux, ())
    return new_state.positions[:1]
print("full rebuild      :", round(scan_time(f_rebuild),3), "ms")
