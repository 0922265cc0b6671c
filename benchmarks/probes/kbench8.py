"""Round-3 probe: where do 1.81 ms/step go at 64k, and is the plan optimal?

Times (scan-measured, v5e): the Pallas half-stencil force eval under the
production plan and variants (block_cells sweep, forced cap 24, no-energy
kernel), plus the full engine step for reference.
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

def scan_time(fn, arg, iters=30):
    @functools.partial(jax.jit, static_argnums=1)
    def run(p, k):
        def body(p, _):
            out = fn(p)
            return p + 1e-20 * out, ()
        return jax.lax.scan(body, p, None, length=k)[0]
    jax.block_until_ready(run(arg, 1))
    jax.block_until_ready(run(arg, iters))
    t0=time.perf_counter(); jax.block_until_ready(run(arg, 1)); t1=time.perf_counter()
    t2=time.perf_counter(); jax.block_until_ready(run(arg, iters)); t3=time.perf_counter()
    return ((t3-t2)-(t1-t0))/(iters-1)*1e3

def force_probe(plan, label, **kw):
    layout = SlotLayout(plan, n, lo)
    ss, aux, _ = layout.pack_jit(state, ())
    jax.block_until_ready(ss.positions)
    def f(p):
        f4, _ = half_stencil_pair_forces(p, None, aux["valid"], plan,
                                         layout.lo, pair_fn, **kw)
        return f4[:1, :1] * jnp.ones_like(p[:1])
    print(f"{label:42s}: {scan_time(f, ss.positions):.3f} ms  "
          f"(grid {plan.grid} cap {plan.capacity} "
          f"lanes {plan.n_cells*((plan.capacity+7)//8*8)*(-(-14*plan.capacity//128)*128)/1e6:.1f}M)")

plan = cw.plan_cellwise(n, lengths, 3.0, positions=np.asarray(state.positions),
                        lo=lo, width_blocks=14, drift_per_step=0.02)
print("planner pick:", plan.grid, "cap", plan.capacity, "skin", round(plan.skin,3))

force_probe(plan, "production (B default)")
for B in (16, 24, 32):
    force_probe(plan, f"block_cells={B}", block_cells=B)
# forced cap 24 (timing only; would overflow in production)
p24 = dataclasses.replace(plan, capacity=24)
force_probe(p24, "forced cap 24 (timing only)")
# virial on, for the record
force_probe(plan, "with virial", needs_virial=True)
