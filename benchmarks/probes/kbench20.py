"""kbench20: dissect the custom-VJP training step for the north-star NN.

At 16k: time (a) the synthesized-pair_fn analytic FWD alone, (b) the
full value_and_grad through pair_train_forces (custom VJP), (c) the
bwd contraction alone, (d) the generic capture-replay train loss
value_and_grad -- to locate where the 78 ms/step sits.
"""
import dataclasses, functools, time, sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp, numpy as np
import hoomd_tf_tpu as htf
from hoomd_tf_tpu.md.slots import SlotLayout
from hoomd_tf_tpu.ops import cellwise as cw
from hoomd_tf_tpu.ops.lane_fast import synthesize_pair_fn
from hoomd_tf_tpu.ops.pair_train import pair_train_forces
from hoomd_tf_tpu.md.simulation import _functional

class TrainableNN(htf.SimModel):
    def setup(self):
        self.dense1 = htf.Dense(16)
        self.last = htf.Dense(1)
    def compute(self, nlist, positions, box):
        rinv = htf.nlist_rinv(nlist)
        x = jax.nn.tanh(self.dense1(rinv[..., None]))
        e = jnp.sum(self.last(x)[..., 0], axis=1)
        return htf.compute_nlist_forces(nlist, e)[:, :3]

def timeit(f, *args, n=20):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3

n = 16384
sim = htf.Simulation(dt=0.005, integrator=htf.md.NVE(), seed=0)
sim.init_lattice(n, density=0.4, kT_init=1.5)
rng = np.random.RandomState(0)
state = dataclasses.replace(
    sim.state, positions=sim.state.positions +
    0.2 * jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32)))
lengths = np.asarray(htf.box_size(state.box)); lo = np.asarray(state.box[0])
plan = cw.plan_cellwise(n, lengths, 3.0, positions=np.asarray(state.positions), lo=lo)
print("plan", plan.grid, "cap", plan.capacity, "n_slots", plan.n_slots,
      "C", plan.width, "lanes(M)", plan.n_slots*plan.width/1e6)
layout = SlotLayout(plan, n, lo)
slot_state, aux, _ = layout.pack(state)
model = TrainableNN(64, output_forces=False)
model.ensure_built([layout.planes(slot_state, aux), slot_state.positions4,
                    slot_state.box])
mv = [v.value for v in model.variables]
tidx = [i for i, v in enumerate(model.variables) if v.trainable]
labels = jnp.asarray(rng.randn(plan.n_slots, 4).astype(np.float32))

def pair_apply(params, r2, ti, tj):
    vals = list(mv)
    for i, p in zip(tidx, params): vals[i] = p
    out, _ = _functional(model, vals,
                         lambda: synthesize_pair_fn(model, slot_state.box)(r2, ti, tj))
    return out

params = [mv[i] for i in tidx]

@jax.jit
def fwd_only(params):
    f4 = pair_train_forces(params, pair_apply, slot_state.positions,
                           slot_state.types, aux["valid"], plan, layout.lo,
                           with_types=True, rcut_matrix=layout.rc_matrix,
                           needs_energy=False, fwd_stencil="full")
    return f4

def make_vg(bwd_stencil):
    @jax.jit
    def vg_custom(params):
        def loss(p):
            f4 = pair_train_forces(p, pair_apply, slot_state.positions,
                                   slot_state.types, aux["valid"], plan, layout.lo,
                                   with_types=True, rcut_matrix=layout.rc_matrix,
                                   needs_energy=False, fwd_stencil="full",
                                   bwd_stencil=bwd_stencil)
            return jnp.mean((f4[:, :3] - labels[:, :3])**2)
        return jax.value_and_grad(loss)(params)
    return vg_custom

@jax.jit
def vg_generic(params):
    def loss(p):
        vals = list(mv)
        for i, q in zip(tidx, p): vals[i] = q
        def fn():
            planes = layout.planes(slot_state, aux)
            out = model([planes, slot_state.positions4, slot_state.box],
                        training=True)
            return jnp.mean((out[0][:, :3] - labels[:, :3])**2)
        l, _ = _functional(model, vals, fn)
        return l
    return jax.value_and_grad(loss)(params)

print("fwd_only ms:", timeit(fwd_only, params))
print("vg_custom(full bwd) ms:", timeit(make_vg("full"), params, n=5))
print("vg_custom(half bwd) ms:", timeit(make_vg("half"), params, n=5))
print("vg_generic ms:", timeit(vg_generic, params, n=5))
