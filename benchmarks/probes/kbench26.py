"""Round-5 probe 2: decompose the online-training step at the honest
64k state (VERDICT r4 item 2: the proxy train route runs a ~6.5x tax
over eval while the lane-contraction VJP's own analysis argues ~2-3x).

Pieces timed under a scan (scan_time pattern, compile excluded):
  eval         -- primal pallas analytic forces, no energy (hot-loop form)
  labels       -- built-in LJ forces (the per-step training labels)
  train fwd    -- pair_train_forces primal (fwd_stencil=pallas, energy on)
  train bwd    -- the custom-VJP backward alone (the XLA rank-3 lane
                  contraction + jax.grad of the Clenshaw over the lanes)
  train f+b    -- value_and_grad of a force-matching loss through
                  pair_train_forces (what the engine's train_fast pays
                  per step, minus integrator/optimizer noise)

Hypothesis: bwd dominates -- it materializes [n_cells, cap, 14*cap]
rank-3 intermediates in XLA (the structure the primal moved to Pallas
precisely to avoid).
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
from hoomd_tf_tpu.ops.chebyshev import make_pair_proxy
from hoomd_tf_tpu.ops.pair_train import pair_train_forces

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_htf"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

n = 65536
R_CUT = 3.0


def lj_slope(r2):
    u = 1.0 / r2
    sr6 = u * u * u
    return (4.0 * (sr6 * sr6 - sr6),
            -12.0 * (2.0 * sr6 - 1.0) * sr6 * u)


def scan_time(fn, arg, iters=30):
    @functools.partial(jax.jit, static_argnums=1)
    def run(p, k):
        def body(c, _):
            return fn(c), ()
        return jax.lax.scan(body, p, None, length=k)[0]
    jax.block_until_ready(run(arg, 1))
    jax.block_until_ready(run(arg, iters))
    t0 = time.perf_counter(); jax.block_until_ready(run(arg, 1))
    t1 = time.perf_counter()
    t2 = time.perf_counter(); jax.block_until_ready(run(arg, iters))
    t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / (iters - 1) * 1e3


def main():
    class LJ(htf.PairModel):
        def pair_energy(self, r2):
            u = 1.0 / r2
            sr6 = u * u * u
            return 4.0 * (sr6 * sr6 - sr6)

    model = LJ(64)
    sim = htf.Simulation(dt=0.005,
                         integrator=htf.md.Minimize(max_disp=0.05), seed=0)
    sim.init_lattice(n, density=0.4, kT_init=1.5)
    rng = np.random.RandomState(0)
    sim.state = dataclasses.replace(
        sim.state, positions=sim.state.positions +
        0.3 * jnp.asarray(rng.randn(n, 3).astype(np.float32)))
    tfc = htf.tfcompute(model)
    tfc.attach(sim, r_cut=R_CUT, nlist="cellwise")
    sim.run(60)
    sim.thermalize_velocities(1.5)
    sim.integrator = htf.md.NVT(kT=1.5, tau=0.5)
    sim.run(1000)
    for _ in range(4):
        plan_before = sim._layout.plan if sim._layout else None
        sim.run(1000)
        jax.block_until_ready(sim.state.positions)
        if sim._layout is None or sim._layout.plan == plan_before:
            break

    layout = sim._layout
    plan = layout.plan
    ss, aux, _ = layout.pack_jit(sim.state, ())
    jax.block_until_ready(ss.positions)
    valid = aux["valid"]
    pos = ss.positions
    lo = layout.lo
    print(f"plan: grid={plan.grid}, cap={plan.capacity}, "
          f"n_cells={plan.n_cells}")

    # ---- eval (hot-loop form) -------------------------------------
    def mk_eval(p):
        f4, _ = cw.analytic_pair_forces(
            p, None, valid, plan, lo, lj_slope, needs_energy=False,
            stencil="pallas")
        return p + 1e-20 * f4[:, :3]
    print("eval (pallas, no E)      :",
          round(scan_time(mk_eval, pos), 3), "ms")

    # ---- labels (same thing, conceptually the built-in LJ) --------
    def mk_lab(p):
        f4, _ = cw.analytic_pair_forces(
            p, None, valid, plan, lo, lj_slope, needs_energy=True,
            stencil="pallas")
        return p + 1e-20 * f4[:, :3]
    print("labels (pallas, with E)  :",
          round(scan_time(mk_lab, pos), 3), "ms")

    # ---- proxy train pieces ----------------------------------------
    r2_lo = max((0.25 * R_CUT) ** 2, 1e-4)
    fit_, eval_ = make_pair_proxy(16, r2_lo, R_CUT * R_CUT)
    coeffs0 = fit_(lj_slope)
    labels = np.asarray(mk_lab(pos) - pos) * 1e20  # fixed label array
    labels = jnp.asarray(labels)

    def ptf(c, p, impl="auto"):
        return pair_train_forces(
            c, eval_, p, None, valid, plan, lo, with_types=False,
            needs_energy=True, fwd_stencil="pallas", bwd_impl=impl)

    def mk_fwd(p):
        f4 = ptf(coeffs0, p)
        return p + 1e-20 * f4[:, :3]
    print("train fwd (primal only)  :",
          round(scan_time(mk_fwd, pos), 3), "ms")

    # bwd alone: carry the cotangent through the scan
    def mk_bwd(ct):
        _, vjp = jax.vjp(lambda c: ptf(c, pos), coeffs0)
        (dc,) = vjp(ct)
        s = sum(jnp.asarray(v).sum() for v in dc["c"]) + \
            sum(jnp.asarray(v).sum() for v in dc["cd"])
        return ct + 1e-20 * s
    ct0 = jnp.ones((plan.n_slots, 4), jnp.float32)
    print("train fwd+bwd (vjp)      :",
          round(scan_time(mk_bwd, ct0), 3), "ms")

    # full force-matching value_and_grad (loss -> coeff grads)
    for impl in ("xla", "pallas"):
        def mk_vg(p, impl=impl):
            def loss_fn(c):
                f4 = ptf(c, p, impl)
                d = f4[:, :3] - labels
                return jnp.mean(jnp.sum(d * d, axis=-1))
            loss, g = jax.value_and_grad(loss_fn)(coeffs0)
            s = sum(jnp.asarray(v).sum() for v in g["c"]) + \
                sum(jnp.asarray(v).sum() for v in g["cd"])
            return p + 1e-20 * (loss + s)
        try:
            print(f"train value_and_grad {impl:6s}:",
                  round(scan_time(mk_vg, pos), 3), "ms")
        except Exception as exc:
            print(f"train value_and_grad {impl}: FAILED: "
                  f"{type(exc).__name__}: {str(exc)[:300]}")


if __name__ == "__main__":
    main()
