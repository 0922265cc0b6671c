"""Round-5 probe 1: MXU-contraction kernel body ("kernel v2a").

The committed half-stencil kernel is VPU-bound at its lane set
(docs/performance.md item 12: 0.881 ms, 57% of the step). Per candidate
lane it pays ~12 of ~33 VPU ops in the dual reductions (3x mul +
lane-reduce forward, 3x mul + sublane-reduce Newton back). But both
reductions are CONTRACTIONS of the same scalar field s against affine
functions of the coordinates:

  forward row i:   sum_j s*dx = qx_i * sum_j s  -  sum_j s*gx_j
  Newton back j:   sum_i s*dx = gx_j * sum_i s  -  sum_i s*qx_i

so ONE [w,C]x[C,4] matmul (G = stacked (1,gx,gy,gz) planes, contracted
lane-vs-lane) gives every forward channel, and ONE [4,w]x[w,C] matmul
gives every back channel -- on the MXU, which sits idle today, while the
VPU keeps only dx/d2/pair-fn/mask (~21 ops). Ghost lanes contribute
exactly 0 (s is hard-zeroed by the mask select), so the FAR ghost
coordinates never pollute the sums.

Variants:
  V0: committed kernel (baseline)
  V3: rank-3 lane math as committed + per-cell matmul duals
  V3h: V3 with Precision.HIGHEST matmuls (6-pass f32 emulation)

Measures scan ms/step and max |df| vs V0 at the honest 64k state.
"""
import dataclasses
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import hoomd_tf_tpu as htf
from hoomd_tf_tpu.ops.cellwise import (_HALF_OFFS, _relative_coords,
                                       _roll_back)
from hoomd_tf_tpu.ops.cellwise_pallas import half_stencil_pair_forces as k0

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_htf"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

n = 65536


def pair_fn(r2):
    u = 1.0 / r2
    sr6 = u * u * u
    return (4.0 * (sr6 * sr6 - sr6),
            -12.0 * (2.0 * sr6 - 1.0) * sr6 * u)


def _mm_kernel(cap, n_blocks, rc2, min_r2, precision,
               occ_ref, gx_ref, gy_ref, gz_ref, fx_ref, fy_ref, fz_ref,
               s_scr):
    """Matmul-dual kernel: 3 force channels, no energy/virial/types.

    Mosaic constraint discovered by /tmp/mmtest2.py bisects: a
    sublane-contraction dot plus any other dot inside the same pl.when
    region ICEs the compiler. So the predicated group loop only computes
    the masked scalar field s and stores it to a VMEM scratch (skipped
    groups store zeros -- exactly one pass over the scratch either way),
    and ALL matmuls run once per grid step after the loop, unpredicated
    (they are ~4 MACs/lane -- noise on the MXU)."""
    C = n_blocks * cap
    gx, gy, gz = gx_ref[:], gy_ref[:], gz_ref[:]          # [B, C]
    B = gx.shape[0]
    omax = occ_ref[0, 0]
    for b in range(1, B):
        omax = jnp.maximum(omax, occ_ref[b, 0])

    dtype = gx.dtype
    zero = jnp.zeros((), dtype=dtype)

    groups = [(g * 8, min(cap, (g + 1) * 8)) for g in range(-(-cap // 8))]
    for lo_r, hi_r in groups:
        w = hi_r - lo_r

        @pl.when(lo_r < omax)
        def _(lo_r=lo_r, hi_r=hi_r, w=w):
            qx = gx[:, lo_r:hi_r]
            qy = gy[:, lo_r:hi_r]
            qz = gz[:, lo_r:hi_r]
            dx = gx[:, None, :] - qx[:, :, None]          # [B, w, C]
            dy = gy[:, None, :] - qy[:, :, None]
            dz = gz[:, None, :] - qz[:, :, None]
            d2 = dx * dx + dy * dy + dz * dz
            row = jax.lax.broadcasted_iota(jnp.int32, (w, C), 0) + lo_r
            col = jax.lax.broadcasted_iota(jnp.int32, (w, C), 1)
            not_self = jnp.logical_not((col < cap) & (col == row))[None]
            ok = (d2 <= rc2) & not_self
            r2 = jnp.maximum(d2, min_r2)
            _, dU = pair_fn(r2)
            s_scr[:, lo_r:hi_r, :] = jnp.where(ok, dU, zero)

        @pl.when(lo_r >= omax)
        def _(lo_r=lo_r, hi_r=hi_r, w=w):
            s_scr[:, lo_r:hi_r, :] = jnp.zeros((B, w, C), dtype=dtype)

    one_c = jnp.ones((1, cap), dtype=dtype)
    q_x, q_y, q_z = gx[:, :cap], gy[:, :cap], gz[:, :cap]
    Rs = []
    baccs = []
    for b in range(B):
        sb = s_scr[b]                                      # [cap, C]
        # forward: contract lanes of s against lanes of G = (1,gx,gy,gz)
        Gb = jnp.concatenate(
            [jnp.ones((1, C), dtype=dtype), gx[b:b + 1], gy[b:b + 1],
             gz[b:b + 1]], axis=0)                         # [4, C]
        Rs.append(jax.lax.dot_general(
            sb, Gb, (((1,), (1,)), ((), ())),
            precision=precision,
            preferred_element_type=dtype))                 # [cap, 4]
        # back: contract rows (sublanes)
        Qb = jnp.concatenate(
            [one_c, q_x[b:b + 1], q_y[b:b + 1], q_z[b:b + 1]],
            axis=0)                                        # [4, cap]
        baccs.append(jax.lax.dot_general(
            Qb, sb, (((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=dtype))                 # [4, C]
    R = jnp.stack(Rs, axis=0)                              # [B, cap, 4]
    bacc = jnp.stack(baccs, axis=0)                        # [B, 4, C]

    fx_ref[:, :cap] = 2.0 * (R[:, :, 1] - q_x * R[:, :, 0])
    fy_ref[:, :cap] = 2.0 * (R[:, :, 2] - q_y * R[:, :, 0])
    fz_ref[:, :cap] = 2.0 * (R[:, :, 3] - q_z * R[:, :, 0])
    S1 = bacc[:, 0, :]
    fx_ref[:, cap:] = (-2.0 * (gx * S1 - bacc[:, 1, :]))[:, cap:]
    fy_ref[:, cap:] = (-2.0 * (gy * S1 - bacc[:, 2, :]))[:, cap:]
    fz_ref[:, cap:] = (-2.0 * (gz * S1 - bacc[:, 3, :]))[:, cap:]


def mm_half_stencil(positions, valid, plan, lo, block_cells=8,
                    min_r2=1e-4, precision=None):
    """Force-only matmul-dual half stencil (probe form)."""
    dtype = positions.dtype
    n_cells, cap = plan.n_cells, plan.capacity
    offs_list = _HALF_OFFS
    n_blocks = len(offs_list)
    C = n_blocks * cap
    _, _, _, gx, gy, gz = _relative_coords(
        positions, valid, plan, lo, offs_list, None)
    occ = valid.reshape(n_cells, cap).sum(axis=1).astype(jnp.int32)[:, None]
    rc2 = float(plan.r_cut) ** 2
    B = int(block_cells)

    kernel = functools.partial(_mm_kernel, cap, n_blocks, float(rc2),
                               float(min_r2), precision)
    spec = pl.BlockSpec((B, C), lambda i: (i, 0))
    occ_spec = pl.BlockSpec((B, 1), lambda i: (i, 0),
                            memory_space=pltpu.SMEM)
    npad = -(-n_cells // B) * B
    occ_l = occ
    ins = [gx, gy, gz]
    if npad != n_cells:
        occ_l = jnp.pad(occ, ((0, npad - n_cells), (0, 0)))
        ins = [jnp.pad(a, ((0, npad - n_cells), (0, 0)), mode="edge")
               for a in ins]
    outs = pl.pallas_call(
        kernel,
        grid=(npad // B,),
        in_specs=[occ_spec] + [spec] * 3,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((npad, C), dtype)] * 3,
        scratch_shapes=[pltpu.VMEM((B, cap, C), dtype)],
    )(occ_l, *ins)

    def assemble(out):
        acc = out[:n_cells, :cap].astype(dtype)
        for t in range(1, n_blocks):
            acc = acc + _roll_back(
                out[:n_cells, t * cap:(t + 1) * cap], plan,
                offs_list[t]).astype(dtype)
        return acc.reshape(-1)

    fx, fy, fz = (assemble(o) for o in outs)
    e = jnp.zeros((plan.n_slots,), dtype=dtype)
    return jnp.stack([fx, fy, fz, e], axis=-1) * valid[:, None]


def scan_time(fn, arg, iters=50):
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

    layout = sim._layout
    plan = layout.plan
    ss, aux, _ = layout.pack_jit(sim.state, ())
    jax.block_until_ready(ss.positions)
    valid = aux["valid"]
    occ = np.asarray(valid.reshape(plan.n_cells, plan.capacity)
                     .sum(axis=1)).astype(np.int32)
    print(f"plan: grid={plan.grid}, cap={plan.capacity}, "
          f"n_cells={plan.n_cells}, occ mean={occ.mean():.1f} "
          f"max={occ.max()}")

    def mk0(p):
        f4, _ = k0(p, None, valid, plan, layout.lo, pair_fn,
                   needs_energy=False)
        return p + 1e-20 * f4[:, :3]

    f0, _ = k0(ss.positions, None, valid, plan, layout.lo, pair_fn,
               needs_energy=False)
    jax.block_until_ready(f0)
    fref = np.asarray(f0[:, :3])
    fscale = float(np.abs(fref).max())
    print("V0 committed             :",
          round(scan_time(mk0, ss.positions), 3), "ms")

    for name, prec in (("V3 default ", None),
                       ("V3 high    ", jax.lax.Precision.HIGH),
                       ("V3 highest ", jax.lax.Precision.HIGHEST)):
        try:
            def mk(p, prec=prec):
                f4 = mm_half_stencil(p, valid, plan, layout.lo,
                                     precision=prec)
                return p + 1e-20 * f4[:, :3]
            f = mm_half_stencil(ss.positions, valid, plan, layout.lo,
                                precision=prec)
            jax.block_until_ready(f)
            err = float(np.abs(np.asarray(f[:, :3]) - fref).max())
            print(f"{name}             :",
                  round(scan_time(mk, ss.positions), 3),
                  f"ms  max|df|={err:.3e} (rel {err/fscale:.2e})")
        except Exception as exc:
            print(f"{name}: FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:200]}")


if __name__ == "__main__":
    main()
