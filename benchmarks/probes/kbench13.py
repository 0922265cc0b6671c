"""Round-3 probe 6: occupancy-predicated row groups in the half-stencil
kernel. Real particles occupy a PREFIX of each cell's slots (repack
ranks them), mean occupancy ~ cap/2, and VPU sublane tiles are 8 rows --
so the kernel can skip whole 8-row groups beyond each cell's occupancy.

Variants at 64k (grid 16^3, cap 32):
  K0: current vectorized kernel ([B, cap, C] one shot)
  K1: per-cell python-unrolled loop, per-(cell, row-group) @pl.when
  K2: [B, 8, C] row-group slabs, predicate on the BLOCK max occupancy
"""
import time, functools, dataclasses
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
import hoomd_tf_tpu as htf
from hoomd_tf_tpu.ops import cellwise as cw
from hoomd_tf_tpu.ops.cellwise import _HALF_OFFS, _relative_coords
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
cap = plan.capacity
n_cells = plan.n_cells
n_blocks = len(_HALF_OFFS)
C = n_blocks * cap
occ = valid.reshape(n_cells, cap).sum(axis=1).astype(jnp.int32)
print("cells", n_cells, "cap", cap, "occ mean/max",
      float(occ.mean()), int(occ.max()),
      "mean active row groups", float(jnp.ceil(occ / 8).mean()))

rc2 = float(plan.r_cut) ** 2
MIN_R2 = 1e-4

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

# ---- K0: the current kernel --------------------------------------
def f_k0(p):
    f4, _ = half_stencil_pair_forces(p, None, valid, plan, layout.lo,
                                     pair_fn, needs_energy=False)
    return p + 1e-20 * f4[:, :3]
print("K0 current kernel            :", round(scan_time(f_k0, ss.positions), 3), "ms")

# shared outer prologue for K1/K2
def planes_of(p):
    _, _, _, gx, gy, gz = _relative_coords(p, valid, plan, layout.lo,
                                           _HALF_OFFS, None)
    return gx, gy, gz

def lj_lanes(dx, dy, dz, notself):
    d2 = dx * dx + dy * dy + dz * dz
    ok = (d2 <= rc2) & notself
    r2 = jnp.maximum(d2, MIN_R2)
    u = 1.0 / r2
    sr6 = u * u * u
    s = jnp.where(ok, -12.0 * (2.0 * sr6 - 1.0) * sr6 * u, 0.0)
    return s

# ---- K1: per-cell unrolled, per-(cell, group) predication --------
B1 = 8
def k1_kernel(occ_ref, gx_ref, gy_ref, gz_ref, ox_ref, oy_ref, oz_ref,
              bx, by, bz):
    gx, gy, gz = gx_ref[:], gy_ref[:], gz_ref[:]
    ox_ref[:] = jnp.zeros_like(ox_ref)
    oy_ref[:] = jnp.zeros_like(oy_ref)
    oz_ref[:] = jnp.zeros_like(oz_ref)
    bx[:] = jnp.zeros_like(bx)
    by[:] = jnp.zeros_like(by)
    bz[:] = jnp.zeros_like(bz)
    for b in range(B1):
        o = occ_ref[b, 0]
        for g in range(cap // 8):
            @pl.when(g * 8 < o)
            def _(b=b, g=g):
                rx = gx[b, g*8:(g+1)*8]
                ry = gy[b, g*8:(g+1)*8]
                rz = gz[b, g*8:(g+1)*8]
                dx = gx[b][None, :] - rx[:, None]
                dy = gy[b][None, :] - ry[:, None]
                dz = gz[b][None, :] - rz[:, None]
                row_i = jax.lax.broadcasted_iota(jnp.int32, (8, C), 0)
                col_i = jax.lax.broadcasted_iota(jnp.int32, (8, C), 1)
                notself = jnp.logical_not(
                    (col_i < cap) & (col_i == row_i + g * 8))
                s = lj_lanes(dx, dy, dz, notself)
                px, py, pz = s * dx, s * dy, s * dz
                ox_ref[b, g*8:(g+1)*8] = 2.0 * jnp.sum(px, axis=1)
                oy_ref[b, g*8:(g+1)*8] = 2.0 * jnp.sum(py, axis=1)
                oz_ref[b, g*8:(g+1)*8] = 2.0 * jnp.sum(pz, axis=1)
                bx[b] = bx[b] - 2.0 * jnp.sum(px, axis=0)
                by[b] = by[b] - 2.0 * jnp.sum(py, axis=0)
                bz[b] = bz[b] - 2.0 * jnp.sum(pz, axis=0)

def k1(p):
    gx, gy, gz = planes_of(p)
    from jax.experimental.pallas import tpu as pltpu
    spec = pl.BlockSpec((B1, C), lambda i: (i, 0))
    ospec = pl.BlockSpec((B1, cap), lambda i: (i, 0))
    occ2 = occ
    fx, fy, fz, kx, ky, kz = pl.pallas_call(
        k1_kernel,
        grid=(n_cells // B1,),
        in_specs=[pl.BlockSpec((B1, 1), lambda i: (i, 0),
                               memory_space=pltpu.SMEM)]
                 + [spec] * 3,
        out_specs=[ospec] * 3 + [spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((n_cells, cap), jnp.float32)] * 3
                + [jax.ShapeDtypeStruct((n_cells, C), jnp.float32)] * 3,
    )(occ2[:, None], gx, gy, gz)
    # minimal consumer (skip roll-back assembly; timing-only)
    return p + 1e-20 * (fx.reshape(-1)[:, None] + kx[:, :cap].reshape(-1)[:, None] * 0)

try:
    print("K1 per-cell predicated       :", round(scan_time(k1, ss.positions), 3), "ms")
except Exception as e:
    print("K1 failed:", repr(e).splitlines()[0][:160])

# ---- K2: [B, 8, C] slabs, block-max occupancy predicate ----------
B2 = 8
def k2_kernel(occ_ref, gx_ref, gy_ref, gz_ref, ox_ref, oy_ref, oz_ref,
              bx, by, bz):
    gx, gy, gz = gx_ref[:], gy_ref[:], gz_ref[:]
    ox_ref[:] = jnp.zeros_like(ox_ref)
    oy_ref[:] = jnp.zeros_like(oy_ref)
    oz_ref[:] = jnp.zeros_like(oz_ref)
    accx = jnp.zeros((B2, C), jnp.float32)
    accy = jnp.zeros((B2, C), jnp.float32)
    accz = jnp.zeros((B2, C), jnp.float32)
    omax = occ_ref[0, 0]
    for b in range(1, B2):
        omax = jnp.maximum(omax, occ_ref[b, 0])
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, C), 1)
    cols3 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, C), 2)
    outs = [None, None, None]
    for g in range(cap // 8):
        @pl.when(g * 8 < omax)
        def _(g=g):
            rx = gx[:, g*8:(g+1)*8]
            ry = gy[:, g*8:(g+1)*8]
            rz = gz[:, g*8:(g+1)*8]
            dx = gx[:, None, :] - rx[:, :, None]
            dy = gy[:, None, :] - ry[:, :, None]
            dz = gz[:, None, :] - rz[:, :, None]
            notself = jnp.logical_not(
                (cols3 < cap) & (cols3 == rows3 + g * 8))
            s = lj_lanes(dx, dy, dz, notself)
            px, py, pz = s * dx, s * dy, s * dz
            ox_ref[:, g*8:(g+1)*8] = 2.0 * jnp.sum(px, axis=2)
            oy_ref[:, g*8:(g+1)*8] = 2.0 * jnp.sum(py, axis=2)
            oz_ref[:, g*8:(g+1)*8] = 2.0 * jnp.sum(pz, axis=2)
            bx[:] = (bx[:] if g else jnp.zeros((B2, C), jnp.float32)) \
                - 2.0 * jnp.sum(px, axis=1)
            by[:] = (by[:] if g else jnp.zeros((B2, C), jnp.float32)) \
                - 2.0 * jnp.sum(py, axis=1)
            bz[:] = (bz[:] if g else jnp.zeros((B2, C), jnp.float32)) \
                - 2.0 * jnp.sum(pz, axis=1)

def k2(p):
    gx, gy, gz = planes_of(p)
    from jax.experimental.pallas import tpu as pltpu
    spec = pl.BlockSpec((B2, C), lambda i: (i, 0))
    ospec = pl.BlockSpec((B2, cap), lambda i: (i, 0))
    fx, fy, fz, kx, ky, kz = pl.pallas_call(
        k2_kernel,
        grid=(n_cells // B2,),
        in_specs=[pl.BlockSpec((B2, 1), lambda i: (i, 0),
                               memory_space=pltpu.SMEM)] + [spec] * 3,
        out_specs=[ospec] * 3 + [spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((n_cells, cap), jnp.float32)] * 3
                + [jax.ShapeDtypeStruct((n_cells, C), jnp.float32)] * 3,
    )(occ[:, None], gx, gy, gz)
    return p + 1e-20 * (fx.reshape(-1)[:, None] + kx[:, :cap].reshape(-1)[:, None] * 0)

try:
    print("K2 slab block-max predicated :", round(scan_time(k2, ss.positions), 3), "ms")
except Exception as e:
    print("K2 failed:", repr(e).splitlines()[0][:160])
