"""O(N) cell-list neighbor build -- the TPU-native replacement for the
reference's CSR->dense CUDA reshape kernel (``TensorflowCompute.cu:80-209``)
plus HOOMD's cell list itself.

Everything is static-shape for XLA:

1. bin particles into an ``nx x ny x nz`` grid (cell edge >= r_cut),
2. sort particle indices by cell id (XLA sort; O(N log N) on TPU),
3. scatter sorted indices into a fixed-capacity ``[n_cells, capacity]``
   table (overflow counted, surfaced like ``check_nlist``),
4. per particle, gather the 27 neighboring cells' slots ->
   ``[N, 27*capacity]`` candidates, minimum-image distance filter,
   ``top_k`` the nearest NN.

Gradients flow through the displacement values (the gather of positions);
indices are integer and naturally non-differentiable, which matches the
physics (neighbor membership is piecewise constant).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .box import box_size as _box_size

__all__ = ["CellList", "cell_list_nlist"]


class CellList:
    """Configuration for the cell-list neighbor build.

    :param capacity: max particles per cell (default: estimated from the
        mean density with 2x headroom at build time).
    :param skin: extra margin added to the cell edge (room for a future
        rebuild-every-k-steps optimization; the list itself is still exact
        for ``r_cut``).
    """

    def __init__(self, capacity=None, skin=0.0):
        self.capacity = capacity
        self.skin = float(skin)

    def grid_for(self, box_lengths, r_cut):
        edge = r_cut + self.skin
        dims = tuple(max(1, int(math.floor(L / edge)))
                     for L in box_lengths)
        return dims

    def usable(self, box_lengths, r_cut):
        """Cell lists need >= 3 cells per dimension so the 27-cell stencil
        covers the cutoff without double counting."""
        return all(d >= 3 for d in self.grid_for(box_lengths, r_cut))

    def default_capacity(self, n, box_lengths, r_cut):
        vol = float(np.prod(box_lengths))
        edge = r_cut + self.skin
        per_cell = n / vol * edge ** 3
        return max(4, int(math.ceil(per_cell * 2.0)) + 4)


@partial(jax.jit, static_argnames=("NN", "grid", "capacity", "r_cut"))
def _cell_nlist_impl(pos4, r_cut, NN, grid, capacity, box_lengths):
    n = pos4.shape[0]
    nx, ny, nz = grid
    n_cells = nx * ny * nz
    dtype = pos4.dtype
    lengths = box_lengths.astype(dtype)
    pos3 = pos4[:, :3]

    # --- bin ---------------------------------------------------------------
    # positions may be anywhere; fold into [0, L) relative to nothing in
    # particular (cells only need consistency, and the 27-stencil wraps)
    frac = pos3 / lengths
    frac = frac - jnp.floor(frac)
    dims = jnp.asarray(grid, dtype=jnp.int32)
    cell_xyz = jnp.minimum((frac * dims.astype(dtype)).astype(jnp.int32),
                           dims - 1)
    cell_id = (cell_xyz[:, 0] +
               nx * (cell_xyz[:, 1] + ny * cell_xyz[:, 2]))

    # --- sort & slot table ---------------------------------------------------
    order = jnp.argsort(cell_id)
    sorted_cells = cell_id[order]
    # rank of each sorted particle within its cell
    starts = jnp.searchsorted(sorted_cells, jnp.arange(n_cells),
                              side="left")
    rank = jnp.arange(n) - starts[sorted_cells]
    overflow = jnp.any(rank >= capacity)
    rank_c = jnp.minimum(rank, capacity - 1)
    # slot table of particle indices, n = empty sentinel
    table = jnp.full((n_cells * capacity,), n, dtype=jnp.int32)
    table = table.at[sorted_cells * capacity + rank_c].set(
        order.astype(jnp.int32), mode="drop")
    table = table.reshape(n_cells, capacity)

    # --- 27-cell candidate gather -------------------------------------------
    offs = jnp.asarray(
        [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
         for dz in (-1, 0, 1)], dtype=jnp.int32)           # [27, 3]
    neigh_xyz = (cell_xyz[:, None, :] + offs[None, :, :]) % dims  # [N,27,3]
    neigh_id = (neigh_xyz[..., 0] +
                nx * (neigh_xyz[..., 1] + ny * neigh_xyz[..., 2]))
    cand = table[neigh_id].reshape(n, 27 * capacity)       # [N, 27*cap]

    # --- distance filter + top-NN --------------------------------------------
    # TPU layout note: everything below works on [N, C] per-component
    # arrays. A single [N, C, 3] intermediate would be tiled (8, 128) on its
    # trailing dims, padding 3 -> 128 (a 42x HBM blowup that OOMs at 64k
    # particles); component-separated arrays tile perfectly.
    sentinel = jnp.asarray(1e30, dtype=dtype)

    def component(k):
        ext = jnp.concatenate([pos3[:, k], sentinel[None]], axis=0)
        d = ext[cand] - pos3[:, k][:, None]
        return d - jnp.round(d / lengths[k]) * lengths[k]

    dx, dy, dz = component(0), component(1), component(2)
    dist2 = dx * dx + dy * dy + dz * dz
    valid = (dist2 <= r_cut * r_cut) & (dist2 >= 25e-8) & (cand < n)
    dist_masked = jnp.where(valid, dist2, jnp.full_like(dist2, 1e20))
    _, top_idx = jax.lax.top_k(-dist_masked, NN)            # nearest NN
    nl_valid = jnp.take_along_axis(valid, top_idx, axis=1)
    nl_index = jnp.take_along_axis(cand, top_idx, axis=1)
    mask = nl_valid.astype(dtype)
    nl_dx = jnp.take_along_axis(dx, top_idx, axis=1) * mask
    nl_dy = jnp.take_along_axis(dy, top_idx, axis=1) * mask
    nl_dz = jnp.take_along_axis(dz, top_idx, axis=1) * mask
    types_ext = jnp.concatenate(
        [pos4[:, 3], jnp.zeros((1,), dtype=dtype)], axis=0)
    nl_type = types_ext[nl_index] * mask
    nlist = jnp.stack([nl_dx, nl_dy, nl_dz, nl_type], axis=-1)
    return nlist, overflow


def plan(n, box_lengths, r_cut, config=None):
    """Static geometry for the build: ``(grid, capacity)``. Must be computed
    from *concrete* box lengths (outside any trace); the box is constant
    under NVE/NVT so the Simulation plans once per compiled scan."""
    config = config or CellList()
    np_lengths = np.asarray(box_lengths, dtype=np.float64)
    grid = config.grid_for(np_lengths, r_cut)
    if not all(d >= 3 for d in grid):
        return None, None  # caller falls back to O(N^2)
    capacity = config.capacity or config.default_capacity(
        n, np_lengths, r_cut)
    return tuple(grid), int(capacity)


def cell_list_nlist(pos4, r_cut, NN, box, config=None, return_overflow=False,
                    grid=None, capacity=None):
    """Padded ``[N, NN, 4]`` neighbor list (displacement + neighbor type)
    via a fixed-capacity cell list. Nearest-NN sorted ascending.

    :param pos4: ``[N, 4]`` positions with type in the last column.
    :param r_cut: cutoff radius.
    :param NN: max neighbors per particle.
    :param box: ``[3, 3]`` box array (or ``[3]`` lengths).
    :param config: a :class:`CellList` (default constructed).
    :param return_overflow: also return a scalar bool flag set when any
        cell exceeded its capacity (neighbors may then be missing).
    :param grid, capacity: static plan from :func:`plan`; required when
        calling under a trace (the box must then be constant), otherwise
        derived from the concrete box.
    """
    box = jnp.asarray(box)
    lengths = _box_size(box) if box.ndim == 2 else box
    if grid is None or capacity is None:
        np_lengths = np.asarray(jax.lax.stop_gradient(lengths))
        grid, capacity = plan(pos4.shape[0], np_lengths, r_cut, config)
        if grid is None:
            raise ValueError(
                f"Box {np_lengths} too small for a cell list at "
                f"r_cut={r_cut}; use compute_nlist (O(N^2)) instead")
    nlist, overflow = _cell_nlist_impl(
        pos4, float(r_cut), int(NN), tuple(grid), int(capacity), lengths)
    if return_overflow:
        return nlist, overflow
    return nlist
