"""A complete multi-chip MD step: positions/velocities sharded over the
mesh, forces from the model per shard, velocity-Verlet integration in
place -- the whole step is one SPMD program with XLA collectives over ICI.

This is the multi-chip analog of :class:`..md.simulation.Simulation`'s
fused step (and the composition target for a future sharded Simulation
front end): the all-gather of positions is the only cross-device traffic
per step (1 MiB at 64k particles), everything else is local.
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models.module import get_state, set_state
from ..ops.box import box_size
from .shard import _two_set_nlist

__all__ = ["make_sharded_md_step", "simulate_sharded"]


def make_sharded_md_step(model, r_cut, dt, mesh, axis="d"):
    """Jittable NVE velocity-Verlet step over sharded particle state.

    :return: ``step(values, pos4, vel, masses, forces) -> (pos4, vel,
        forces, new_values)`` with ``pos4 [N,4]``, ``vel [N,3]``,
        ``masses [N]``, ``forces [N,4]`` all sharded along the mesh axis,
        and ``box`` closed over via the first call's shapes... box is an
        explicit replicated argument.
    """
    NN = max(1, model.nneighbor_cutoff)

    def step(values, pos4, vel, masses, forces, box):
        def body(values, pos4, vel, masses, forces, box):
            lengths = box_size(box)
            lo = box[0]
            # half kick + drift (local)
            vel = vel + 0.5 * dt * forces[:, :3] / masses[:, None]
            pos3 = pos4[:, :3] + dt * vel
            pos3 = lo + jnp.mod(pos3 - lo, lengths)
            pos4 = jnp.concatenate([pos3, pos4[:, 3:4]], axis=1)
            # forces at new positions: all-gather + per-shard nlist + model
            pos_full = jax.lax.all_gather(pos4, axis, tiled=True)
            nlist = _two_set_nlist(pos4, pos_full, r_cut, NN, lengths)
            old = get_state(model)
            set_state(model, list(values))
            try:
                out = model([nlist, pos4, box])
                new_values = get_state(model)
            finally:
                set_state(model, old)
            f = out[0]
            if f.shape[-1] == 3:
                f = jnp.concatenate([f, jnp.zeros_like(f[:, :1])], axis=1)
            # half kick (local)
            vel = vel + 0.5 * dt * f[:, :3] / masses[:, None]
            return pos4, vel, f, tuple(new_values)

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P()),
            out_specs=(P(axis), P(axis), P(axis), P()),
            check_vma=False)(tuple(values), pos4, vel, masses, forces, box)

    return step


def simulate_sharded(model, values, pos4, vel, masses, box, mesh, r_cut,
                     dt, n_steps, axis="d"):
    """Run ``n_steps`` of sharded NVE as one jitted scan.

    :return: ``(pos4, vel, forces, new_values)``.
    """
    step = make_sharded_md_step(model, r_cut, dt, mesh, axis=axis)
    zero_f = jnp.zeros((pos4.shape[0], 4), dtype=pos4.dtype)

    @jax.jit
    def run(values, pos4, vel, masses, forces, box):
        def body(carry, _):
            values, pos4, vel, forces = carry
            pos4, vel, forces, values = step(values, pos4, vel, masses,
                                             forces, box)
            return (values, pos4, vel, forces), ()
        (values, pos4, vel, forces), _ = jax.lax.scan(
            body, (tuple(values), pos4, vel, forces), None, length=n_steps)
        return pos4, vel, forces, values

    return run(values, pos4, vel, masses, zero_f, box)
