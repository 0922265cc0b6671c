"""Particle- and batch-sharded execution over a device mesh.

The TPU-native replacement for the reference's MPI spatial decomposition
(SURVEY.md section 2.3): particles are sharded across devices with
``jax.shard_map``; each device gathers the (replicated or all-gathered)
positions it needs, builds the neighbor-list rows for its shard, and
evaluates the model on its shard. Scalar reductions (energy, loss,
gradients) ride ICI via ``psum``. At <= 64k particles the all-gather
strategy is bandwidth-trivial (64k x 4 floats = 1 MiB); ring halo exchange
is the planned upgrade path for larger systems.
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models.module import get_state, set_state
from ..ops.box import box_size

__all__ = ["sharded_nlist", "sharded_force_fn", "data_parallel_grads",
           "sharded_train_step"]


def _two_set_nlist(query4, source4, r_cut, NN, box_lengths):
    """Neighbor rows for ``query4 [n,4]`` against ``source4 [N,4]``:
    ``[n, NN, 4]`` minimum-image displacements + neighbor type, nearest-NN
    sorted. Self-pairs are excluded by the r >= 5e-4 guard, matching
    :func:`..ops.nlist.compute_nlist`."""
    q3, s3 = query4[:, :3], source4[:, :3]
    disp = s3[None, :, :] - q3[:, None, :]
    box = jnp.reshape(box_lengths, (1, 1, 3)).astype(disp.dtype)
    disp = disp - jnp.round(disp / box) * box
    dist = jnp.linalg.norm(disp, axis=2)
    mask = (dist <= r_cut) & (dist >= 5e-4)
    mask_cast = mask.astype(dist.dtype)
    dist_masked = dist * mask_cast + (1 - mask_cast) * 1e20
    _, idx = jax.lax.top_k(-dist_masked, NN)
    nl_pos = jnp.take_along_axis(disp, idx[:, :, None], axis=1)
    nl_mask = jnp.take_along_axis(mask_cast, idx, axis=1)[:, :, None]
    nl_type = source4[:, 3][idx][:, :, None].astype(nl_pos.dtype)
    return jnp.concatenate([nl_pos, nl_type], axis=-1) * nl_mask


def sharded_nlist(positions4, r_cut, NN, box, mesh, axis="d"):
    """Build the full ``[N, NN, 4]`` neighbor list with rows sharded over
    ``mesh`` axis ``axis``. Positions are all-gathered per device (the
    MD analog of sequence-parallel KV gathering)."""
    bl = box_size(box)

    def build(pos_shard):
        pos_full = jax.lax.all_gather(pos_shard, axis, tiled=True)
        return _two_set_nlist(pos_shard, pos_full, r_cut, NN, bl)

    return jax.shard_map(
        build, mesh=mesh, in_specs=P(axis), out_specs=P(axis))(positions4)


def sharded_force_fn(model, r_cut, mesh, axis="d"):
    """A function ``(values, positions4, box) -> (forces [N,4], new_values)``
    evaluating the model with particles sharded over the mesh.

    Model variables are replicated; per-particle outputs stay sharded. The
    model must compute per-particle quantities (true of every pair-potential
    and NN-potential model in the reference zoo).
    """
    NN = max(1, model.nneighbor_cutoff)

    def fn(values, positions4, box):
        def shard_body(values, pos_shard, box):
            pos_full = jax.lax.all_gather(pos_shard, axis, tiled=True)
            nlist = _two_set_nlist(pos_shard, pos_full, r_cut, NN,
                                   box_size(box))
            old = get_state(model)
            set_state(model, list(values))
            try:
                out = model([nlist, pos_shard, box])
                new_values = get_state(model)
            finally:
                set_state(model, old)
            forces = out[0]
            if forces.shape[-1] == 3:
                forces = jnp.concatenate(
                    [forces, jnp.zeros_like(forces[:, :1])], axis=-1)
            return forces, tuple(new_values)

        return jax.shard_map(
            shard_body, mesh=mesh,
            in_specs=(P(), P(axis), P()),
            out_specs=(P(axis), P()),
            check_vma=False)(tuple(values), positions4, box)

    return fn


def data_parallel_grads(grads, axis="d"):
    """psum gradients across the mesh (to call inside shard_map/pjit when
    sharding training batches over devices)."""
    return jax.tree_util.tree_map(
        lambda g: jax.lax.psum(g, axis), grads)


def sharded_train_step(model, optimizer, r_cut, mesh, axis="d"):
    """A jittable training step with particles sharded over the mesh:
    per-shard force prediction, MSE against per-shard label forces, psum'd
    gradients, replicated optimizer update.

    Returns ``step(params, aux_values, opt_state, positions4, box, labels)
    -> (loss, params, opt_state)`` where ``params`` are the trainable
    variable values and ``aux_values`` the full variable-value list.
    """
    import optax

    NN = max(1, model.nneighbor_cutoff)
    variables = model.variables
    trainable_idx = [i for i, v in enumerate(variables) if v.trainable]

    def step(params, aux_values, opt_state, positions4, box, labels):
        def shard_body(params, aux_values, pos_shard, box, labels_shard):
            def loss_fn(params):
                vals = list(aux_values)
                for i, p in zip(trainable_idx, params):
                    vals[i] = p
                pos_full = jax.lax.all_gather(pos_shard, axis, tiled=True)
                nlist = _two_set_nlist(pos_shard, pos_full, r_cut, NN,
                                       box_size(box))
                old = get_state(model)
                set_state(model, vals)
                try:
                    out = model([nlist, pos_shard, box], training=True)
                finally:
                    set_state(model, old)
                pred = out[0][:, :3]
                return jnp.mean((pred - labels_shard[:, :3]) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            loss = jax.lax.pmean(loss, axis)
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.pmean(g, axis), grads)
            return loss, grads

        loss, grads = jax.shard_map(
            shard_body, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(), P(axis)),
            out_specs=(P(), P()),
            check_vma=False)(tuple(params), tuple(aux_values),
                             positions4, box, labels)
        updates, opt_state = optimizer.update(list(grads), opt_state,
                                              list(params))
        params = optax.apply_updates(list(params), updates)
        return loss, params, opt_state

    return step
