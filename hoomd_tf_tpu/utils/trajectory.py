"""Trajectory-driven workflows (no simulation engine needed).

Functional parity with the reference (``utils.py:164-233, 627-749``):
iterate an MDAnalysis trajectory into model inputs, scan a 2-particle
separation, build gsd snapshots. MDAnalysis/gsd are optional dependencies,
gated at call time; any object implementing the small universe protocol
(``select_atoms``, ``trajectory``, ``dimensions``, atom ``positions`` /
``types``) works, which the tests use to avoid the dependency.
"""

import jax.numpy as jnp
import numpy as np

from ..ops.nlist import compute_nlist

__all__ = ["iter_from_trajectory", "compute_pairwise", "create_frame"]


def iter_from_trajectory(nneighbor_cutoff, universe, selection="all",
                         r_cut=10.0, period=1, start=0, end=None,
                         progress=False):
    """Yield ``([nlist, positions, box], timestep)`` per trajectory frame.

    The inputs list can be passed directly to a :class:`.SimModel`
    (``model(inputs)``). Box angles are converted to hoomd tilt factors as
    in the reference (``utils.py:689-702``).

    One deliberate fix vs. the reference: the neighbor list is recomputed
    **every frame** (the reference computed it once from frame 0 and reused
    it for all frames, ``utils.py:717-749`` -- a known quirk; under jit the
    rebuild is cheap).

    :param nneighbor_cutoff: maximum neighbors NN.
    :param universe: MDAnalysis universe (or duck-typed equivalent).
    :param selection: atom selection string.
    :param r_cut: neighbor cutoff radius.
    :param period: yield every ``period``-th frame.
    :param start: first frame to include.
    :param end: last frame to include (inclusive; default: all).
    :param progress: show a tqdm progress bar if available.
    """
    atom_group = universe.select_atoms(selection)

    box = np.asarray(universe.dimensions, dtype=np.float64)
    # lattice angles -> hoomd tilt factors (reference parity incl. its
    # b = c = 1 normalization, utils.py:690-700)
    b = 1.0
    c = 1.0
    alpha, beta, gamma = np.deg2rad(box[3]), np.deg2rad(box[4]), \
        np.deg2rad(box[5])
    xy = 1.0 / np.tan(gamma)
    xz = c * np.cos(beta)
    yz = b * c * np.cos(alpha) - xy * xz
    hoomd_box = np.array([[0, 0, 0], [box[0], box[1], box[2]],
                          [xy, xz, yz]], dtype=np.float32)

    try:
        types = list(np.unique(atom_group.atoms.types))
        type_array = np.array(
            [types.index(t) for t in atom_group.atoms.types],
            dtype=np.float32).reshape(-1, 1)
    except Exception:
        type_array = np.zeros((len(atom_group), 1), dtype=np.float32)

    frames = universe.trajectory
    if progress:
        try:
            from tqdm import tqdm
            frames = tqdm(frames)
        except ImportError:
            pass
    if end is None:
        end = float("inf")

    for i, ts in enumerate(frames):
        frame = getattr(ts, "frame", i)
        if frame < start or frame > end:
            continue
        if i % period != 0:
            continue
        positions = np.concatenate(
            [np.asarray(atom_group.positions, dtype=np.float32),
             type_array], axis=1)
        nlist = compute_nlist(positions[:, :3], r_cut=r_cut,
                              NN=nneighbor_cutoff, box_size=box[:3])
        yield [nlist, jnp.asarray(positions), jnp.asarray(hoomd_box)], ts


def compute_pairwise(model, r, type_i=0, type_j=0):
    """Model output for a 2-particle system scanned over separations ``r``
    (reference parity: ``utils.py:164-201``).

    :param model: a :class:`.SimModel`.
    :param r: 1D array of separations.
    :param type_i: type of the first particle.
    :param type_j: type of the second particle.
    :return: tuple of stacked numpy outputs, leading axis ``len(r)``.
    """
    import jax

    NN = model.nneighbor_cutoff
    box = jnp.asarray([[0.0, 0, 0], [1e10, 1e10, 1e10], [0, 0, 0]],
                      dtype=model.dtype)
    base_nlist = np.zeros((2, NN, 4), dtype=np.float32)
    base_nlist[0, :, 3] = type_j
    base_nlist[1, :, 3] = type_i
    positions = np.zeros((2, 4), dtype=np.float32)
    positions[0, 3] = type_i
    positions[1, 3] = type_j
    positions = jnp.asarray(positions)

    outputs = None
    for ri in np.asarray(r):
        nlist = base_nlist.copy()
        nlist[0, 0, 1] = ri
        nlist[1, 0, 1] = -ri
        result = model([jnp.asarray(nlist), positions, box])
        result = [np.asarray(o)[None, ...] for o in result]
        if outputs is None:
            outputs = result
        else:
            outputs = [np.concatenate([o, nw], axis=0)
                       for o, nw in zip(outputs, result)]
    return outputs


def create_frame(frame_number, N, types, typeids, positions, box):
    """Build a gsd snapshot (reference parity: ``utils.py:204-233``).

    Uses the ``gsd`` package when available; otherwise returns a
    schema-compatible lightweight snapshot that the native GSD writer
    (:func:`.gsd_io.write_gsd_frames` / :class:`.gsd_io.GSDFile`)
    understands, so the workflow needs no optional dependencies.
    """
    try:
        import gsd.hoomd
        s = gsd.hoomd.Snapshot()
    except ImportError:
        from types import SimpleNamespace
        s = SimpleNamespace(configuration=SimpleNamespace(),
                            particles=SimpleNamespace())
    s.configuration.step = frame_number
    s.configuration.box = box
    s.particles.N = N
    s.particles.types = types
    s.particles.typeid = typeids
    s.particles.position = positions
    return s
