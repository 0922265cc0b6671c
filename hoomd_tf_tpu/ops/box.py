"""Simulation-box math: sizes, periodic wrapping, tilt handling.

The box convention follows the reference (hoomd-tf ``simmodel.py:597-615``):
a ``[3, 3]`` array whose rows are ``low``, ``high`` and ``tilt`` factors
``(xy, xz, yz)``.  The TPU-native rebuild keeps the same convention so user
``compute`` functions written against the reference transfer directly, but
there is no sparse-tensor workaround (that existed only to dodge a TF 2.4
Keras shape bug).
"""

import jax.numpy as jnp

__all__ = ["box_size", "wrap_vector", "make_box", "box_from_lengths"]


def make_box(low, high, tilt=None, dtype=jnp.float32):
    """Assemble a ``[3,3]`` box array from low/high corners and tilt factors."""
    low = jnp.asarray(low, dtype=dtype)
    high = jnp.asarray(high, dtype=dtype)
    if tilt is None:
        tilt = jnp.zeros(3, dtype=dtype)
    else:
        tilt = jnp.asarray(tilt, dtype=dtype)
    return jnp.stack([low, high, tilt])


def box_from_lengths(lengths, dtype=jnp.float32):
    """Centered orthorhombic box (hoomd style: ``-L/2 .. L/2``) from ``[Lx,Ly,Lz]``."""
    lengths = jnp.asarray(lengths, dtype=dtype)
    if lengths.ndim == 0:
        lengths = jnp.broadcast_to(lengths, (3,))
    return make_box(-lengths / 2, lengths / 2, dtype=dtype)


def box_size(box):
    """Edge lengths ``high - low`` of the box.

    Mirrors reference ``simmodel.py:597-603`` (minus the TF 2.4 sparse hack).

    :param box: ``[3,3]`` box array (rows: low, high, tilt).
    :return: shape ``[3]`` array of edge lengths.
    """
    box = jnp.asarray(box)
    return box[1, :] - box[0, :]


def wrap_vector(r, box):
    """Minimum-image wrap of displacement vector(s) ``r``.

    Mirrors reference ``simmodel.py:606-615``. Works on any ``[..., 3]``
    shaped input. Assumes an unskewed (orthorhombic) box, like the reference
    (which asserts against skew in ``compute_inputs``).

    :param r: displacement vector(s), trailing axis 3.
    :param box: ``[3,3]`` box array.
    :return: wrapped vector(s), same shape as ``r``.
    """
    bs = box_size(box)
    return r - jnp.round(r / bs) * bs
