"""Radial distribution function from a neighbor list."""

import jax.numpy as jnp

from .numerics import masked_nlist

__all__ = ["compute_rdf"]


def compute_rdf(nlist, r_range, type_tensor=None, nbins=100, type_i=None,
                type_j=None):
    """Pairwise radial distribution function (not normalized).

    Mirrors reference ``simmodel.py:638-669`` with one fix: the reference
    histograms into ``nbins + 2`` bins spanning ``r_range`` and then drops
    the edge bins, so its bin width disagrees with the shell volumes it
    divides by. Here the ``nbins`` histogram bins align exactly with the
    shell radii; padded (r == 0) neighbor slots and out-of-range distances
    are excluded, which is what dropping the edge bins accomplished upstream.

    :param nlist: ``[N, NN, 4]`` neighbor list.
    :param r_range: ``(r_min, r_max)`` for the histogram.
    :param type_tensor: ``[N]`` particle types (e.g. ``positions[:, 3]``).
    :param nbins: number of histogram bins.
    :param type_i: center-particle type filter.
    :param type_j: neighbor type filter.
    :return: ``(rdf [nbins], bin-center radii [nbins])``.
    """
    from .direct import NlistPlanes
    r_range = jnp.asarray(r_range, dtype=jnp.float32)
    if type_tensor is not None:
        nlist = masked_nlist(nlist, type_tensor, type_i, type_j)
    if isinstance(nlist, NlistPlanes):
        r = jnp.sqrt(nlist.r2())
    else:
        r = jnp.linalg.norm(nlist[:, :, :3], axis=2)
    lo, hi = r_range[0], r_range[1]
    width = (hi - lo) / nbins
    valid = (r > 0) & (r >= lo) & (r < hi)
    bin_idx = jnp.clip(((r - lo) / width).astype(jnp.int32), 0, nbins - 1)
    # invalid slots contribute 0.0, so their (clipped) bin index is harmless
    hist = jnp.zeros(nbins, dtype=jnp.float32).at[bin_idx].add(
        valid.astype(jnp.float32))
    shell_rs = jnp.linspace(lo, hi, nbins + 1)
    vis_rs = (shell_rs[1:] + shell_rs[:-1]) * 0.5
    vols = shell_rs[1:] ** 3 - shell_rs[:-1] ** 3
    return hist / vols, vis_rs
