"""Simulation state: one pytree of HBM-resident arrays.

This replaces the reference's split ownership (HOOMD ``ParticleData`` +
``CommStruct`` staging buffers + TF tensors -- SURVEY.md section 2.2) with a
single dataclass the jitted step threads through ``lax.scan``.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.box import box_from_lengths

__all__ = ["SimState", "lattice_positions", "init_state"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SimState:
    """All mutable simulation state.

    :param positions: ``[N, 3]`` particle positions.
    :param velocities: ``[N, 3]`` velocities.
    :param types: ``[N]`` integer particle types.
    :param masses: ``[N]`` masses.
    :param box: ``[3, 3]`` box (rows: low, high, tilt).
    :param forces: ``[N, 4]`` net forces, per-particle energy in column 4.
    :param virial: ``[N, 3, 3]`` per-particle virial.
    :param step: scalar int32 timestep.
    :param rng: PRNG key for stochastic integrators.
    :param thermostat: integrator auxiliary state (dict of arrays).
    """
    positions: jax.Array
    velocities: jax.Array
    types: jax.Array
    masses: jax.Array
    box: jax.Array
    forces: jax.Array
    virial: jax.Array
    step: jax.Array
    rng: jax.Array
    thermostat: dict

    @property
    def n_particles(self):
        return self.positions.shape[0]

    @property
    def positions4(self):
        """``[N, 4]`` positions with type in the last column (the model's
        input convention, reference ``simmodel.py:106``)."""
        return jnp.concatenate(
            [self.positions,
             self.types.astype(self.positions.dtype)[:, None]], axis=-1)


def lattice_positions(n, density=None, a=None, kind="sc"):
    """Positions for ``n`` particles on a simple-cubic or fcc lattice in a
    centered cubic box; returns ``(positions [n,3], box_lengths [3])``.

    :param n: number of particles (rounded up to a full lattice internally;
        exactly ``n`` positions are returned).
    :param density: number density (sets box size); mutually exclusive with
        ``a``.
    :param a: lattice constant; mutually exclusive with ``density``.
    :param kind: ``'sc'`` or ``'fcc'``.
    """
    if kind == "sc":
        basis = np.zeros((1, 3))
    elif kind == "fcc":
        basis = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                          [0, 0.5, 0.5]])
    else:
        raise ValueError(f"unknown lattice kind {kind!r}")
    per_cell = len(basis)
    cells = int(np.ceil((n / per_cell) ** (1 / 3)))
    if density is not None:
        if a is not None:
            raise ValueError("give density or a, not both")
        a = (per_cell / density) ** (1 / 3)
    elif a is None:
        a = 1.0
    grid = np.stack(np.meshgrid(*([np.arange(cells)] * 3),
                                indexing="ij"), axis=-1).reshape(-1, 3)
    pos = (grid[:, None, :] + basis[None, :, :]).reshape(-1, 3) * a
    pos = pos[:n]
    L = cells * a
    pos = pos - L / 2 + a / 2  # center in the box
    return pos.astype(np.float32), np.array([L, L, L], dtype=np.float32)


def init_state(positions, box, types=None, velocities=None, masses=None,
               kT_init=None, seed=0, dtype=jnp.float32):
    """Build a :class:`SimState`.

    :param positions: ``[N, 3]`` or ``[N, 4]`` (type in column 4) positions.
    :param box: ``[3, 3]`` box array or ``[Lx, Ly, Lz]`` lengths (centered).
    :param types: ``[N]`` integer types (overrides positions column 4).
    :param velocities: ``[N, 3]`` initial velocities.
    :param masses: ``[N]`` masses (default 1).
    :param kT_init: if given (and no velocities), draw Maxwell-Boltzmann
        velocities at this temperature with zero net momentum.
    :param seed: PRNG seed.
    """
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.floating) and \
            jnp.zeros((), dtype=dtype).dtype != dtype:
        # without x64, JAX silently canonicalizes f64 -> f32: the user
        # asked for double-precision physics and would get f32 with no
        # error
        raise ValueError(
            f"dtype={dtype} requested but JAX canonicalizes it to "
            f"{jnp.zeros((), dtype=dtype).dtype}; double precision "
            "requires jax.config.update('jax_enable_x64', True) before "
            "building the state")
    positions = jnp.asarray(positions, dtype=dtype)
    if positions.shape[-1] == 4:
        if types is None:
            types = positions[:, 3].astype(jnp.int32)
        positions = positions[:, :3]
    n = positions.shape[0]
    if types is None:
        types = jnp.zeros(n, dtype=jnp.int32)
    else:
        types = jnp.asarray(types, dtype=jnp.int32)
    if masses is None:
        masses = jnp.ones(n, dtype=dtype)
    else:
        masses = jnp.asarray(masses, dtype=dtype)
    box = jnp.asarray(box, dtype=dtype)
    if box.ndim == 1:
        box = box_from_lengths(box, dtype=dtype)
    rng = jax.random.PRNGKey(seed)
    if velocities is None:
        if kT_init is not None:
            rng, sub = jax.random.split(rng)
            velocities = (jax.random.normal(sub, (n, 3), dtype=dtype) *
                          jnp.sqrt(kT_init / masses)[:, None])
            velocities = velocities - jnp.mean(velocities, axis=0)
        else:
            velocities = jnp.zeros((n, 3), dtype=dtype)
    else:
        velocities = jnp.asarray(velocities, dtype=dtype)
    return SimState(
        positions=positions,
        velocities=velocities,
        types=types,
        masses=masses,
        box=box,
        forces=jnp.zeros((n, 4), dtype=dtype),
        virial=jnp.zeros((n, 3, 3), dtype=dtype),
        step=jnp.asarray(0, dtype=jnp.int32),
        rng=rng,
        thermostat={},
    )
