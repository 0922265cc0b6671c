"""ShardedSimulation: the Simulation front end over a device mesh.

Wraps the SPMD building blocks (:mod:`.sharded_md`) in the same UX as
:class:`..md.simulation.Simulation`: init a lattice, attach a model via
``tfcompute``-style arguments, ``run(n)``. Positions/velocities/forces are
sharded over the mesh's particle axis; per step the only cross-device
traffic is one all-gather of positions over ICI.

Scope (round 1): model-force NVE/NVT runs. Online training over the mesh
is available through :func:`.shard.sharded_train_step`; domain
decomposition with halo exchange through :mod:`.domain`.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..md.state import init_state, lattice_positions
from ..md.thermo import thermo as _thermo_fn
from ..models.module import get_state, set_state
from ..ops.box import box_size
from .mesh import make_mesh
from .shard import _two_set_nlist

__all__ = ["ShardedSimulation"]


class ShardedSimulation:
    """Multi-chip MD over a 1-D mesh (particle-sharded).

    :param dt: timestep.
    :param kT: if given, Nose-Hoover NVT at this temperature; else NVE.
    :param tau: thermostat coupling time.
    :param mesh: device mesh (default: all local devices).
    """

    def __init__(self, dt=0.005, kT=None, tau=0.5, mesh=None, seed=0,
                 axis="d"):
        self.dt = float(dt)
        self.kT = kT
        self.tau = tau
        self.mesh = mesh or make_mesh()
        self.axis = axis
        self.seed = seed
        self.state = None
        self.model = None
        self._scan_cache = {}

    @property
    def n_devices(self):
        return self.mesh.shape[self.axis]

    # ------------------------------------------------------------------
    def init_lattice(self, n, density=None, a=None, kT_init=None):
        """Lattice init; ``n`` is rounded up to a multiple of the device
        count so shards are equal."""
        n = -(-n // self.n_devices) * self.n_devices
        pos, lengths = lattice_positions(n, density=density, a=a)
        self.state = init_state(pos, lengths, kT_init=kT_init,
                                seed=self.seed)
        self._shard_state()
        return self.state

    def _shard_state(self):
        spec = NamedSharding(self.mesh, P(self.axis))
        rep = NamedSharding(self.mesh, P())
        s = self.state
        self.state = dataclasses.replace(
            s,
            positions=jax.device_put(s.positions, spec),
            velocities=jax.device_put(s.velocities, spec),
            types=jax.device_put(s.types, spec),
            masses=jax.device_put(s.masses, spec),
            forces=jax.device_put(s.forces, spec),
            virial=jax.device_put(s.virial, spec),
            box=jax.device_put(s.box, rep),
        )

    # ------------------------------------------------------------------
    def attach(self, model, r_cut):
        """Attach a :class:`..models.simmodel.SimModel` (forces mode)."""
        self.model = model
        self.r_cut = float(r_cut)
        # warmup/build on a representative shard-shaped input
        nlist0 = jnp.zeros(
            (self.state.n_particles, max(1, model.nneighbor_cutoff), 4),
            dtype=self.state.positions.dtype)
        model.ensure_built(
            [nlist0, self.state.positions4, self.state.box])
        self._scan_cache.clear()
        return self

    # ------------------------------------------------------------------
    def _make_run(self, n):
        model = self.model
        NN = max(1, model.nneighbor_cutoff)
        r_cut = self.r_cut
        dt = self.dt
        kT, tau = self.kT, self.tau
        axis = self.axis
        mesh = self.mesh
        n_dev = self.n_devices

        def body(values, pos4, vel, masses, forces, box, xi):
            lengths = box_size(box)
            lo = box[0]
            if kT is not None:
                # Nose-Hoover half-coupling: the kinetic reduction is a
                # psum over shards
                dof = 3.0 * pos4.shape[0] * n_dev - 3.0
                ke2 = jax.lax.psum(jnp.sum(masses[:, None] * vel ** 2),
                                   axis)
                xi = xi + dt / 2 * (ke2 / dof / kT - 1.0) / tau ** 2
                vel = vel * jnp.exp(-xi * dt / 2)
            vel = vel + 0.5 * dt * forces[:, :3] / masses[:, None]
            pos3 = pos4[:, :3] + dt * vel
            pos3 = lo + jnp.mod(pos3 - lo, lengths)
            pos4 = jnp.concatenate([pos3, pos4[:, 3:4]], axis=1)
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
            vel = vel + 0.5 * dt * f[:, :3] / masses[:, None]
            if kT is not None:
                ke2 = jax.lax.psum(jnp.sum(masses[:, None] * vel ** 2),
                                   axis)
                dof = 3.0 * pos4.shape[0] * n_dev - 3.0
                vel = vel * jnp.exp(-xi * dt / 2)
                xi = xi + dt / 2 * (ke2 / dof / kT - 1.0) / tau ** 2
            return pos4, vel, f, tuple(new_values), xi

        def stepper(values, pos4, vel, masses, forces, box, xi):
            return jax.shard_map(
                body, mesh=mesh,
                in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(),
                          P()),
                out_specs=(P(axis), P(axis), P(axis), P(), P()),
                check_vma=False)(values, pos4, vel, masses, forces, box,
                                 xi)

        @jax.jit
        def run(values, pos4, vel, masses, forces, box, xi):
            def scan_body(carry, _):
                values, pos4, vel, forces, xi = carry
                pos4, vel, forces, values, xi = stepper(
                    values, pos4, vel, masses, forces, box, xi)
                return (values, pos4, vel, forces, xi), ()
            (values, pos4, vel, forces, xi), _ = jax.lax.scan(
                scan_body, (values, pos4, vel, forces, xi), None, length=n)
            return pos4, vel, forces, values, xi

        return run

    def run(self, n):
        """Advance ``n`` steps (one compiled SPMD scan)."""
        n = int(n)
        if n not in self._scan_cache:
            self._scan_cache[n] = self._make_run(n)
        s = self.state
        values = tuple(get_state(self.model))
        xi = s.thermostat.get("xi", jnp.asarray(0.0, s.positions.dtype))
        pos4, vel, forces, values, xi = self._scan_cache[n](
            values, s.positions4, s.velocities, s.masses, s.forces,
            s.box, xi)
        set_state(self.model, list(values))
        self.state = dataclasses.replace(
            s, positions=pos4[:, :3], velocities=vel, forces=forces,
            step=s.step + n, thermostat={"xi": xi})

    def thermo(self):
        return {k: float(v) for k, v in _thermo_fn(self.state).items()}
