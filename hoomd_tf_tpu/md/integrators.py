"""Integrators: NVE velocity-Verlet, Nose-Hoover NVT, Langevin, Brownian.

The reference delegates integration to HOOMD (``IntegratorTwoStep``); in the
single-engine TPU design the integrator is part of the jitted step. Each
integrator splits into ``pre_force`` (kick+drift given current forces) and
``post_force`` (kick with fresh forces), so the Simulation can interleave
the force evaluation exactly like HOOMD's two-step integrators do.

All integrators are stateless Python objects; their mutable state (e.g. the
thermostat degree of freedom) lives in ``SimState.thermostat``.
"""

import jax
import jax.numpy as jnp

from ..ops.box import box_size

__all__ = ["NVE", "NVT", "Langevin", "Brownian"]


def _wrap_positions(positions, box):
    lo = box[0]
    bs = box_size(box)
    return lo + jnp.mod(positions - lo, bs)


def _kick(state, dt_half):
    v = state.velocities + dt_half * state.forces[:, :3] / \
        state.masses[:, None]
    return v


def _drift(state, dt):
    x = state.positions + dt * state.velocities
    return _wrap_positions(x, state.box)


class NVE:
    """Velocity-Verlet microcanonical integrator."""

    def init(self, state):
        return {}

    def pre_force(self, state, dt):
        import dataclasses
        v = _kick(state, dt / 2)
        state = dataclasses.replace(state, velocities=v)
        x = _drift(state, dt)
        return dataclasses.replace(state, positions=x)

    def post_force(self, state, dt):
        import dataclasses
        v = _kick(state, dt / 2)
        return dataclasses.replace(state, velocities=v)


class NVT:
    """Nose-Hoover thermostat (single chain, MTK-style symmetric splitting).

    :param kT: target temperature.
    :param tau: thermostat coupling time.
    """

    def __init__(self, kT, tau):
        self.kT = kT
        self.tau = tau

    def init(self, state):
        return {"xi": jnp.asarray(0.0, dtype=state.positions.dtype)}

    def _thermo_half(self, state, dt):
        import dataclasses
        # slot-resident layouts carry ghost rows; they record the real
        # degrees of freedom in thermostat['dof'] (md/slots.py). Ghosts
        # have zero velocity, so the kinetic sum itself needs no mask.
        dof = state.thermostat.get("dof")
        if dof is None:
            dof = 3 * state.n_particles - 3
        ke2 = jnp.sum(state.masses[:, None] * state.velocities ** 2)
        t_inst = ke2 / dof
        xi = state.thermostat["xi"]
        xi = xi + dt / 2 * (t_inst / self.kT - 1.0) / self.tau ** 2
        v = state.velocities * jnp.exp(-xi * dt / 2)
        th = dict(state.thermostat)
        th["xi"] = xi
        return dataclasses.replace(state, velocities=v, thermostat=th)

    def pre_force(self, state, dt):
        import dataclasses
        state = self._thermo_half(state, dt)
        v = _kick(state, dt / 2)
        state = dataclasses.replace(state, velocities=v)
        x = _drift(state, dt)
        return dataclasses.replace(state, positions=x)

    def post_force(self, state, dt):
        import dataclasses
        v = _kick(state, dt / 2)
        state = dataclasses.replace(state, velocities=v)
        return self._thermo_half(state, dt)


class Langevin:
    """Langevin dynamics via BAOAB splitting.

    :param kT: temperature.
    :param gamma: friction coefficient.
    """

    def __init__(self, kT, gamma=1.0):
        self.kT = kT
        self.gamma = gamma

    def init(self, state):
        return {}

    def pre_force(self, state, dt):
        import dataclasses
        v = _kick(state, dt / 2)                      # B
        state = dataclasses.replace(state, velocities=v)
        x = _drift(state, dt / 2)                     # A
        state = dataclasses.replace(state, positions=x)
        # O: exact Ornstein-Uhlenbeck
        rng, sub = jax.random.split(state.rng)
        c1 = jnp.exp(-self.gamma * dt)
        c2 = jnp.sqrt((1 - c1 ** 2) * self.kT / state.masses)[:, None]
        noise = jax.random.normal(sub, state.velocities.shape,
                                  dtype=state.velocities.dtype)
        v = c1 * state.velocities + c2 * noise
        state = dataclasses.replace(state, velocities=v, rng=rng)
        x = _drift(state, dt / 2)                     # A
        return dataclasses.replace(state, positions=x)

    def post_force(self, state, dt):
        import dataclasses
        v = _kick(state, dt / 2)                      # B
        return dataclasses.replace(state, velocities=v)


class Brownian:
    """Overdamped (Brownian) dynamics.

    :param kT: temperature.
    :param gamma: friction coefficient.
    """

    def __init__(self, kT, gamma=1.0):
        self.kT = kT
        self.gamma = gamma

    def init(self, state):
        return {}

    def pre_force(self, state, dt):
        return state

    def post_force(self, state, dt):
        import dataclasses
        rng, sub = jax.random.split(state.rng)
        mob = dt / (self.gamma * state.masses)[:, None]
        noise = jax.random.normal(sub, state.positions.shape,
                                  dtype=state.positions.dtype)
        x = (state.positions + mob * state.forces[:, :3] +
             jnp.sqrt(2 * self.kT * mob) * noise)
        x = _wrap_positions(x, state.box)
        return dataclasses.replace(state, positions=x, rng=rng)
