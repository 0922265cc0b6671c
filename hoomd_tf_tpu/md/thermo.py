"""Thermodynamic observables from the simulation state.

Replaces HOOMD's ``compute.thermo`` + the reference's ``getLogValue``
energy hook (``TensorflowCompute.cc:376-395``).
"""

import jax.numpy as jnp

from ..ops.box import box_size

__all__ = ["kinetic_energy", "temperature", "potential_energy", "pressure",
           "thermo"]


def kinetic_energy(state):
    return 0.5 * jnp.sum(state.masses[:, None] * state.velocities ** 2)


def temperature(state):
    """Instantaneous kinetic temperature, dof = 3N - 3 (zero net momentum).

    Slot-resident states carry ghost rows with zero velocity; their real
    dof is recorded in ``thermostat['dof']`` (see md/slots.py)."""
    dof = (state.thermostat or {}).get("dof")
    if dof is None:
        dof = 3 * state.n_particles - 3
    return 2.0 * kinetic_energy(state) / dof


def potential_energy(state):
    """Sum of per-particle energies carried in forces column 4 (the
    reference's ``"tensorflow"`` logged quantity)."""
    return jnp.sum(state.forces[:, 3])


def pressure(state):
    """Scalar pressure ``P = (2 KE + W) / (3 V)`` with the pairwise virial
    ``W = sum_i tr(virial_i)``."""
    vol = jnp.prod(box_size(state.box))
    w = jnp.sum(jnp.trace(state.virial, axis1=-2, axis2=-1))
    return (2.0 * kinetic_energy(state) + w) / (3.0 * vol)


def thermo(state):
    """Dict of the standard log quantities."""
    return {
        "kinetic_energy": kinetic_energy(state),
        "potential_energy": potential_energy(state),
        "temperature": temperature(state),
        "pressure": pressure(state),
    }
