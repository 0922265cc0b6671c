"""ShardedSimulation: the multi-chip Simulation front end.

This is a *thin* subclass of :class:`..md.simulation.Simulation` -- the
single-chip and multi-chip engines are the same compiled step. Passing a
``mesh`` to Simulation shards the cellwise slot state along z-slabs
(spatial domain decomposition, the analog of the reference's MPI path,
SURVEY.md section 2.3); XLA partitions the physics row-wise, emits ring
collective permutes for the candidate-plane z-rolls (the halo exchange),
and all-reduces the thermostat/thermo sums. Every Simulation feature --
integrators (NVE/NVT/Langevin/Brownian), built-in forces, online
training, period gating, thermo logging, checkpointing -- therefore works
sharded with zero duplicated physics code.

The class only adds convenience: a default mesh over all local devices,
the ``kT``/``tau`` shorthand for NVT, and a ``tfcompute``-wrapping
``attach`` that falls back to the dense O(N^2) build when the box is too
small for a z-decomposed cell grid (the dense build also partitions
row-wise under the mesh -- fine at the small sizes where it triggers).
"""

import jax.numpy as jnp

from ..md import integrators as _integrators
from ..md.simulation import Simulation
from .mesh import make_mesh

__all__ = ["ShardedSimulation"]


class ShardedSimulation(Simulation):
    """Multi-chip MD over a 1-D mesh (slot/particle-sharded).

    :param dt: timestep.
    :param kT: if given (and no ``integrator``), Nose-Hoover NVT at this
        temperature; else NVE.
    :param tau: thermostat coupling time.
    :param mesh: device mesh (default: all local devices).
    :param integrator: explicit integrator (overrides ``kT``/``tau``).
    """

    def __init__(self, dt=0.005, kT=None, tau=0.5, mesh=None, seed=0,
                 axis="d", integrator=None):
        if integrator is None:
            integrator = (_integrators.NVT(kT=kT, tau=tau)
                          if kT is not None else _integrators.NVE())
        super().__init__(dt=dt, integrator=integrator, seed=seed,
                         mesh=mesh or make_mesh(), shard_axis=axis)

    @property
    def n_devices(self):
        return self.mesh.shape[self.shard_axis]

    # ------------------------------------------------------------------
    def _shard_state(self):
        """Place the particle-order state row-sharded over the mesh (the
        engine re-places the hot-loop arrays at every ``run`` anyway;
        this just avoids a host round trip for externally-edited state)."""
        if self.state.n_particles % self.n_devices == 0:
            self.state = self._apply_mesh(self.state,
                                          self.state.n_particles)

    def cellwise_feasible(self, r_cut):
        """Can the box support a z-decomposed cellwise grid on this mesh?"""
        import numpy as np
        from ..ops.box import box_size
        from ..ops.cellwise import plan_cellwise
        lengths = np.asarray(box_size(self.state.box))
        return plan_cellwise(self.state.n_particles, lengths, r_cut,
                             z_divisor=self.n_devices) is not None

    def attach(self, model, r_cut, nlist=None, **kwargs):
        """Attach a :class:`..models.simmodel.SimModel` through a
        :class:`..driver.tfcompute` (returned; also kept on ``self.tfc``).

        :param nlist: neighbor strategy; default picks the sharded
            cellwise build when the box is large enough for the mesh's
            z decomposition, else the dense O(N^2) build (row-partitioned
            by XLA -- only small systems land here).
        :param kwargs: forwarded to :meth:`..driver.tfcompute.attach`
            (``period``, ``train``, ``save_output_period``, ...).
        """
        from ..driver import tfcompute
        if self.state is None:
            raise RuntimeError("Initialize the simulation state first")
        if nlist is None:
            nlist = "cellwise" if self.cellwise_feasible(r_cut) else "n2"
        tfc = tfcompute(model)
        tfc.attach(self, r_cut=r_cut, nlist=nlist, **kwargs)
        return tfc
