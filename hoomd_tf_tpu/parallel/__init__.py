from .mesh import make_mesh
from .shard import (sharded_force_fn, sharded_nlist, data_parallel_grads,
                    sharded_train_step)
from .domain import domain_decompose, halo_force_fn
from .sharded_md import make_sharded_md_step, simulate_sharded
from .sharded_simulation import ShardedSimulation

__all__ = ["make_mesh", "sharded_force_fn", "sharded_nlist",
           "data_parallel_grads", "sharded_train_step",
           "domain_decompose", "halo_force_fn",
           "make_sharded_md_step", "simulate_sharded",
           "ShardedSimulation"]
