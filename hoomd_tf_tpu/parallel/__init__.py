from .mesh import make_mesh
from .shard import data_parallel_grads, sharded_train_step
from .domain import domain_decompose, halo_force_fn
from .sharded_simulation import ShardedSimulation

__all__ = ["make_mesh", "data_parallel_grads", "sharded_train_step",
           "domain_decompose", "halo_force_fn", "ShardedSimulation"]
