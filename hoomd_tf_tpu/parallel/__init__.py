from .mesh import make_mesh
from .shard import (sharded_force_fn, sharded_nlist, data_parallel_grads,
                    sharded_train_step)
from .domain import domain_decompose, halo_force_fn

__all__ = ["make_mesh", "sharded_force_fn", "sharded_nlist",
           "data_parallel_grads", "sharded_train_step",
           "domain_decompose", "halo_force_fn"]
