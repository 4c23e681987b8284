"""Device-mesh parallelism: replica sharding and collective reductions.

The reference has no distributed backend (SURVEY.md section 2c: k8s fan-out
with shared volumes only). Here parallelism is first-class JAX:

- ``replica_mesh`` builds the 1-D mesh the REMD engine shards its replica
  axis over (swap neighbor access lowers to ICI collective-permutes).
- ``make_data_parallel_step`` / ``train_deeptica_data_parallel`` run the
  DeepTICA VAMP-2 optimizer step SPMD over the batch axis with exact
  serial parity (psum'ed covariance moments, replicated update).
- ``sharded_*`` reductions implement the shard-parallel estimation path:
  transition counts, TICA covariance moments, and histogram accumulation
  as psum-style tree reductions over a mesh — the SURVEY section-2c
  "collectives layer" (ICI within a slice; DCN only for cross-slice
  aggregation, which reduces over the same API).
"""

from .mesh import replica_mesh, shard_replicas, data_mesh
from .train import make_data_parallel_step, train_deeptica_data_parallel
from .reductions import (
    sharded_transition_counts,
    sharded_covariance_moments,
    sharded_histogram,
)

__all__ = [
    "replica_mesh",
    "shard_replicas",
    "data_mesh",
    "sharded_transition_counts",
    "sharded_covariance_moments",
    "sharded_histogram",
    "make_data_parallel_step",
    "train_deeptica_data_parallel",
]
