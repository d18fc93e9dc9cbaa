"""Multi-chip scaling: device meshes and sharding rules.

The reference's parallelism is process/thread concurrency plus a
shared-memory bus (SURVEY.md §2.8); scaling the TPU rebuild across chips
uses jax.sharding over a Mesh with XLA collectives riding ICI. This package
provides the mesh construction and the sharding rules used by the inference
fan-out and the YOLO train step (and the driver's multichip dry-run).
"""

from .mesh import (
    data_parallel_sharding,
    make_mesh,
    param_shardings,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "data_parallel_sharding",
    "param_shardings",
]
