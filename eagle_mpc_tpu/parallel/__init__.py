"""Mesh sharding + batched scenario harness (the TPU scale-out layer)."""

from .batch import (convergence_summary, make_batch_solver,
                    perturbed_x0_batch)
from .mesh import (BATCH_AXIS, batch_sharding, make_mesh, replicated,
                   shard_batch)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "BATCH_AXIS", "perturbed_x0_batch", "make_batch_solver",
           "convergence_summary"]
