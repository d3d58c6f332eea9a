"""Data-parallel execution over a TPU device mesh (SURVEY.md §2.3).

The reference is single-process/single-GPU; the rebuild makes data
parallelism first-class: a 1-D ``jax.sharding.Mesh`` over the ICI ring,
``shard_map``-wrapped train/eval steps, gradient ``psum`` and sync-BN inside
the compiled step. No NCCL/MPI — XLA lowers the collectives onto ICI.
"""

from triplegan_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    shard_train_step,
    shard_eval_step,
)

__all__ = ["make_mesh", "batch_sharding", "shard_train_step", "shard_eval_step"]
