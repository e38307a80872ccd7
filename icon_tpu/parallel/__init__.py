"""Device-mesh parallelism (SURVEY.md §2.4).

The reference's only parallelism is Lightning DDP data-parallel training +
single-GPU inference. Here both axes are first-class TPU citizens:

- data-parallel training: batch sharded over a 1-D ``mesh('data')``; params
  replicated; XLA inserts the gradient all-reduce (NCCL allreduce analog) and
  global batch-norm statistics (``sync_batchnorm=True`` analog) automatically
  from the shardings.
- point-parallel inference: the recon engine's occupancy queries shard the
  point axis across devices — the natural TPU scaling of the reference's
  single-GPU hot loop (seg3d_lossless.py:125-144).
"""

from icon_tpu.parallel.mesh import (data_sharding, make_mesh,
                                    make_mesh_for_batch, replicate,
                                    shard_batch, shard_points, shard_query)
