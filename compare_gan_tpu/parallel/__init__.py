"""Parallelism: device meshes, sharding rules, collectives.

The reference's single strategy is synchronous data parallelism over TPU
cores (SURVEY.md §2.7): TPUEstimator batch splitting + CrossShardOptimizer
all-reduce + cross-replica BN. Here the same strategy is expressed through
`jax.sharding`: a 1-D `data` mesh, batches sharded on it, parameters and
state replicated. XLA inserts the ICI collectives (gradient psums, BN
moment all-reduces) that the reference hand-wired in
compare_gan/tpu/tpu_ops.py.
"""

from compare_gan_tpu.parallel import mesh_utils  # noqa: F401
from compare_gan_tpu.parallel import tpu_ops  # noqa: F401
