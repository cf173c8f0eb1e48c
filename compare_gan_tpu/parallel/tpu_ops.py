"""Cross-replica collectives (rebuild of compare_gan/tpu/tpu_ops.py).

These exist for callers inside `shard_map`/`pmap` regions that carry an
explicit mesh axis. The main training path does NOT use them: it is written
in global-batch terms under jit-with-shardings, where XLA derives the same
collectives automatically. The reference needed hand-built equivalents
because TF1 exposed only `cross_replica_sum`:

  cross_replica_concat (tpu_ops.py:29-72)  — one-hot-matmul emulated
      all-gather → `lax.all_gather` (native ICI all-gather).
  cross_replica_mean (tpu_ops.py:75-91)    — psum/num, group_assignment →
      `lax.pmean` with axis_index_groups.
  cross_replica_moments (tpu_ops.py:95-125) — E[x²]−E[x]² with the two
      all-reduces fused into ONE pmean on a stacked pair (the reference's
      `parallel=True` overlap, done properly).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def cross_replica_concat(value, axis_name: str = "data"):
    """All-gather along the named mesh axis (tpu_ops.py:29-72). Output
    leading dim = num_replicas * value.shape[0]."""
    gathered = jax.lax.all_gather(value, axis_name)
    return gathered.reshape((-1,) + tuple(value.shape[1:]))


def cross_replica_mean(value, axis_name: str = "data",
                       group_size: Optional[int] = None):
    """Mean over replicas, optionally in contiguous groups of `group_size`
    (tpu_ops.py:75-91 group_assignment semantics)."""
    if group_size is None:
        return jax.lax.pmean(value, axis_name)
    num = jax.lax.axis_size(axis_name)
    if num % group_size:
        raise ValueError(
            f"Group size {group_size} must divide replica count {num}.")
    # axis_index_groups is not supported under shard_map on all backends;
    # an all-gather + static slice per replica lowers to one ICI gather.
    idx = jax.lax.axis_index(axis_name)
    gathered = jax.lax.all_gather(value, axis_name)
    start = (idx // group_size) * group_size
    group_vals = jax.lax.dynamic_slice_in_dim(gathered, start, group_size)
    return jnp.mean(group_vals, axis=0)


def cross_replica_moments(value, axes: Sequence[int] = (0,),
                          axis_name: str = "data",
                          group_size: Optional[int] = None):
    """Distributed mean/variance via E[x²]−E[x]² (tpu_ops.py:95-125).
    Both statistics ride one all-reduce (stacked), in f32."""
    x32 = value.astype(jnp.float32)
    local = jnp.stack([jnp.mean(x32, axis=tuple(axes)),
                       jnp.mean(jnp.square(x32), axis=tuple(axes))])
    stats = cross_replica_mean(local, axis_name, group_size)
    mean, mean_sq = stats[0], stats[1]
    return mean, mean_sq - jnp.square(mean)
