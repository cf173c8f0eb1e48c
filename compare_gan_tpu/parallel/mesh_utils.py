"""Mesh construction + sharded train-loop compilation.

This is the replacement for TPUEstimator's replication machinery
(abstract_gan.py:41-47): a 1-D `data` mesh, TrainState replicated, batches
sharded on `data`. Gradient all-reduce (CrossShardOptimizer,
modular_gan.py:606-616) and cross-replica BN moments (arch_ops.py:258-263)
fall out of XLA's partitioner because the losses/moments are written over
the global batch.

Scale-out beyond pure DP is available via `extra_axes` (e.g. a `model`
axis for spatial/channel sharding of the 512px models) — an extension the
reference does not have (SURVEY.md §2.7).
"""

from __future__ import annotations

import math
from typing import Iterator, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              extra_axes: Tuple[Tuple[str, int], ...] = ()) -> Mesh:
    """1-D data mesh by default; with extra_axes, the first axis is
    data = total/∏(extra) and extra axes follow."""
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"Requested a {num_devices}-device mesh but only "
                f"{len(devices)} devices are available — refusing to "
                f"silently train on a narrower mesh (global-batch "
                f"semantics would change).")
        devices = devices[:num_devices]
    n = len(devices)
    extra = math.prod(s for _, s in extra_axes) if extra_axes else 1
    if n % extra:
        raise ValueError(f"{n} devices not divisible by extra axes {extra}.")
    shape = (n // extra,) + tuple(s for _, s in extra_axes)
    names = ("data",) + tuple(a for a, _ in extra_axes)
    return Mesh(np.asarray(devices).reshape(shape), names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, leading_stack: bool = False) -> NamedSharding:
    """Shard the (global) batch dim over `data`. With leading_stack, dim 0
    is the scan/time axis and dim 1 is the batch."""
    if leading_stack:
        return NamedSharding(mesh, P(None, "data"))
    return NamedSharding(mesh, P("data"))


def shard_train_state(ts, mesh: Mesh):
    """Replicate the TrainState across the mesh (params/state/opt all
    replicated — pure DP, like TPUEstimator's per-core copies)."""
    return jax.device_put(ts, replicated(mesh))


def make_batch_sharder(mesh: Mesh, leading_stack: bool = False):
    """Host batch -> device batch sharded over `data`.

    Single-process: a plain device_put (the sharding slices the host
    array over the local devices). Multi-process: each host holds only
    its 1/num_processes SHARD of the global batch (per-host input
    pipelines, reference abstract_gan.py:41-47), and device_put would
    both mis-shape and same-value-assert across processes — the batch is
    assembled with make_array_from_process_local_data instead, which
    transfers each host's shard onto its addressable devices and stitches
    the global array (host p owns rows [p*local, (p+1)*local) because
    the mesh's data axis enumerates devices in process order)."""
    sharding = batch_sharding(mesh, leading_stack)
    batch_dim = 1 if leading_stack else 0

    def shard_batch(batch):
        return jax.tree_util.tree_map(
            lambda x: _put_global(x, sharding, batch_dim), batch)

    return shard_batch


def _put_global(x, sharding: NamedSharding, batch_dim: int):
    """Host array -> global device array under `sharding`.

    Single-process: a plain device_put (the sharding slices the host
    array over the local devices). Multi-process: each host holds only
    its 1/num_processes SHARD of the global batch dim (per-host input
    pipelines, reference abstract_gan.py:41-47), and device_put would
    both mis-shape and same-value-assert across processes — the batch is
    assembled with make_array_from_process_local_data instead, which
    transfers each host's shard onto its addressable devices and
    stitches the global array (host p owns batch rows
    [p*local, (p+1)*local) because the mesh's leading axis enumerates
    devices in process order; non-batch dims, e.g. a spatially-sharded
    image height, must be fully addressable per process, which
    make_array_from_process_local_data verifies)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    global_shape = (x.shape[:batch_dim]
                    + (x.shape[batch_dim] * jax.process_count(),)
                    + x.shape[batch_dim + 1:])
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(x), global_shape)


def stage_chunk(batch_iter: Iterator, steps: int, shard_batch):
    """Pull `steps` host batches, stack on a leading scan axis, transfer
    sharded. This is the infeed replacement: one H2D per chunk, and jax's
    async dispatch overlaps it with the previous chunk's compute."""
    chunk = [next(batch_iter) for _ in range(steps)]
    stacked = {k: np.stack([c[k] for c in chunk]) for k in chunk[0]}
    return shard_batch(stacked)


def default_tpu_compiler_options():
    """Measured-default TPU compiler options for the training loop.

    Copy-insertion region analysis removes part of the conv-bwd layout-
    copy overhead: +1.9% BigGAN-128 steps/s measured on v5e (16.43 ->
    16.73; README perf notes). Flag experiments also measured:
    xla_tpu_scoped_vmem_limit_kib=65536 -3.6%, =32768 neutral — left at
    default. Returns None off-TPU (CPU/GPU XLA reject tpu options)."""
    if jax.devices()[0].platform in ("tpu", "axon"):
        return {"xla_tpu_copy_insertion_use_region_analysis": "true"}
    return None


def compile_train_loop(gan, ts, mesh: Mesh, batch_size: int,
                       steps_per_loop: int, compiler_options=None):
    """Returns (jitted_loop, shard_batch, sharded_ts). The loop donates the
    TrainState buffers (in-place update on device, zero copy).

    compiler_options: dict forwarded to the XLA compile (AOT-compiled on
    first call); None = default_tpu_compiler_options()."""
    n_data = mesh.shape["data"]
    total = batch_size * gan.num_sub_steps
    if total % n_data:
        raise ValueError(
            f"Global per-step batch {total} (= {batch_size} x "
            f"{gan.num_sub_steps} sub-steps) must divide over "
            f"{n_data} data-parallel devices.")
    loop = gan.make_train_loop(batch_size, steps_per_loop)
    ts = shard_train_state(ts, mesh)
    # Input shardings propagate from the device_put layouts; XLA partitions
    # the step and inserts the ICI collectives.
    jitted = jit_train_fn(loop, compiler_options)
    shard_batch = make_batch_sharder(mesh, leading_stack=True)
    return jitted, shard_batch, ts


def jit_train_fn(fn, compiler_options=None):
    """jax.jit(fn, donate_argnums=(0,)) with the training compiler
    options applied (None = default_tpu_compiler_options()). The ONE
    place the options-aware jit recipe lives: the main scan loop and
    runner_lib's shorter tail loops must compile with identical flags."""
    jitted = jax.jit(fn, donate_argnums=(0,))
    if compiler_options is None:
        compiler_options = default_tpu_compiler_options()
    if compiler_options:
        jitted = _aot_on_first_call(jitted, compiler_options)
    return jitted


def _aot_on_first_call(jitted, compiler_options):
    """Wrap a jitted fn so its first call AOT-compiles with explicit
    compiler options (jit's lazy path has no options hook)."""
    box = {}

    def run(*args):
        if "compiled" not in box:
            box["compiled"] = jitted.lower(*args).compile(
                compiler_options=dict(compiler_options))
        return box["compiled"](*args)

    return run


def compile_train_step(gan, ts, mesh: Mesh, batch_size: int,
                       spatial: bool = False):
    """Single-step variant (tests, debugging).

    spatial=True additionally shards the image height over a `model` mesh
    axis (make_mesh(extra_axes=(("model", k),))): XLA spatially partitions
    the convolutions with halo exchanges — the scale-out extension for
    512px models the reference lacks (SURVEY.md §2.7)."""
    step = gan.make_train_step(batch_size)
    ts = shard_train_state(ts, mesh)
    jitted = jax.jit(step, donate_argnums=(0,))
    if spatial:
        if "model" not in mesh.axis_names:
            raise ValueError("spatial=True needs a 'model' mesh axis.")
        sharding = NamedSharding(mesh, P("data", "model"))

        def shard_batch(batch):
            return {
                "images": _put_global(batch["images"], sharding, 0),
                "labels": _put_global(
                    batch["labels"], NamedSharding(mesh, P("data")), 0),
            }
    else:
        shard_batch = make_batch_sharder(mesh, leading_stack=False)
    return jitted, shard_batch, ts
