"""Deterministic stateless RNG, TPU-native.

The reference builds determinism out of stateless TF ops keyed by
SHA-512(op-name) plus a per-step offset enumerated into the input pipeline
(compare_gan/tpu/tpu_random.py:16-59,81-154). JAX is stateless-native, so the
rebuild is direct: a thread-local base key, folded with (a) a hash of the
op's full scope name and (b) a per-call counter. The trainer derives the base
key as fold_in(seed, global_step, sub_step), which reproduces the reference's
"identical across runs, different across steps" contract
(tpu/tpu_random_test.py:88-170). Per-core decorrelation is free: all random
tensors are drawn in global-batch shape and sharded over the `data` mesh
axis, so each chip holds a distinct slice of one deterministic stream —
stronger than the reference's per-core streams because results are invariant
to mesh size.
"""

from __future__ import annotations

import hashlib
import threading
from typing import Optional

import jax
import jax.numpy as jnp

from compare_gan_tpu import core

_local = threading.local()


def _name_to_seed(name: str) -> int:
    # SHA-512 of the op name mod 2**31-1, mirroring tpu_random.py:48-52.
    digest = hashlib.sha512(name.encode("utf-8")).digest()
    return int.from_bytes(digest[:8], "little") % (2**31 - 1)


class rng_context:
    """Installs a base PRNG key for ops.random.* calls in scope."""

    def __init__(self, key: Optional[jax.Array]):
        self.key = key

    def __enter__(self):
        self.prev = getattr(_local, "key", None)
        self.prev_counter = getattr(_local, "counter", 0)
        _local.key = self.key
        _local.counter = 0
        return self

    def __exit__(self, *exc):
        _local.key = self.prev
        _local.counter = self.prev_counter
        return False


def set_base_key(key: Optional[jax.Array]) -> None:
    _local.key = key
    _local.counter = 0


def base_key_from_step(seed_key: jax.Array, step: jax.Array,
                       sub_step=0) -> jax.Array:
    """fold_in(seed, step, sub_step): the per-training-sub-step stream."""
    return jax.random.fold_in(jax.random.fold_in(seed_key, step), sub_step)


def _next_key(name: Optional[str]) -> jax.Array:
    key = getattr(_local, "key", None)
    if key is None:
        raise RuntimeError(
            "ops.random.* used without an rng_context. Wrap the forward pass "
            "in ops.random.rng_context(key).")
    if name is None:
        scope = core.current_scope() if core.in_context() else ""
        counter = getattr(_local, "counter", 0)
        _local.counter = counter + 1
        name = f"{scope}#{counter}"
    return jax.random.fold_in(key, _name_to_seed(name))


def uniform(shape, dtype=jnp.float32, minval=0.0, maxval=1.0,
            name: Optional[str] = None) -> jax.Array:
    return jax.random.uniform(_next_key(name), shape, dtype, minval, maxval)


def normal(shape, dtype=jnp.float32, mean=0.0, stddev=1.0,
           name: Optional[str] = None) -> jax.Array:
    return mean + stddev * jax.random.normal(_next_key(name), shape, dtype)


def categorical(logits, name: Optional[str] = None) -> jax.Array:
    return jax.random.categorical(_next_key(name), logits)


def randint(shape, minval, maxval, dtype=jnp.int32,
            name: Optional[str] = None) -> jax.Array:
    return jax.random.randint(_next_key(name), shape, minval, maxval, dtype)


# The reference's configs bind z.distribution_fn to TF RNG symbols
# (example_configs/biggan_imagenet128.gin); alias them to the
# deterministic TPU-native stream (gans/ops.py:24-25 did the same).
# Registered here — not in modular_gan — so ANY consumer of a gin
# snapshot (export loaders, demo, eval shims) resolves @tf.random.*
# references without importing the trainer stack.
from compare_gan_tpu import config as _gin  # noqa: E402

_gin.register("tf.random.normal", normal)
_gin.register("tf.random.uniform", uniform)
_gin.register("random_normal", normal)
_gin.register("random_uniform", uniform)
