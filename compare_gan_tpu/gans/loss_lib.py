"""GAN losses (rebuild of compare_gan/gans/loss_lib.py:27-154).

Each loss maps the discriminator outputs on real/fake batches to
`(d_loss, d_loss_real, d_loss_fake, g_loss)` scalars. All reductions are
means over the *global* batch: under pjit with batch sharded on the `data`
mesh axis, XLA lowers these to cross-replica psums over ICI — the
reference gets the same effect from CrossShardOptimizer averaging the
per-core gradients (modular_gan.py:606-616).

Losses are gin-selected via `loss.fn` (loss_lib.py:151-154).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from compare_gan_tpu import config as gin
from compare_gan_tpu import utils


def check_dimensions(d_real, d_fake, d_real_logits, d_fake_logits):
    """Shape/rank checks (loss_lib.py:27-50): all inputs [batch_size, 1]."""

    def _check_pair(a, b):
        if tuple(a) != tuple(b):
            raise ValueError(f"Shape mismatch: {a} vs {b}.")
        if len(a) != 2 or len(b) != 2:
            raise ValueError(f"Rank: expected 2, got {len(a)} and {len(b)}")

    if d_real is not None and d_fake is not None:
        _check_pair(d_real.shape, d_fake.shape)
    if d_real_logits is not None and d_fake_logits is not None:
        _check_pair(d_real_logits.shape, d_fake_logits.shape)
    if d_real is not None and d_real_logits is not None:
        _check_pair(d_real.shape, d_real_logits.shape)


def _sigmoid_ce_with_logits(logits, labels):
    # Numerically-stable BCE: max(x,0) - x*z + log(1 + exp(-|x|)).
    x32 = logits.astype(jnp.float32)
    return (jnp.maximum(x32, 0.0) - x32 * labels
            + jnp.log1p(jnp.exp(-jnp.abs(x32))))


@gin.configurable("non_saturating")
def non_saturating(d_real_logits, d_fake_logits, d_real=None, d_fake=None):
    """Non-saturating GAN loss (loss_lib.py:54-80)."""
    check_dimensions(d_real, d_fake, d_real_logits, d_fake_logits)
    d_loss_real = jnp.mean(_sigmoid_ce_with_logits(
        d_real_logits, jnp.ones_like(d_real_logits, jnp.float32)))
    d_loss_fake = jnp.mean(_sigmoid_ce_with_logits(
        d_fake_logits, jnp.zeros_like(d_fake_logits, jnp.float32)))
    d_loss = d_loss_real + d_loss_fake
    g_loss = jnp.mean(_sigmoid_ce_with_logits(
        d_fake_logits, jnp.ones_like(d_fake_logits, jnp.float32)))
    return d_loss, d_loss_real, d_loss_fake, g_loss


@gin.configurable("wasserstein")
def wasserstein(d_real_logits, d_fake_logits, d_real=None, d_fake=None):
    """Wasserstein loss (loss_lib.py:83-103)."""
    check_dimensions(d_real, d_fake, d_real_logits, d_fake_logits)
    d_loss_real = -jnp.mean(d_real_logits.astype(jnp.float32))
    d_loss_fake = jnp.mean(d_fake_logits.astype(jnp.float32))
    d_loss = d_loss_real + d_loss_fake
    g_loss = -d_loss_fake
    return d_loss, d_loss_real, d_loss_fake, g_loss


@gin.configurable("least_squares")
def least_squares(d_real, d_fake, d_real_logits=None, d_fake_logits=None):
    """Least-squares loss on sigmoid predictions (loss_lib.py:106-126)."""
    check_dimensions(d_real, d_fake, d_real_logits, d_fake_logits)
    d_loss_real = jnp.mean(jnp.square(d_real.astype(jnp.float32) - 1.0))
    d_loss_fake = jnp.mean(jnp.square(d_fake.astype(jnp.float32)))
    d_loss = 0.5 * (d_loss_real + d_loss_fake)
    g_loss = 0.5 * jnp.mean(jnp.square(d_fake.astype(jnp.float32) - 1.0))
    return d_loss, d_loss_real, d_loss_fake, g_loss


@gin.configurable("hinge")
def hinge(d_real_logits, d_fake_logits, d_real=None, d_fake=None):
    """Hinge loss (loss_lib.py:129-149)."""
    check_dimensions(d_real, d_fake, d_real_logits, d_fake_logits)
    d_loss_real = jnp.mean(
        jax.nn.relu(1.0 - d_real_logits.astype(jnp.float32)))
    d_loss_fake = jnp.mean(
        jax.nn.relu(1.0 + d_fake_logits.astype(jnp.float32)))
    d_loss = d_loss_real + d_loss_fake
    g_loss = -jnp.mean(d_fake_logits.astype(jnp.float32))
    return d_loss, d_loss_real, d_loss_fake, g_loss


@gin.configurable("loss")
def get_losses(fn=non_saturating, **kwargs):
    """Dispatcher, gin key `loss.fn` (loss_lib.py:151-154)."""
    return utils.call_with_accepted_args(fn, **kwargs)
