"""GAN gradient penalties (rebuild of compare_gan/gans/penalty_lib.py).

The reference computes grad-of-D with `tf.gradients` inside the loss graph
and relies on TF's second-order autodiff when the optimizer differentiates
the penalty (penalty_lib.py:52,78). In JAX the penalty is written with
`jax.grad` over a pure closure `d_logits_fn(x) -> logits`; grad-of-grad is
native. The closure is supplied by the trainer and runs the discriminator
*without* committing spectral-norm u updates (the trainer commits u state
only on the main D forward — SURVEY.md §7 "spectral-norm statefulness").

Gin-selected via `penalty.fn` (penalty_lib.py:105-108).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from compare_gan_tpu import config as gin
from compare_gan_tpu import utils
from compare_gan_tpu.ops import rng as random


def _slope_penalty(d_logits_fn, x_perturbed):
    """mean((||∇_x D(x)||₂ − 1)²) with the reference's 1e-4 stabilizer
    (penalty_lib.py:53-55,79-81)."""
    grad_fn = jax.grad(
        lambda xx: jnp.sum(d_logits_fn(xx).astype(jnp.float32)))
    gradients = grad_fn(x_perturbed)
    slopes = jnp.sqrt(1e-4 + jnp.sum(
        jnp.square(gradients.astype(jnp.float32)),
        axis=tuple(range(1, gradients.ndim))))
    return jnp.mean(jnp.square(slopes - 1.0))


@gin.configurable("no_penalty")
def no_penalty():
    return jnp.float32(0.0)


@gin.configurable("dragan_penalty")
def dragan_penalty(d_logits_fn, x):
    """DRAGAN penalty (penalty_lib.py:34-56): perturb real samples by
    std(x) * U(-0.5, 0.5), clip to [0,1], penalize D gradient slope."""
    var = jnp.var(x.astype(jnp.float32))
    std = jnp.sqrt(var)
    noise = random.uniform(x.shape, name="dragan_noise") - 0.5
    # Cast the whole perturbation: f32 `std` would promote x_noisy (and
    # the penalty's entire D forward) to f32 under bf16 training.
    x_noisy = jnp.clip(x + (std * noise).astype(x.dtype), 0.0, 1.0)
    return _slope_penalty(d_logits_fn, x_noisy)


@gin.configurable("wgangp_penalty")
def wgangp_penalty(d_logits_fn, x, x_fake):
    """WGAN-GP penalty (penalty_lib.py:60-82): interpolate real/fake with
    per-example alpha, penalize D gradient slope toward norm 1."""
    alpha = random.uniform((x.shape[0],) + (1,) * (x.ndim - 1), name="alpha")
    interpolates = x + alpha.astype(x.dtype) * (x_fake - x)
    return _slope_penalty(d_logits_fn, interpolates)


@gin.configurable("l2_penalty")
def l2_penalty(d_params):
    """L2 penalty: mean over D kernels of 0.5·Σw² (penalty_lib.py:86-102;
    biases excluded by the `/kernel` name filter, matching the reference's
    `/kernel:0` convention kept by ops.linear/conv2d)."""
    kernels = [v for name, v in d_params.items() if name.endswith("/kernel")]
    if not kernels:
        return jnp.float32(0.0)
    losses = [0.5 * jnp.sum(jnp.square(v.astype(jnp.float32)))
              for v in kernels]
    return jnp.mean(jnp.stack(losses))


@gin.configurable("penalty")
def get_penalty_loss(fn=no_penalty, **kwargs):
    """Dispatcher, gin key `penalty.fn` (penalty_lib.py:105-108)."""
    return utils.call_with_accepted_args(fn, **kwargs)
