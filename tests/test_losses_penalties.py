"""Loss/penalty numerics (rebuild of reference loss-behavior coverage in
gans/modular_gan_test.py:56-95's matrix, plus analytic value checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compare_gan_tpu import config as gin
from compare_gan_tpu import core
from compare_gan_tpu.gans import loss_lib, penalty_lib
from compare_gan_tpu.ops import rng as random


def _inputs(dr, df):
    d_real_logits = jnp.asarray(dr, jnp.float32).reshape(-1, 1)
    d_fake_logits = jnp.asarray(df, jnp.float32).reshape(-1, 1)
    return (jax.nn.sigmoid(d_real_logits), jax.nn.sigmoid(d_fake_logits),
            d_real_logits, d_fake_logits)


def test_non_saturating_analytic():
    d_real, d_fake, drl, dfl = _inputs([0.0, 0.0], [0.0, 0.0])
    d_loss, d_loss_real, d_loss_fake, g_loss = loss_lib.non_saturating(
        d_real_logits=drl, d_fake_logits=dfl, d_real=d_real, d_fake=d_fake)
    # BCE at logit 0 = log 2 for both labels.
    np.testing.assert_allclose(d_loss_real, np.log(2), rtol=1e-6)
    np.testing.assert_allclose(d_loss_fake, np.log(2), rtol=1e-6)
    np.testing.assert_allclose(d_loss, 2 * np.log(2), rtol=1e-6)
    np.testing.assert_allclose(g_loss, np.log(2), rtol=1e-6)


def test_wasserstein_analytic():
    _, _, drl, dfl = _inputs([1.0, 3.0], [0.5, 1.5])
    d_loss, d_loss_real, d_loss_fake, g_loss = loss_lib.wasserstein(
        d_real_logits=drl, d_fake_logits=dfl)
    np.testing.assert_allclose(d_loss_real, -2.0, rtol=1e-6)
    np.testing.assert_allclose(d_loss_fake, 1.0, rtol=1e-6)
    np.testing.assert_allclose(d_loss, -1.0, rtol=1e-6)
    np.testing.assert_allclose(g_loss, -1.0, rtol=1e-6)


def test_least_squares_analytic():
    d_real = jnp.asarray([[1.0], [0.5]])
    d_fake = jnp.asarray([[0.0], [0.5]])
    d_loss, _, _, g_loss = loss_lib.least_squares(d_real=d_real,
                                                  d_fake=d_fake)
    np.testing.assert_allclose(d_loss, 0.5 * (0.125 + 0.125), rtol=1e-6)
    np.testing.assert_allclose(g_loss, 0.5 * np.mean([1.0, 0.25]), rtol=1e-6)


def test_hinge_analytic():
    _, _, drl, dfl = _inputs([0.5, 2.0], [-2.0, 0.0])
    d_loss, d_loss_real, d_loss_fake, g_loss = loss_lib.hinge(
        d_real_logits=drl, d_fake_logits=dfl)
    np.testing.assert_allclose(d_loss_real, 0.25, rtol=1e-6)  # relu(1-x)
    np.testing.assert_allclose(d_loss_fake, 0.5, rtol=1e-6)   # relu(1+x)
    np.testing.assert_allclose(g_loss, 1.0, rtol=1e-6)


def test_loss_shape_check_raises():
    with pytest.raises(ValueError):
        loss_lib.hinge(d_real_logits=jnp.zeros((4, 1)),
                       d_fake_logits=jnp.zeros((2, 1)))
    with pytest.raises(ValueError):
        loss_lib.hinge(d_real_logits=jnp.zeros((4,)),
                       d_fake_logits=jnp.zeros((4,)))


def test_gin_loss_selection():
    gin.parse_config("loss.fn = @hinge")
    _, _, drl, dfl = _inputs([2.0], [-2.0])
    d_loss, _, _, _ = loss_lib.get_losses(d_real_logits=drl,
                                          d_fake_logits=dfl,
                                          d_real=None, d_fake=None)
    np.testing.assert_allclose(d_loss, 0.0, atol=1e-6)


def test_wgangp_penalty_linear_disc():
    """For D(x) = <w, x>, the penalty is (||w|| - 1)^2 for any interpolate
    (analytic; reference wgangp_penalty, penalty_lib.py:60-82)."""
    w = np.full((2, 2, 3), 0.5, np.float32)  # ||w|| = sqrt(12*0.25)

    def d_logits_fn(x):
        return jnp.sum(x * w, axis=(1, 2, 3), keepdims=False)[:, None]

    x = jnp.zeros((4, 2, 2, 3))
    x_fake = jnp.ones((4, 2, 2, 3))
    with random.rng_context(jax.random.PRNGKey(3)):
        p = penalty_lib.wgangp_penalty(d_logits_fn=d_logits_fn, x=x,
                                       x_fake=x_fake)
    expected = (np.sqrt(1e-4 + 12 * 0.25) - 1.0) ** 2
    np.testing.assert_allclose(p, expected, rtol=1e-5)


def test_dragan_penalty_runs_and_differentiable():
    def d_logits_fn(x):
        return jnp.sum(jnp.square(x), axis=(1, 2, 3))[:, None]

    x = jnp.full((4, 2, 2, 1), 0.5)

    def outer(scale):
        with random.rng_context(jax.random.PRNGKey(0)):
            return penalty_lib.dragan_penalty(
                d_logits_fn=lambda xx: d_logits_fn(xx * scale), x=x)

    g = jax.grad(outer)(1.0)
    assert np.isfinite(g)


def test_l2_penalty_kernels_only():
    d_params = {"discriminator/fc/kernel": jnp.ones((2, 2)),
                "discriminator/fc/bias": jnp.full((2,), 100.0)}
    p = penalty_lib.l2_penalty(d_params)
    np.testing.assert_allclose(p, 0.5 * 4.0, rtol=1e-6)


def test_gin_penalty_selection():
    gin.parse_config("penalty.fn = @no_penalty")
    p = penalty_lib.get_penalty_loss(x=None, x_fake=None,
                                     d_logits_fn=None, d_params=None)
    assert float(p) == 0.0
