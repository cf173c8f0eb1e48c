"""Exactness tests for the fused scale convolutions:
up_conv2d == conv2d(unpool(x)) and down_conv2d == avg_pool(conv2d(x)),
including gradients and spectral-norm state."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compare_gan_tpu import config as gin
from compare_gan_tpu import core
from compare_gan_tpu.architectures import resnet_ops
from compare_gan_tpu.ops import arch_ops as ops


def _run(fn, x, seed=0):
    out, params, state = core.init(lambda: fn(x), jax.random.PRNGKey(seed))
    return np.asarray(out), params, state


def _apply_with(fn, params, state, x):
    out, new_state = core.apply(lambda: fn(x), params, state)
    return np.asarray(out), new_state


@pytest.mark.parametrize("k", [1, 3])
@pytest.mark.parametrize("h", [4, 8])
def test_up_conv_matches_unpool_conv(k, h):
    x = jnp.asarray(np.random.RandomState(0).randn(2, h, h, 3), jnp.float32)

    def fused(xx):
        return ops.up_conv2d(xx, 5, k, k, name="c")

    def naive(xx):
        return ops.conv2d(resnet_ops.unpool(xx), 5, k, k, 1, 1, name="c")

    out_f, params, _ = _run(fused, x)
    out_n, _ = _apply_with(naive, params, {}, x)
    assert out_f.shape == (2, 2 * h, 2 * h, 5)
    np.testing.assert_allclose(out_f, out_n, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [1, 3])
@pytest.mark.parametrize("h", [4, 8])
def test_down_conv_matches_conv_avgpool(k, h):
    x = jnp.asarray(np.random.RandomState(1).randn(2, h, h, 3), jnp.float32)

    def fused(xx):
        return ops.down_conv2d(xx, 5, k, k, name="c")

    def naive(xx):
        return resnet_ops.avg_pool_2x2(
            ops.conv2d(xx, 5, k, k, 1, 1, name="c"))

    out_f, params, _ = _run(fused, x)
    out_n, _ = _apply_with(naive, params, {}, x)
    assert out_f.shape == (2, h // 2, h // 2, 5)
    np.testing.assert_allclose(out_f, out_n, rtol=1e-5, atol=1e-5)


def test_bf16_fused_convs():
    """Fused paths accept bf16 activations (the compute_dtype path) and
    stay close to the f32 reference."""
    x32 = np.random.RandomState(7).randn(2, 8, 8, 3).astype(np.float32)

    def fused_up(xx):
        return ops.up_conv2d(xx, 4, 3, 3, name="c")

    def fused_down(xx):
        return ops.down_conv2d(xx, 4, 3, 3, name="c")

    for fn in (fused_up, fused_down):
        out32, params, _ = _run(fn, jnp.asarray(x32))
        out16, _ = _apply_with(fn, params, {},
                               jnp.asarray(x32, jnp.bfloat16))
        assert out16.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out16, np.float32), out32,
                                   rtol=0.05, atol=0.05)


def test_gradients_match():
    x = jnp.asarray(np.random.RandomState(2).randn(2, 8, 8, 3), jnp.float32)

    def fused(xx):
        return ops.up_conv2d(xx, 4, 3, 3, name="c")

    def naive(xx):
        return ops.conv2d(resnet_ops.unpool(xx), 4, 3, 3, 1, 1, name="c")

    _, params, _ = _run(fused, x)

    def loss(fn):
        def inner(p):
            out, _ = core.apply(lambda: fn(x), p, {})
            return jnp.sum(jnp.square(out))
        return jax.grad(inner)(params)

    gf, gn = loss(fused), loss(naive)
    for key in gf:
        np.testing.assert_allclose(np.asarray(gf[key]),
                                   np.asarray(gn[key]),
                                   rtol=1e-4, atol=1e-4)


def test_spectral_norm_state_matches():
    """SN normalizes the original 3x3 kernel in both paths: same u_var
    updates, same effective outputs."""
    x = jnp.asarray(np.random.RandomState(3).randn(2, 8, 8, 3), jnp.float32)

    def fused(xx):
        return ops.down_conv2d(xx, 4, 3, 3, name="c", use_sn=True)

    def naive(xx):
        return resnet_ops.avg_pool_2x2(
            ops.conv2d(xx, 4, 3, 3, 1, 1, name="c", use_sn=True))

    out_f, params, state = _run(fused, x)
    out_n, state_n = _apply_with(naive, params, state, x)
    np.testing.assert_allclose(out_f, out_n, rtol=1e-5, atol=1e-5)
    out_f2, state_f = _apply_with(fused, params, state, x)
    for key in state_f:
        np.testing.assert_allclose(np.asarray(state_f[key]),
                                   np.asarray(state_n[key]), rtol=1e-6)


def test_biggan_deep_block_fusion_exact():
    """Deep bottleneck block: fused == unfused (same params) for both
    up and down scaling."""
    from compare_gan_tpu.architectures import resnet_biggan_deep

    for scale, h in [("up", 8), ("down", 8)]:
        in_ch, out_ch = (8, 4) if scale == "up" else (4, 8)

        def build(xx):
            block = resnet_biggan_deep.BigGanDeepResNetBlock(
                name="B1", in_channels=in_ch, out_channels=out_ch,
                scale=scale, batch_norm=lambda v, **kw: v)
            return block(xx, z=None, y=None, is_training=True)

        x = jnp.asarray(
            np.random.RandomState(5).randn(2, h, h, in_ch), jnp.float32)
        gin.clear_config()
        out_fused, params, _ = _run(build, x)
        gin.parse_config("resnet_ops.fused_scale_convs = False")
        out_naive, _ = _apply_with(build, params, {}, x)
        gin.clear_config()
        np.testing.assert_allclose(out_fused, out_naive, rtol=1e-5,
                                   atol=1e-5), scale


def test_resnet_block_uses_fused_and_can_disable():
    """Block outputs identical with fusion on/off (same params)."""
    def build(xx):
        block = resnet_ops.ResNetBlock(
            name="B1", in_channels=3, out_channels=4, scale="up",
            is_gen_block=True, batch_norm=lambda v, **kw: v)
        return block(xx, z=None, y=None, is_training=True)

    x = jnp.asarray(np.random.RandomState(4).randn(2, 8, 8, 3), jnp.float32)
    out_fused, params, _ = _run(build, x)
    gin.parse_config("resnet_ops.fused_scale_convs = False")
    out_naive, _ = _apply_with(build, params, {}, x)
    np.testing.assert_allclose(out_fused, out_naive, rtol=1e-5, atol=1e-5)
