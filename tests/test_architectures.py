"""Architecture tests: build-and-range checks per arch x resolution
(port of architectures/architectures_test.py:36-57) and golden parameter
counts for BigGAN (resnet_biggan_test.py:139,154) and BigGAN-deep."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compare_gan_tpu import core
from compare_gan_tpu.architectures import GENERATORS, DISCRIMINATORS
from compare_gan_tpu.architectures import resnet_biggan, resnet_biggan_deep
from compare_gan_tpu.gans import consts as c
from compare_gan_tpu.ops import arch_ops


def _build_and_check(arch, image_shape, z_dim=120, batch_size=2):
    gen = GENERATORS[arch](image_shape=image_shape)
    disc = DISCRIMINATORS[arch]()

    def net(z, y):
        fake = gen(z, y, is_training=True)
        out, logits, h = disc(fake, y, is_training=True)
        return fake, out, logits

    z = jax.random.normal(jax.random.PRNGKey(1), (batch_size, z_dim))
    y = None
    (fake, out, logits), params, state = core.init(
        net, jax.random.PRNGKey(0), z, y)
    assert fake.shape == (batch_size,) + tuple(image_shape)
    assert np.asarray(fake).min() >= 0.0 and np.asarray(fake).max() <= 1.0
    assert logits.shape == (batch_size, 1)
    # G/D parameter partition is disjoint by prefix.
    g = core.filter_prefix(params, "generator")
    d = core.filter_prefix(params, "discriminator")
    assert set(g) | set(d) == set(params)
    return params, state


@pytest.mark.parametrize("arch,shape", [
    (c.DCGAN_ARCH, (64, 64, 3)),
    (c.DUMMY_ARCH, (32, 32, 3)),
    (c.INFOGAN_ARCH, (32, 32, 3)),
    (c.RESNET_CIFAR_ARCH, (32, 32, 3)),
    pytest.param(c.RESNET_STL_ARCH, (48, 48, 3),
                 marks=pytest.mark.slow),
    (c.RESNET5_ARCH, (128, 128, 3)),
    (c.SNDCGAN_ARCH, (32, 32, 3)),
])
def test_build_and_range(arch, shape):
    _build_and_check(arch, shape)


@pytest.mark.slow
def test_build_resnet30():
    _build_and_check(c.RESNET30_ARCH, (128, 128, 3))


class TestBigGan:
    def test_golden_param_counts_128(self):
        """G = 70,433,988 / D = 87,982,370 (resnet_biggan.py:40-46)."""
        batch_size = 2
        gen = resnet_biggan.Generator(
            image_shape=(128, 128, 3),
            batch_norm_fn=arch_ops.conditional_batch_norm)
        disc = resnet_biggan.Discriminator()

        def net(z, y):
            fake = gen(z, y, is_training=True)
            return disc(fake, y, is_training=True)

        z = jnp.zeros((batch_size, 120))
        y = jax.nn.one_hot(jnp.ones((batch_size,), jnp.int32), 1000)
        _, params, state = core.init(net, jax.random.PRNGKey(0), z, y)

        g_params = core.filter_prefix(params, "generator")
        d_params = core.filter_prefix(params, "discriminator")
        assert core.count_params(g_params) == 70433988
        assert core.count_params(d_params) == 87982370

        # Structural goldens from resnet_biggan_test.py:113-141.
        layers_with_bias = {"fc_noise", "up_conv_shortcut", "up_conv1",
                            "same_conv2", "final_conv"}
        for name in g_params:
            parts = name.split("/")
            layer, var_name = parts[-2], parts[-1]
            if layer not in layers_with_bias:
                assert var_name != "bias", name
            if len(parts) >= 3 and parts[-3] == "condition":
                assert var_name == "kernel", name
                assert g_params[name].shape[0] == 148, name
            if layer == "embed_y":
                assert tuple(g_params[name].shape) == (1000, 128)
            if layer == "up_conv_shortcut" and var_name == "kernel":
                assert tuple(g_params[name].shape[:2]) == (1, 1)

    @pytest.mark.slow
    def test_conditional_output_shapes_64(self):
        gen = resnet_biggan.Generator(
            image_shape=(64, 64, 3),
            batch_norm_fn=arch_ops.conditional_batch_norm,
            spectral_norm=True)
        disc = resnet_biggan.Discriminator(spectral_norm=True)

        def net(z, y):
            fake = gen(z, y, is_training=True)
            return fake, disc(fake, y, is_training=True)

        z = jax.random.normal(jax.random.PRNGKey(1), (2, 120))
        y = jax.nn.one_hot(jnp.arange(2), 10)
        (fake, (out, logits, h)), params, state = core.init(
            net, jax.random.PRNGKey(0), z, y)
        assert fake.shape == (2, 64, 64, 3)
        assert logits.shape == (2, 1)
        # Spectral norm state exists for conv kernels.
        assert any("u_var" in k for k in state)


@pytest.mark.slow
class TestBigGanDeep:
    def test_golden_param_counts_128(self):
        """BigGAN-deep 128: G = 50,244,484 / D = 34,590,210
        (resnet_biggan_deep_test.py:31-49)."""
        gen = resnet_biggan_deep.Generator(
            image_shape=(128, 128, 3),
            batch_norm_fn=arch_ops.conditional_batch_norm)
        disc = resnet_biggan_deep.Discriminator()

        def net(z, y):
            fake = gen(z, y, is_training=True)
            return disc(fake, y, is_training=True)

        z = jnp.zeros((2, 128))
        y = jax.nn.one_hot(jnp.ones((2,), jnp.int32), 1000)
        _, params, _ = core.init(net, jax.random.PRNGKey(0), z, y)
        g_params = core.filter_prefix(params, "generator")
        d_params = core.filter_prefix(params, "discriminator")
        assert core.count_params(g_params) == 50244484
        assert core.count_params(d_params) == 34590210
