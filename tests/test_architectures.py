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


# The reference's FULL multi-resolution / grayscale matrix
# (architectures_test.py:59-155): dcgan/infogan/sndcgan at 5 shapes
# incl. 28px and C=1, resnet5 at 4, resnet_cifar/resnet_stl grayscale.
# Shapes already covered by test_build_and_range above are not repeated.
@pytest.mark.parametrize("arch,shape", [
    (c.DCGAN_ARCH, (28, 28, 1)),
    (c.DCGAN_ARCH, (32, 32, 1)),
    (c.DCGAN_ARCH, (32, 32, 3)),
    pytest.param(c.DCGAN_ARCH, (128, 128, 3), marks=pytest.mark.slow),
    (c.INFOGAN_ARCH, (28, 28, 1)),
    (c.INFOGAN_ARCH, (32, 32, 1)),
    pytest.param(c.INFOGAN_ARCH, (64, 64, 3), marks=pytest.mark.slow),
    pytest.param(c.INFOGAN_ARCH, (128, 128, 3), marks=pytest.mark.slow),
    (c.SNDCGAN_ARCH, (28, 28, 1)),
    (c.SNDCGAN_ARCH, (32, 32, 1)),
    pytest.param(c.SNDCGAN_ARCH, (64, 64, 3), marks=pytest.mark.slow),
    pytest.param(c.SNDCGAN_ARCH, (128, 128, 3), marks=pytest.mark.slow),
    (c.RESNET5_ARCH, (32, 32, 1)),
    (c.RESNET5_ARCH, (32, 32, 3)),
    pytest.param(c.RESNET5_ARCH, (64, 64, 3), marks=pytest.mark.slow),
    (c.RESNET_CIFAR_ARCH, (32, 32, 1)),
    pytest.param(c.RESNET_STL_ARCH, (48, 48, 1),
                 marks=pytest.mark.slow),
])
def test_build_and_range_reference_matrix(arch, shape):
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

    # Required gin settings per resolution (reference
    # resnet_biggan.py:48-62): z_dim and attention block placement.
    _HIGH_RES = {
        256: dict(z_dim=140, g_att="B5", d_att="B2",
                  golden_g=82097604, golden_d=98635298),
        512: dict(z_dim=160, g_att="B4", d_att="B3",
                  golden_g=82468068, golden_d=98801378),
    }

    @pytest.mark.parametrize("resolution", [256, 512])
    def test_golden_param_counts_high_res(self, resolution):
        """Full-channel 256/512 parameter counts match the reference's
        published numbers exactly (resnet_biggan.py:48-62: G 82,097,604 /
        D 98,635,298 @256; G 82,468,068 / D 98,801,378 @512). Counted
        via jax.eval_shape so no memory is allocated."""
        cfg = self._HIGH_RES[resolution]
        gen = resnet_biggan.Generator(
            image_shape=(resolution, resolution, 3),
            batch_norm_fn=arch_ops.conditional_batch_norm,
            blocks_with_attention=cfg["g_att"])
        disc = resnet_biggan.Discriminator(
            blocks_with_attention=cfg["d_att"])

        def net(z, y):
            fake = gen(z, y, is_training=True)
            return disc(fake, y, is_training=True)

        z = jnp.zeros((2, cfg["z_dim"]))
        y = jax.nn.one_hot(jnp.ones((2,), jnp.int32), 1000)
        params = jax.eval_shape(
            lambda zz, yy: core.init(net, jax.random.PRNGKey(0), zz, yy)[1],
            z, y)
        g_params = core.filter_prefix(params, "generator")
        d_params = core.filter_prefix(params, "discriminator")
        count = lambda p: sum(  # noqa: E731
            int(np.prod(s.shape)) for s in p.values())
        assert count(g_params) == cfg["golden_g"]
        assert count(d_params) == cfg["golden_d"]

    @pytest.mark.slow
    @pytest.mark.parametrize("resolution", [256, 512])
    def test_builds_and_range_high_res_reduced_ch(self, resolution):
        """EXECUTE the 256/512 paths with reduced channels (the
        reference's OOM-avoidance trick, architectures_test.py:103-122:
        ch=16) — forward through G and D with attention at the
        published block placements, range/shape checked."""
        cfg = self._HIGH_RES[resolution]
        gen = resnet_biggan.Generator(
            image_shape=(resolution, resolution, 3), ch=16,
            batch_norm_fn=arch_ops.conditional_batch_norm,
            blocks_with_attention=cfg["g_att"])
        disc = resnet_biggan.Discriminator(
            ch=16, blocks_with_attention=cfg["d_att"])

        def net(z, y):
            fake = gen(z, y, is_training=True)
            out, logits, h = disc(fake, y, is_training=True)
            return fake, out, logits

        z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg["z_dim"]))
        y = jax.nn.one_hot(jnp.arange(2), 10)
        (fake, out, logits), params, state = core.init(
            net, jax.random.PRNGKey(0), z, y)
        assert fake.shape == (2, resolution, resolution, 3)
        assert np.asarray(fake).min() >= 0.0
        assert np.asarray(fake).max() <= 1.0
        assert logits.shape == (2, 1)
        assert np.asarray(out).min() >= 0.0 and np.asarray(out).max() <= 1.0

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

    # The reference publishes no deep-variant counts above 128 and its
    # test matrix stops there; these are REPO-pinned goldens (computed
    # once via eval_shape from the same topology rules the 128 golden
    # validates) so the 256/512 tables can't silently regress.
    _HIGH_RES = {
        256: dict(z_dim=140, golden_g=56710532, golden_d=38247426),
        512: dict(z_dim=160, golden_g=58645316, golden_d=38301122),
    }

    @pytest.mark.parametrize("resolution", [256, 512])
    def test_param_counts_high_res(self, resolution):
        cfg = self._HIGH_RES[resolution]
        gen = resnet_biggan_deep.Generator(
            image_shape=(resolution, resolution, 3),
            batch_norm_fn=arch_ops.conditional_batch_norm)
        disc = resnet_biggan_deep.Discriminator()

        def net(z, y):
            fake = gen(z, y, is_training=True)
            return disc(fake, y, is_training=True)

        z = jnp.zeros((2, cfg["z_dim"]))
        y = jax.nn.one_hot(jnp.ones((2,), jnp.int32), 1000)
        params = jax.eval_shape(
            lambda zz, yy: core.init(net, jax.random.PRNGKey(0), zz, yy)[1],
            z, y)
        g_params = core.filter_prefix(params, "generator")
        d_params = core.filter_prefix(params, "discriminator")
        count = lambda p: sum(  # noqa: E731
            int(np.prod(s.shape)) for s in p.values())
        assert count(g_params) == cfg["golden_g"]
        assert count(d_params) == cfg["golden_d"]

    @pytest.mark.parametrize("resolution", [256, 512])
    def test_builds_and_range_high_res_reduced_ch(self, resolution):
        """EXECUTE the deep 256/512 paths with reduced channels
        (ch=16), forward through G and D, range/shape checked."""
        cfg = self._HIGH_RES[resolution]
        gen = resnet_biggan_deep.Generator(
            image_shape=(resolution, resolution, 3), ch=16,
            batch_norm_fn=arch_ops.conditional_batch_norm)
        disc = resnet_biggan_deep.Discriminator(ch=16)

        def net(z, y):
            fake = gen(z, y, is_training=True)
            out, logits, h = disc(fake, y, is_training=True)
            return fake, out, logits

        z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg["z_dim"]))
        y = jax.nn.one_hot(jnp.arange(2), 10)
        (fake, out, logits), params, state = core.init(
            net, jax.random.PRNGKey(0), z, y)
        assert fake.shape == (2, resolution, resolution, 3)
        assert np.asarray(fake).min() >= 0.0
        assert np.asarray(fake).max() <= 1.0
        assert logits.shape == (2, 1)
