"""BigGAN re-implementation, resolutions 32-512 (rebuild of
compare_gan/architectures/resnet_biggan.py; Brock et al. 2018,
arXiv:1809.11096 as implemented by compare_gan — see the reference's
docstring :18-62 for the differences vs the paper).

Parameter counts must match the reference exactly (resnet_biggan.py:40-62,
asserted in resnet_biggan_test.py:139,154):
  128px: G = 70,433,988  D = 87,982,370
  256px: G = 82,097,604  D = 98,635,298
  512px: G = 82,468,068  D = 98,801,378
Golden-tested in tests/test_architectures.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from compare_gan_tpu import config as gin
from compare_gan_tpu import core
from compare_gan_tpu.architectures import abstract_arch
from compare_gan_tpu.architectures import resnet_ops
from compare_gan_tpu.ops import arch_ops as ops


@gin.configurable("BigGanResNetBlock")
class BigGanResNetBlock(resnet_ops.ResNetBlock):
    """BigGAN block: 1x1 shortcut conv, shortcut optional when channels
    match (resnet_biggan.py:81-151)."""

    def __init__(self, add_shortcut=True, **kwargs):
        super().__init__(**kwargs)
        self._add_shortcut = add_shortcut

    def apply(self, inputs, z, y, is_training):
        if inputs.shape[-1] != self._in_channels:
            raise ValueError(
                f"Unexpected number of input channels (expected "
                f"{self._in_channels}, got {inputs.shape[-1]}).")
        with core.scope(self._name):
            outputs = inputs
            outputs = self.batch_norm(
                outputs, z=z, y=y, is_training=is_training, name="bn1")
            if self._layer_norm:
                outputs = ops.layer_norm(outputs, is_training=is_training,
                                         scope="ln1")
            outputs = jax.nn.relu(outputs)
            outputs = self._get_conv(
                outputs, self._in_channels, self._out_channels, self._scale1,
                suffix="conv1")
            outputs = self.batch_norm(
                outputs, z=z, y=y, is_training=is_training, name="bn2")
            if self._layer_norm:
                outputs = ops.layer_norm(outputs, is_training=is_training,
                                         scope="ln2")
            outputs = jax.nn.relu(outputs)
            outputs = self._get_conv(
                outputs, self._out_channels, self._out_channels, self._scale2,
                suffix="conv2")
            if self._add_shortcut:
                shortcut = self._get_conv(
                    inputs, self._in_channels, self._out_channels,
                    self._scale, kernel_size=(1, 1), suffix="conv_shortcut")
                outputs = outputs + shortcut
            return outputs


@gin.configurable("resnet_biggan.Generator")
class Generator(abstract_arch.AbstractGenerator):
    """BigGAN generator (resnet_biggan.py:154-302): hierarchical z split
    across blocks concat'd with embedded y, per-resolution channel tables,
    attention at configured blocks, unconditional final BN, tanh -> [0,1]."""

    def __init__(self, ch=96, blocks_with_attention="B4", hierarchical_z=True,
                 embed_z=False, embed_y=True, embed_y_dim=128,
                 embed_bias=False, experimental_fast_conv_to_rgb=False,
                 **kwargs):
        super().__init__(**kwargs)
        # Pad the RGB conv to 128 output lanes and slice (the deep
        # variant's option, resnet_biggan_deep.py:297-302): 3 output
        # channels waste >97% of MXU lanes at full resolution.
        self._experimental_fast_conv_to_rgb = experimental_fast_conv_to_rgb
        self._ch = ch
        self._blocks_with_attention = set(blocks_with_attention.split(","))
        self._hierarchical_z = hierarchical_z
        self._embed_z = embed_z
        self._embed_y = embed_y
        self._embed_y_dim = embed_y_dim
        self._embed_bias = embed_bias

    def _resnet_block(self, name, in_channels, out_channels, scale):
        if scale not in ["up", "none"]:
            raise ValueError(f"Unknown G block scaling: {scale}.")
        return BigGanResNetBlock(
            name=name, in_channels=in_channels, out_channels=out_channels,
            scale=scale, is_gen_block=True,
            spectral_norm=self._spectral_norm, batch_norm=self.batch_norm)

    def _get_in_out_channels(self):
        resolution = self._image_shape[0]
        if resolution == 512:
            channel_multipliers = [16, 16, 8, 8, 4, 2, 1, 1]
        elif resolution == 256:
            channel_multipliers = [16, 16, 8, 8, 4, 2, 1]
        elif resolution == 128:
            channel_multipliers = [16, 16, 8, 4, 2, 1]
        elif resolution == 64:
            channel_multipliers = [16, 16, 8, 4, 2]
        elif resolution == 32:
            channel_multipliers = [4, 4, 4, 4]
        else:
            raise ValueError(f"Unsupported resolution: {resolution}")
        in_channels = [self._ch * c for c in channel_multipliers[:-1]]
        out_channels = [self._ch * c for c in channel_multipliers[1:]]
        return in_channels, out_channels

    def apply(self, z, y, is_training):
        seed_size = 4
        z_dim = z.shape[1]
        in_channels, out_channels = self._get_in_out_channels()
        num_blocks = len(in_channels)

        if self._embed_z:
            z = ops.linear(z, z_dim, scope="embed_z", use_sn=False,
                           use_bias=self._embed_bias)
        if self._embed_y:
            y = ops.linear(y, self._embed_y_dim, scope="embed_y",
                           use_sn=False, use_bias=self._embed_bias)
        y_per_block = num_blocks * [y]
        if self._hierarchical_z:
            z_per_block = jnp.split(z, num_blocks + 1, axis=1)
            z0, z_per_block = z_per_block[0], z_per_block[1:]
            if y is not None:
                y_per_block = [jnp.concatenate([zi, y], 1)
                               for zi in z_per_block]
        else:
            z0 = z
            z_per_block = num_blocks * [z]

        net = ops.linear(z0, in_channels[0] * seed_size * seed_size,
                         scope="fc_noise", use_sn=self._spectral_norm)
        net = net.reshape(-1, seed_size, seed_size, in_channels[0])
        for block_idx in range(num_blocks):
            name = f"B{block_idx + 1}"
            block = self._resnet_block(
                name=name, in_channels=in_channels[block_idx],
                out_channels=out_channels[block_idx], scale="up")
            net = block(net, z=z_per_block[block_idx],
                        y=y_per_block[block_idx], is_training=is_training)
            if name in self._blocks_with_attention:
                net = ops.non_local_block(net, "non_local_block",
                                          use_sn=self._spectral_norm)
        net = ops.batch_norm(net, is_training=is_training, name="final_norm")
        net = jax.nn.relu(net)
        if self._experimental_fast_conv_to_rgb:
            net = ops.conv2d(net, output_dim=128, k_h=3, k_w=3,
                             d_h=1, d_w=1, name="final_conv",
                             use_sn=self._spectral_norm)
            net = net[:, :, :, :self._image_shape[2]]
        else:
            net = ops.conv2d(net, output_dim=self._image_shape[2],
                             k_h=3, k_w=3, d_h=1, d_w=1, name="final_conv",
                             use_sn=self._spectral_norm)
        return (jnp.tanh(net) + 1.0) / 2.0


@gin.configurable("resnet_biggan.Discriminator")
class Discriminator(abstract_arch.AbstractDiscriminator):
    """BigGAN discriminator (resnet_biggan.py:305-425): sum pooling and
    projection head out += <embed(y), h>."""

    def __init__(self, ch=96, blocks_with_attention="B1", project_y=True,
                 **kwargs):
        super().__init__(**kwargs)
        self._ch = ch
        self._blocks_with_attention = set(blocks_with_attention.split(","))
        self._project_y = project_y

    def _resnet_block(self, name, in_channels, out_channels, scale):
        if scale not in ["down", "none"]:
            raise ValueError(f"Unknown D block scaling: {scale}.")
        return BigGanResNetBlock(
            name=name, in_channels=in_channels, out_channels=out_channels,
            scale=scale, is_gen_block=False,
            add_shortcut=in_channels != out_channels,
            layer_norm=self._layer_norm,
            spectral_norm=self._spectral_norm, batch_norm=self.batch_norm)

    def _get_in_out_channels(self, colors, resolution):
        if colors not in [1, 3]:
            raise ValueError(f"Unsupported color channels: {colors}")
        if resolution == 512:
            channel_multipliers = [1, 1, 2, 4, 8, 8, 16, 16]
        elif resolution == 256:
            channel_multipliers = [1, 2, 4, 8, 8, 16, 16]
        elif resolution == 128:
            channel_multipliers = [1, 2, 4, 8, 16, 16]
        elif resolution == 64:
            channel_multipliers = [2, 4, 8, 16, 16]
        elif resolution == 32:
            channel_multipliers = [2, 2, 2, 2]
        else:
            raise ValueError(f"Unsupported resolution: {resolution}")
        out_channels = [self._ch * c for c in channel_multipliers]
        in_channels = [colors] + out_channels[:-1]
        return in_channels, out_channels

    def apply(self, x, y, is_training):
        resnet_ops.validate_image_inputs(x.shape)
        in_channels, out_channels = self._get_in_out_channels(
            colors=x.shape[-1], resolution=x.shape[1])
        num_blocks = len(in_channels)
        net = x
        for block_idx in range(num_blocks):
            name = f"B{block_idx + 1}"
            is_last_block = block_idx == num_blocks - 1
            block = self._resnet_block(
                name=name, in_channels=in_channels[block_idx],
                out_channels=out_channels[block_idx],
                scale="none" if is_last_block else "down")
            net = block(net, z=None, y=y, is_training=is_training)
            if name in self._blocks_with_attention:
                net = ops.non_local_block(net, "non_local_block",
                                          use_sn=self._spectral_norm)
        net = jax.nn.relu(net)
        h = jnp.sum(net, axis=(1, 2))
        out_logit = ops.linear(h, 1, scope="final_fc",
                               use_sn=self._spectral_norm)
        if self._project_y:
            if y is None:
                raise ValueError("You must provide class information y.")
            with core.scope("embedding_fc"):
                y_embedding_dim = out_channels[-1]
                # Glorot-normal init (overrides the gin `weights` scheme,
                # matching resnet_biggan.py:416-423).
                kernel = core.param(
                    "kernel", (y.shape[1], y_embedding_dim),
                    jax.nn.initializers.glorot_normal())
                if self._spectral_norm:
                    kernel = ops.spectral_norm(kernel)
                embedded_y = jnp.dot(y, kernel.astype(y.dtype))
                out_logit += jnp.sum(embedded_y * h, axis=1, keepdims=True)
        return jax.nn.sigmoid(out_logit), out_logit, h
