"""30-block ResNet: 6 super-blocks x 5 residual blocks, 128x128 (rebuild of
compare_gan/architectures/resnet30.py:16-145; Gulrajani et al. 2017)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from compare_gan_tpu.architectures import resnet_ops
from compare_gan_tpu.ops import arch_ops as ops


class Generator(resnet_ops.ResNetGenerator):
    """ResNet30 generator (resnet30.py:36-90)."""

    def apply(self, z, y, is_training):
        if z.ndim != 2:
            raise ValueError(f"Expected [batch_size, z_dim], got {z.shape}.")
        ch = 64
        colors = self._image_shape[2]
        output = ops.linear(z, 4 * 4 * 8 * ch, scope="fc_noise")
        output = output.reshape(-1, 4, 4, 8 * ch)
        in_channels = 8 * ch
        out_channels = 4 * ch
        for superblock in range(6):
            for i in range(5):
                block = self._resnet_block(
                    name=f"B_{superblock}_{i}", in_channels=in_channels,
                    out_channels=in_channels, scale="none")
                output = block(output, z=z, y=y, is_training=is_training)
            if superblock < 5:
                block = self._resnet_block(
                    name=f"B_{superblock}_up", in_channels=in_channels,
                    out_channels=out_channels, scale="up")
                output = block(output, z=z, y=y, is_training=is_training)
            in_channels //= 2
            out_channels //= 2
        output = ops.conv2d(output, output_dim=colors, k_h=3, k_w=3,
                            d_h=1, d_w=1, name="final_conv")
        return jax.nn.sigmoid(output)


class Discriminator(resnet_ops.ResNetDiscriminator):
    """ResNet30 discriminator (resnet30.py:93-145)."""

    def apply(self, x, y, is_training):
        resnet_ops.validate_image_inputs(x.shape)
        colors = x.shape[-1]
        assert colors in [1, 3]
        ch = 64
        output = ops.conv2d(x, output_dim=ch // 4, k_h=3, k_w=3, d_h=1,
                            d_w=1, name="color_conv")
        in_channels = ch // 4
        out_channels = ch // 2
        for superblock in range(6):
            for i in range(5):
                block = self._resnet_block(
                    name=f"B_{superblock}_{i}", in_channels=in_channels,
                    out_channels=in_channels, scale="none")
                output = block(output, z=None, y=y, is_training=is_training)
            if superblock < 5:
                block = self._resnet_block(
                    name=f"B_{superblock}_up", in_channels=in_channels,
                    out_channels=out_channels, scale="down")
                output = block(output, z=None, y=y, is_training=is_training)
            in_channels *= 2
            out_channels *= 2
        output = output.reshape(-1, 4 * 4 * 8 * ch)
        out_logit = ops.linear(output, 1, scope="disc_final_fc",
                               use_sn=self._spectral_norm)
        return jax.nn.sigmoid(out_logit), out_logit, output
