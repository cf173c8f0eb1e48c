"""SN-GAN STL-10 ResNet, 48x48 with 6x6 seed (rebuild of
compare_gan/architectures/resnet_stl.py:28-108)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from compare_gan_tpu.architectures import resnet_ops
from compare_gan_tpu.ops import arch_ops as ops


class Generator(resnet_ops.ResNetGenerator):
    """ResNet STL generator, 3 up-blocks from a 6x6x512 seed."""

    def apply(self, z, y, is_training):
        ch = 64
        colors = self._image_shape[2]
        batch_size = z.shape[0]
        magic = [(8, 4), (4, 2), (2, 1)]
        output = ops.linear(z, 6 * 6 * 512, scope="fc_noise")
        output = output.reshape(batch_size, 6, 6, 512)
        for block_idx in range(3):
            block = self._resnet_block(
                name=f"B{block_idx + 1}",
                in_channels=ch * magic[block_idx][0],
                out_channels=ch * magic[block_idx][1],
                scale="up")
            output = block(output, z=z, y=y, is_training=is_training)
        output = self.batch_norm(output, z=z, y=y, is_training=is_training,
                                 name="final_norm")
        output = jax.nn.relu(output)
        output = ops.conv2d(output, output_dim=colors, k_h=3, k_w=3,
                            d_h=1, d_w=1, name="final_conv")
        return jax.nn.sigmoid(output)


class Discriminator(resnet_ops.ResNetDiscriminator):
    """ResNet STL discriminator, 5 blocks."""

    def apply(self, x, y, is_training):
        resnet_ops.validate_image_inputs(x.shape, validate_power2=False)
        colors = x.shape[-1]
        if colors not in [1, 3]:
            raise ValueError(f"Number of color channels unknown: {colors}")
        ch = 64
        block = self._resnet_block(name="B0", in_channels=colors,
                                   out_channels=ch, scale="down")
        output = block(x, z=None, y=y, is_training=is_training)
        magic = [(1, 2), (2, 4), (4, 8), (8, 16)]
        for block_idx in range(4):
            block = self._resnet_block(
                name=f"B{block_idx + 1}",
                in_channels=ch * magic[block_idx][0],
                out_channels=ch * magic[block_idx][1],
                scale="down" if block_idx < 3 else "none")
            output = block(output, z=None, y=y, is_training=is_training)
        output = jax.nn.relu(output)
        pre_logits = jnp.mean(output, axis=(1, 2))
        out_logit = ops.linear(pre_logits, 1, scope="disc_final_fc",
                               use_sn=self._spectral_norm)
        return jax.nn.sigmoid(out_logit), out_logit, pre_logits
