"""WGAN-GP ResNet (Gulrajani et al. 2017), 5 G blocks / 6 D blocks, 128x128
(rebuild of compare_gan/architectures/resnet5.py:36-145). D uses mean
pooling and sigmoid output."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from compare_gan_tpu.architectures import resnet_ops
from compare_gan_tpu.ops import arch_ops as ops


class Generator(resnet_ops.ResNetGenerator):
    """ResNet5 generator (resnet5.py:36-95)."""

    def __init__(self, ch=64, channels=(8, 8, 4, 4, 2, 1), **kwargs):
        super().__init__(**kwargs)
        self._ch = ch
        self._channels = channels

    def apply(self, z, y, is_training):
        seed_size = 4
        image_size = self._image_shape[0]
        net = ops.linear(
            z, self._ch * self._channels[0] * seed_size * seed_size,
            scope="fc_noise")
        net = net.reshape(-1, seed_size, seed_size,
                          self._ch * self._channels[0])
        up_layers = math.log2(image_size / seed_size)
        if up_layers != int(up_layers):
            raise ValueError(
                f"log2({image_size}/{seed_size}) must be an integer.")
        if up_layers < 0 or up_layers > 5:
            raise ValueError(f"Invalid image_size {image_size}.")
        up_layers = int(up_layers)
        for block_idx in range(5):
            block = self._resnet_block(
                name=f"B{block_idx + 1}",
                in_channels=self._ch * self._channels[block_idx],
                out_channels=self._ch * self._channels[block_idx + 1],
                scale="up" if block_idx < up_layers else "none")
            net = block(net, z=z, y=y, is_training=is_training)
        net = self.batch_norm(net, z=z, y=y, is_training=is_training,
                              name="final_norm")
        net = jax.nn.relu(net)
        net = ops.conv2d(net, output_dim=self._image_shape[2], k_h=3, k_w=3,
                         d_h=1, d_w=1, name="final_conv")
        return jax.nn.sigmoid(net)


class Discriminator(resnet_ops.ResNetDiscriminator):
    """ResNet5 discriminator (resnet5.py:98-145)."""

    def __init__(self, ch=64, channels=(1, 2, 4, 4, 8, 8), **kwargs):
        super().__init__(**kwargs)
        self._ch = ch
        self._channels = channels

    def apply(self, x, y, is_training):
        resnet_ops.validate_image_inputs(x.shape)
        colors = x.shape[3]
        if colors not in [1, 3]:
            raise ValueError(f"Color channels not supported: {colors}")
        block = self._resnet_block(name="B0", in_channels=colors,
                                   out_channels=self._ch, scale="down")
        output = block(x, z=None, y=y, is_training=is_training)
        for block_idx in range(5):
            block = self._resnet_block(
                name=f"B{block_idx + 1}",
                in_channels=self._ch * self._channels[block_idx],
                out_channels=self._ch * self._channels[block_idx + 1],
                scale="down")
            output = block(output, z=None, y=y, is_training=is_training)
        output = jax.nn.relu(output)
        pre_logits = jnp.mean(output, axis=(1, 2))
        out_logit = ops.linear(pre_logits, 1, scope="disc_final_fc",
                               use_sn=self._spectral_norm)
        return jax.nn.sigmoid(out_logit), out_logit, pre_logits
