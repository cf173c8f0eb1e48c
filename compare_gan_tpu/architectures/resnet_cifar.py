"""SN-GAN CIFAR ResNet, 32x32 (rebuild of
compare_gan/architectures/resnet_cifar.py:34-167). G: 3 up-blocks ch=256
with optional hierarchical z / z,y embeddings; D: 4 blocks ch=128 with
optional projection head."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from compare_gan_tpu import config as gin
from compare_gan_tpu.architectures import resnet_ops
from compare_gan_tpu.ops import arch_ops as ops


@gin.configurable("resnet_cifar.Generator")
class Generator(resnet_ops.ResNetGenerator):
    """ResNet CIFAR generator (resnet_cifar.py:34-112)."""

    def __init__(self, hierarchical_z=False, embed_z=False, embed_y=False,
                 **kwargs):
        super().__init__(**kwargs)
        self._hierarchical_z = hierarchical_z
        self._embed_z = embed_z
        self._embed_y = embed_y

    def apply(self, z, y, is_training):
        assert self._image_shape[0] == 32
        assert self._image_shape[1] == 32
        num_blocks = 3
        z_dim = z.shape[1]

        if self._embed_z:
            z = ops.linear(z, z_dim, scope="embed_z",
                           use_sn=self._spectral_norm)
        if self._embed_y:
            y = ops.linear(y, z_dim, scope="embed_y",
                           use_sn=self._spectral_norm)
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

        output = ops.linear(z0, 4 * 4 * 256, scope="fc_noise",
                            use_sn=self._spectral_norm)
        output = output.reshape(-1, 4, 4, 256)
        for block_idx in range(3):
            block = self._resnet_block(
                name=f"B{block_idx + 1}", in_channels=256, out_channels=256,
                scale="up")
            output = block(output, z=z_per_block[block_idx],
                           y=y_per_block[block_idx], is_training=is_training)
        output = self.batch_norm(output, z=z, y=y, is_training=is_training,
                                 name="final_norm")
        output = jax.nn.relu(output)
        output = ops.conv2d(output, output_dim=self._image_shape[2],
                            k_h=3, k_w=3, d_h=1, d_w=1, name="final_conv",
                            use_sn=self._spectral_norm)
        return jax.nn.sigmoid(output)


@gin.configurable("resnet_cifar.Discriminator")
class Discriminator(resnet_ops.ResNetDiscriminator):
    """ResNet CIFAR discriminator (resnet_cifar.py:115-167)."""

    def __init__(self, project_y=False, **kwargs):
        super().__init__(**kwargs)
        self._project_y = project_y

    def apply(self, x, y, is_training):
        resnet_ops.validate_image_inputs(x.shape)
        colors = x.shape[3]
        if colors not in [1, 3]:
            raise ValueError(f"Color channels not supported: {colors}")
        output = x
        for block_idx in range(4):
            block = self._resnet_block(
                name=f"B{block_idx + 1}",
                in_channels=colors if block_idx == 0 else 128,
                out_channels=128,
                scale="down" if block_idx <= 1 else "none")
            output = block(output, z=None, y=y, is_training=is_training)
        output = jax.nn.relu(output)
        h = jnp.mean(output, axis=(1, 2))
        out_logit = ops.linear(h, 1, scope="disc_final_fc",
                               use_sn=self._spectral_norm)
        if self._project_y:
            if y is None:
                raise ValueError("You must provide class information y.")
            embedded_y = ops.linear(y, 128, use_bias=False,
                                    scope="embedding_fc",
                                    use_sn=self._spectral_norm)
            out_logit += jnp.sum(embedded_y * h, axis=1, keepdims=True)
        return jax.nn.sigmoid(out_logit), out_logit, h
