"""ResNet building blocks.

Rebuild of compare_gan/architectures/resnet_ops.py. `unpool` keeps the
reference's zero-interleaved 2x upsampling (resnet_ops.py:35-56, the
Dosovitskiy unpool): each input pixel maps to the top-left of a 2x2 cell
and the other three entries are zero; the following 3x3 conv absorbs the
zero lattice. Exact placement is verified in tests/test_resnet_ops.py.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from compare_gan_tpu import config as gin
from compare_gan_tpu import core
from compare_gan_tpu.architectures import abstract_arch
from compare_gan_tpu.ops import arch_ops as ops


@gin.configurable("resnet_ops")
def fusion_options(fused_scale_convs=True):
    """TPU-native: fuse unpool+conv (lhs-dilated conv) and conv+avgpool
    (blurred stride-2 kernel). Exact to the unfused reference math
    (tests/test_fused_scale_convs.py); disable via
    `resnet_ops.fused_scale_convs = False`."""
    return fused_scale_convs


def unpool(value):
    """Zero-interleaved 2x upsampling: value[b,i,j,c] -> out[b,2i,2j,c],
    zeros at the other three cell positions. Same concat/reshape sequence as
    the reference — pure data movement that XLA fuses into the next conv."""
    b, h, w, c = value.shape
    out = value.reshape(b * h, w, c)
    out = jnp.concatenate([out, jnp.zeros_like(out)], axis=2)
    out = jnp.concatenate([out, jnp.zeros_like(out)], axis=1)
    return out.reshape(b, h * 2, w * 2, c)


def validate_image_inputs(shape, validate_power2=True):
    """Shape checks (resnet_ops.py:59-67)."""
    if len(shape) != 4:
        raise ValueError(f"Expected rank-4 image tensor, got {shape}.")
    if shape[1] != shape[2]:
        raise ValueError(f"Input tensor h != w: {shape}.")
    width = shape[1]
    if validate_power2 and math.log2(width) != int(math.log2(width)):
        raise ValueError(f"Width not a power of 2: {width}.")


def avg_pool_2x2(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


class ResNetBlock:
    """Shared G/D ResNet block (resnet_ops.py:70-182): SN-paper layout —
    G upsamples in conv1, D downsamples after conv2; 3x3 shortcut conv."""

    def __init__(self, name, in_channels, out_channels, scale, is_gen_block,
                 layer_norm=False, spectral_norm=False, batch_norm=None):
        assert scale in ["up", "down", "none"]
        self._name = name
        self._in_channels = in_channels
        self._out_channels = out_channels
        self._scale = scale
        self._scale1 = scale if is_gen_block else "none"
        self._scale2 = "none" if is_gen_block else scale
        self._layer_norm = layer_norm
        self._spectral_norm = spectral_norm
        self.batch_norm = batch_norm

    def __call__(self, inputs, z, y, is_training):
        return self.apply(inputs=inputs, z=z, y=y, is_training=is_training)

    def _get_conv(self, inputs, in_channels, out_channels, scale, suffix,
                  kernel_size=(3, 3), strides=(1, 1)):
        if inputs.shape[-1] != in_channels:
            raise ValueError("Unexpected number of input channels.")
        name = "{}_{}".format("same" if scale == "none" else scale, suffix)
        fused = fusion_options() and strides == (1, 1)
        if scale == "up" and fused:
            return ops.up_conv2d(
                inputs, output_dim=out_channels,
                k_h=kernel_size[0], k_w=kernel_size[1],
                use_sn=self._spectral_norm, name=name)
        if scale == "down" and fused:
            return ops.down_conv2d(
                inputs, output_dim=out_channels,
                k_h=kernel_size[0], k_w=kernel_size[1],
                use_sn=self._spectral_norm, name=name)
        out = inputs
        if scale == "up":
            out = unpool(out)
        out = ops.conv2d(
            out, output_dim=out_channels,
            k_h=kernel_size[0], k_w=kernel_size[1],
            d_h=strides[0], d_w=strides[1],
            use_sn=self._spectral_norm,
            name=name)
        if scale == "down":
            out = avg_pool_2x2(out)
        return out

    def apply(self, inputs, z, y, is_training):
        if inputs.shape[-1] != self._in_channels:
            raise ValueError("Unexpected number of input channels.")
        with core.scope(self._name):
            output = inputs
            shortcut = self._get_conv(
                output, self._in_channels, self._out_channels, self._scale,
                suffix="conv_shortcut")
            output = self.batch_norm(
                output, z=z, y=y, is_training=is_training, name="bn1")
            if self._layer_norm:
                output = ops.layer_norm(output, is_training=is_training,
                                        scope="ln1")
            output = jnp.maximum(output, 0.0)
            output = self._get_conv(
                output, self._in_channels, self._out_channels, self._scale1,
                suffix="conv1")
            output = self.batch_norm(
                output, z=z, y=y, is_training=is_training, name="bn2")
            if self._layer_norm:
                output = ops.layer_norm(output, is_training=is_training,
                                        scope="ln2")
            output = jnp.maximum(output, 0.0)
            output = self._get_conv(
                output, self._out_channels, self._out_channels, self._scale2,
                suffix="conv2")
            return output + shortcut


class ResNetGenerator(abstract_arch.AbstractGenerator):
    """Base for ResNet generators (resnet_ops.py:185-203)."""

    def _resnet_block(self, name, in_channels, out_channels, scale):
        if scale not in ["up", "none"]:
            raise ValueError(f"Unknown G block scaling: {scale}.")
        return ResNetBlock(
            name=name, in_channels=in_channels, out_channels=out_channels,
            scale=scale, is_gen_block=True,
            spectral_norm=self._spectral_norm, batch_norm=self.batch_norm)


class ResNetDiscriminator(abstract_arch.AbstractDiscriminator):
    """Base for ResNet discriminators (resnet_ops.py:206-219)."""

    def _resnet_block(self, name, in_channels, out_channels, scale):
        if scale not in ["down", "none"]:
            raise ValueError(f"Unknown D block scaling: {scale}.")
        return ResNetBlock(
            name=name, in_channels=in_channels, out_channels=out_channels,
            scale=scale, is_gen_block=False, layer_norm=self._layer_norm,
            spectral_norm=self._spectral_norm, batch_norm=self.batch_norm)
