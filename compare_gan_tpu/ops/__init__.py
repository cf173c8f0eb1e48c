"""TPU-native op library (the rebuild of compare_gan/architectures/arch_ops.py
and compare_gan/tpu/*)."""

from compare_gan_tpu.ops.arch_ops import (  # noqa: F401
    batch_norm,
    conditional_batch_norm,
    conv1x1,
    conv2d,
    deconv2d,
    evonorm_s0,
    layer_norm,
    linear,
    lrelu,
    no_batch_norm,
    non_local_block,
    self_modulated_batch_norm,
    spectral_norm,
    spectral_norm_sigma,
    standardize_batch,
    weight_initializer,
    weight_norm_conv2d,
    weight_norm_deconv2d,
    weight_norm_linear,
)
from compare_gan_tpu.ops import rng as random  # noqa: F401
