"""Neural-net op library, TPU-native.

Rebuild of compare_gan/architectures/arch_ops.py (758 LoC, TF1) on pure
JAX/XLA. Key design shifts vs the reference:

* NHWC everywhere, f32 parameters, BN statistics always computed in f32
  (inputs may be bf16; the MXU path casts around the normalizations like
  arch_ops.py:291-318 does).
* Cross-replica batch norm (arch_ops.py:66-119 + tpu/tpu_ops.py:95-125) is
  *free*: forward math is written in global-batch terms and runs under
  jit/pjit over a `data` mesh, so XLA lowers the batch-moment reductions to
  ICI all-reduces. Group-limited BN (tpu_ops.py:75-91 group_assignment) is
  expressed as `num_batch_groups` — per-batch-subgroup moments, which under
  contiguous batch sharding is numerically identical to replica subgroups.
* Stateful ops (spectral-norm `u_var` arch_ops.py:453-535, BN moving
  averages :66-119, BN accumulators :122-191) carry their state through the
  core context; `core.apply` returns the updated state and the *caller*
  decides which forward commits (SURVEY.md §7 "spectral-norm statefulness").
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from compare_gan_tpu import config as gin
from compare_gan_tpu import core
from compare_gan_tpu.gans import consts


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------


def _normal_init(stddev):
    def init(key, shape, dtype):
        return stddev * jax.random.normal(key, shape, dtype)
    return init


def _truncated_normal_init(stddev):
    def init(key, shape, dtype):
        # TF truncated_normal: resample beyond 2 sigma; jax provides the
        # equivalent truncated distribution directly.
        return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape,
                                                    dtype)
    return init


def _orthogonal_init(scale=1.0):
    base = jax.nn.initializers.orthogonal(scale=scale, column_axis=-1)

    def init(key, shape, dtype):
        if len(shape) < 2:
            return jax.random.normal(key, shape, dtype)
        return base(key, shape, dtype)
    return init


def zeros_init():
    return lambda key, shape, dtype: jnp.zeros(shape, dtype)


def ones_init():
    return lambda key, shape, dtype: jnp.ones(shape, dtype)


def constant_init(value):
    return lambda key, shape, dtype: jnp.full(shape, value, dtype)


@gin.configurable("weights")
def weight_initializer(initializer=consts.NORMAL_INIT, stddev=0.02):
    """Gin-selected weight init (reference arch_ops.py:46-63, gin name
    `weights.initializer`)."""
    if initializer == consts.NORMAL_INIT:
        return _normal_init(stddev)
    if initializer == consts.TRUNCATED_INIT:
        return _truncated_normal_init(stddev)
    if initializer == consts.ORTHOGONAL_INIT:
        return _orthogonal_init()
    raise ValueError(f"Unknown weight initializer {initializer}.")


# ---------------------------------------------------------------------------
# Spectral normalization
# ---------------------------------------------------------------------------


def _l2_normalize(x, epsilon):
    return x * jax.lax.rsqrt(jnp.maximum(jnp.sum(jnp.square(x)), epsilon))


@gin.configurable("spectral_norm")
def spectral_norm_sigma(w, epsilon=1e-12, singular_value="left",
                        state_name="kernel/u_var", compute_dtype=None):
    """Largest singular value of w via one persisted power iteration.

    Matches arch_ops.py:453-535: kernel flattened to (−1, C_out), one
    power-iteration round per forward (sufficient per Miyato et al.
    2018), `u` persisted across steps, u/v gradients stopped but sigma
    differentiable in w. The u update is recorded via core state; whether
    it commits is decided by the caller of core.apply.

    compute_dtype: dtype for the power-iteration matvecs. Layers pass
    their activation dtype — on TPU under bf16 training the matvecs then
    read the SAME bf16 kernel cast the conv/dense op consumes (XLA CSEs
    the `w.astype` node), so SN adds bf16-sized HBM reads instead of
    f32-sized ones. u-state, normalizations, and sigma accumulation stay
    f32; sigma is a Rayleigh quotient, so bf16 rounding of the iterate
    perturbs it only at second order (empirically ≲1e-3 relative — see
    tests/test_arch_ops.py::test_bf16_power_iteration_sigma_accuracy).
    """
    if w.ndim < 2:
        raise ValueError("Spectral norm needs a multi-dimensional tensor.")
    if compute_dtype is not None and compute_dtype != w.dtype:
        # Cast-then-reshape, matching the layer's `w.astype(x.dtype)`
        # subexpression exactly so XLA shares the cast.
        w_c = jnp.reshape(w.astype(compute_dtype), (-1, w.shape[-1]))
        mm = jnp.matmul
    else:
        w_c = jnp.reshape(w, (-1, w.shape[-1]))
        # f32 path: pin to full precision so the sigma estimate is immune
        # to TPU's default bf16-accumulated matmul.
        mm = functools.partial(jnp.matmul,
                               precision=jax.lax.Precision.HIGHEST)
    if singular_value == "auto":
        singular_value = "left" if w_c.shape[0] <= w_c.shape[1] else "right"
    if singular_value == "left":
        u_shape = (w_c.shape[0], 1)
    else:
        u_shape = (1, w_c.shape[1])
    u = core.get_state(state_name, u_shape, init=_normal_init(1.0),
                       dtype=w.dtype)
    # Two HBM reads of w per forward instead of the naive three: the
    # second power-iteration product t = W v is reused for both the u
    # update AND sigma = u'^T (W v) = u'.t — mathematically identical to
    # the reference's sigma = u'^T W v (arch_ops.py:516-521) without
    # re-reading the kernel a third time (~85 MB per BigGAN 3x3x1536x1536
    # kernel). Gradient is unchanged: u', v are stop-gradiented, so
    # d sigma / dW = u' v^T exactly as before.
    w_ng = jax.lax.stop_gradient(w_c)
    if singular_value == "left":
        v = _l2_normalize(mm(w_ng.T, u.astype(w_ng.dtype)
                             ).astype(jnp.float32), epsilon)
        v = jax.lax.stop_gradient(v)
        t = mm(w_c, v.astype(w_c.dtype)).astype(jnp.float32)   # [M, 1]
    else:
        v = _l2_normalize(mm(u.astype(w_ng.dtype), w_ng.T
                             ).astype(jnp.float32), epsilon)
        v = jax.lax.stop_gradient(v)
        t = mm(v.astype(w_c.dtype), w_c).astype(jnp.float32)   # [1, C_out]
    u = jax.lax.stop_gradient(_l2_normalize(t, epsilon))
    core.set_state(state_name, u)
    sigma = jnp.sum(t * u)
    return sigma


def spectral_norm(w, **kwargs):
    """w / sigma (the reference's normalized-kernel form). The layer ops
    below instead use `spectral_norm_sigma` and scale their OUTPUT by
    1/sigma — identical math and gradients by linearity, but the kernel
    is never re-materialized (a full read+write of e.g. the 85 MB BigGAN
    [3,3,1536,1536] kernels on every forward; measured ~6 ms/step)."""
    sigma = spectral_norm_sigma(w, **kwargs)
    return w / sigma


# ---------------------------------------------------------------------------
# Linear / conv / deconv
# ---------------------------------------------------------------------------


def linear(x, output_size, scope="linear", stddev=0.02, bias_start=0.0,
           use_sn=False, use_bias=True):
    """Dense layer (arch_ops.py:538-556). x: [B, D]."""
    with core.scope(scope):
        kernel = core.param("kernel", (x.shape[-1], output_size),
                            weight_initializer(stddev=stddev))
        sigma = (spectral_norm_sigma(kernel, compute_dtype=x.dtype)
                 if use_sn else None)
        # No preferred_element_type: its conv/dot transpose rule rejects
        # mixed bf16/f32 cotangents, and the TPU MXU accumulates bf16
        # matmuls in f32 internally regardless.
        out = jnp.dot(x, kernel.astype(x.dtype))
        if sigma is not None:
            # SN as output scale: out/sigma == x @ (kernel/sigma).
            out = out / sigma.astype(out.dtype)
        if use_bias:
            bias = core.param("bias", (output_size,),
                              constant_init(bias_start))
            out = out + bias.astype(out.dtype)
        return out


def conv2d(x, output_dim, k_h, k_w, d_h, d_w, stddev=0.02, name="conv2d",
           use_sn=False, use_bias=True):
    """SAME conv (arch_ops.py:559-574). x: NHWC, kernel HWIO."""
    with core.scope(name):
        w = core.param("kernel", (k_h, k_w, x.shape[-1], output_dim),
                       weight_initializer(stddev=stddev))
        sigma = (spectral_norm_sigma(w, compute_dtype=x.dtype)
                 if use_sn else None)
        out = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(d_h, d_w), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if sigma is not None:
            out = out / sigma.astype(out.dtype)
        if use_bias:
            bias = core.param("bias", (output_dim,), constant_init(0.0))
            out = out + bias.astype(out.dtype)
        return out


conv1x1 = functools.partial(conv2d, k_h=1, k_w=1, d_h=1, d_w=1)


def up_conv2d(x, output_dim, k_h, k_w, stddev=0.02, name="conv2d",
              use_sn=False, use_bias=True):
    """Fused zero-unpool + SAME conv (exactly conv2d(unpool(x)),
    resnet_ops.py:35-56 + conv). The zero-stuffed upsample is expressed as
    lhs_dilation so XLA never materializes the 4x zero-lattice tensor and
    skips the structurally-zero taps — ~4x fewer MACs on every G up-conv.
    Parameter names/shapes identical to the unfused path."""
    with core.scope(name):
        w = core.param("kernel", (k_h, k_w, x.shape[-1], output_dim),
                       weight_initializer(stddev=stddev))
        sigma = (spectral_norm_sigma(w, compute_dtype=x.dtype)
                 if use_sn else None)
        pl_h, pl_w = (k_h - 1) // 2, (k_w - 1) // 2
        # High padding +1 covers the unpool's trailing zero row/col.
        out = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(1, 1),
            padding=((pl_h, k_h - 1 - pl_h + 1), (pl_w, k_w - 1 - pl_w + 1)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if sigma is not None:
            out = out / sigma.astype(out.dtype)
        if use_bias:
            bias = core.param("bias", (output_dim,), constant_init(0.0))
            out = out + bias.astype(out.dtype)
        return out


def down_conv2d(x, output_dim, k_h, k_w, stddev=0.02, name="conv2d",
                use_sn=False, use_bias=True):
    """Fused SAME conv + 2x2 avg-pool (exactly avg_pool(conv2d(x))): the
    pool is folded into the kernel (w ⊛ mean2x2, stride 2), cutting MACs
    ~2.25x and skipping the full-resolution intermediate. Spectral norm
    applies to the original 3x3 kernel so training dynamics match the
    unfused path; parameter names/shapes identical."""
    with core.scope(name):
        w = core.param("kernel", (k_h, k_w, x.shape[-1], output_dim),
                       weight_initializer(stddev=stddev))
        sigma = (spectral_norm_sigma(w, compute_dtype=x.dtype)
                 if use_sn else None)
        # w_eff[a,b] = 1/4 * sum_{p,q in {0,1}} w[a-p, b-q]  (k+1 taps).
        pads = [((0, 1), (0, 1)), ((1, 0), (0, 1)),
                ((0, 1), (1, 0)), ((1, 0), (1, 0))]
        w_eff = sum(jnp.pad(w, p + ((0, 0), (0, 0))) for p in pads) * 0.25
        pl_h, pl_w = (k_h - 1) // 2, (k_w - 1) // 2
        out = jax.lax.conv_general_dilated(
            x, w_eff.astype(x.dtype), window_strides=(2, 2),
            padding=((pl_h, k_h - 1 - pl_h), (pl_w, k_w - 1 - pl_w)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if sigma is not None:
            out = out / sigma.astype(out.dtype)
        if use_bias:
            bias = core.param("bias", (output_dim,), constant_init(0.0))
            out = out + bias.astype(out.dtype)
        return out


def _deconv_same_pads(in_size, out_size, k, s):
    """Explicit (lo, hi) padding of the stride-dilated input that makes
    conv_transpose reproduce tf.nn.conv2d_transpose(output_shape=...,
    padding='SAME') — i.e. the GRADIENT of a SAME forward conv mapping
    out_size -> in_size. Needed because lax.conv_transpose's string
    'SAME' always yields in*stride, but TF's output_shape also permits
    the other ceil-div preimages (e.g. 4 -> 7 at stride 2, the 28 px
    DCGAN schedule, reference dcgan.py:55-76)."""
    if -(-out_size // s) != in_size:
        raise ValueError(
            f"deconv2d: requested output size {out_size} is not a stride-"
            f"{s} SAME preimage of input size {in_size}.")
    fwd_total = max((in_size - 1) * s + k - out_size, 0)
    fwd_lo = fwd_total // 2  # TF SAME: extra pad goes to the end.
    fwd_hi = fwd_total - fwd_lo
    extra = (out_size + fwd_total - k) % s  # Forward-stride remainder.
    return (k - 1 - fwd_lo, k - 1 - fwd_hi + extra)


def deconv2d(x, output_shape, k_h, k_w, d_h, d_w, stddev=0.02,
             name="deconv2d", use_sn=False):
    """Transposed SAME conv (arch_ops.py:579-592). output_shape: NHWC list;
    the spatial dims are honored exactly like tf.nn.conv2d_transpose's
    output_shape (any ceil-div preimage of the input size, not just
    in*stride).

    Kernel is stored HWOI = (k_h, k_w, C_out, C_in), same layout as the
    reference's tf.nn.conv2d_transpose kernel, so spectral norm flattens to
    (-1, C_in) identically.
    """
    out_ch = output_shape[-1]
    with core.scope(name):
        w = core.param("kernel", (k_h, k_w, out_ch, x.shape[-1]),
                       weight_initializer(stddev=stddev))
        sigma = (spectral_norm_sigma(w, compute_dtype=x.dtype)
                 if use_sn else None)
        # transpose_kernel=True + HWIO reproduces tf.nn.conv2d_transpose
        # exactly (spatial flip + I/O swap + SAME pad alignment) for the
        # (k_h, k_w, C_out, C_in) kernel — verified against TF in
        # tests/test_arch_ops.py::test_deconv2d_matches_tf_conv2d_transpose
        # (even and odd output sizes).
        pads = [_deconv_same_pads(x.shape[1], output_shape[1], k_h, d_h),
                _deconv_same_pads(x.shape[2], output_shape[2], k_w, d_w)]
        out = jax.lax.conv_transpose(
            x, w.astype(x.dtype), strides=(d_h, d_w), padding=pads,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True)
        if sigma is not None:
            out = out / sigma.astype(out.dtype)
        bias = core.param("bias", (out_ch,), constant_init(0.0))
        return out + bias.astype(out.dtype)


def lrelu(x, leak=0.2):
    return jnp.maximum(x, leak * x)


# ---------------------------------------------------------------------------
# Batch normalization family
# ---------------------------------------------------------------------------


def _moving_moments_for_inference(mean, variance, is_training, decay):
    """Moving-average BN stats (arch_ops.py:66-119). State names match the
    reference's `moving_mean`/`moving_variance` for golden tests."""
    moving_mean = core.get_state("moving_mean", mean.shape, zeros_init())
    moving_variance = core.get_state("moving_variance", variance.shape,
                                     ones_init())
    if is_training:
        # assign_moving_average, zero_debias=False:
        # mv <- mv * decay + value * (1 - decay)
        core.set_state("moving_mean",
                       moving_mean * decay + mean * (1.0 - decay))
        core.set_state("moving_variance",
                       moving_variance * decay + variance * (1.0 - decay))
        return mean, variance
    return moving_mean, moving_variance


def _accumulated_moments_for_inference(mean, variance, is_training):
    """Accumulator BN stats (arch_ops.py:122-191): at eval time, while the
    int switch `update_accus` is 1, every forward adds the batch moments to
    accumulators; the normalized output uses accumulated stats. Used by the
    204,800-sample BN-filling protocol (eval_gan_lib.py:65-92)."""
    with core.scope("accu"):
        accu_mean = core.get_state("accu_mean", mean.shape, zeros_init())
        accu_variance = core.get_state("accu_variance", variance.shape,
                                       zeros_init())
        accu_counter = core.get_state("accu_counter", (),
                                      constant_init(1e-12))
        update_accus = core.get_state("update_accus", (), zeros_init(),
                                      dtype=jnp.int32)
        if is_training:
            return mean, variance
        do_update = (update_accus == 1).astype(mean.dtype)
        new_mean = accu_mean + do_update * mean
        new_variance = accu_variance + do_update * variance
        new_counter = accu_counter + do_update
        core.set_state("accu_mean", new_mean)
        core.set_state("accu_variance", new_variance)
        core.set_state("accu_counter", new_counter)
        return new_mean / new_counter, new_variance / new_counter


@gin.configurable("standardize_batch")
def standardize_batch(x, is_training, decay=0.999, epsilon=1e-3,
                      data_format="NHWC", use_moving_averages=True,
                      use_cross_replica_mean=None, num_batch_groups=1):
    """Normalize by batch moments, no trainable scale/offset
    (arch_ops.py:194-324).

    TPU-native semantics: moments are over the *global* batch — under pjit
    with the batch sharded on the `data` mesh axis, XLA lowers these
    reductions to cross-replica all-reduces over ICI, which is exactly the
    reference's `use_cross_replica_mean=True` path (tpu_ops.py:95-125)
    without hand-written collectives. `use_cross_replica_mean` is accepted
    for config parity; `num_batch_groups > 1` reproduces group-limited BN
    (tpu_ops.py:75-91): moments per contiguous batch subgroup.
    """
    del use_cross_replica_mean  # Global-batch math is always cross-replica.
    if data_format != "NHWC":
        raise ValueError("TPU-native rebuild is NHWC only.")
    if x.ndim not in (2, 4):
        raise ValueError(f"Expected rank 2 or 4, got {x.ndim}.")
    if is_training:
        # Structural fact for callers (e.g. the fake-only-G-loss guard):
        # in training mode the output is normalized by the CURRENT batch's
        # moments in both moving-average and accumulator modes — examples
        # are coupled even when no state is written (accumulator mode
        # writes nothing during training).
        core.tag("batch_coupled")
    in_dtype = x.dtype
    in_shape = x.shape
    num_channels = x.shape[-1]
    if x.ndim == 2:
        x = x.reshape(-1, 1, 1, num_channels)
    x32 = x.astype(jnp.float32)
    if num_batch_groups > 1:
        b = x32.shape[0]
        assert b % num_batch_groups == 0, (b, num_batch_groups)
        xg = x32.reshape(num_batch_groups, b // num_batch_groups,
                         *x32.shape[1:])
        mean_g = jnp.mean(xg, axis=(1, 2, 3))
        var_g = jnp.mean(jnp.square(xg), axis=(1, 2, 3)) - jnp.square(mean_g)
        # Per-group normalization; inference stats use the group mean.
        mean_full = jnp.repeat(mean_g, b // num_batch_groups, axis=0)
        var_full = jnp.repeat(var_g, b // num_batch_groups, axis=0)
        mean, variance = jnp.mean(mean_g, 0), jnp.mean(var_g, 0)
    else:
        mean = jnp.mean(x32, axis=(0, 1, 2))
        variance = jnp.mean(jnp.square(x32), axis=(0, 1, 2)) - jnp.square(mean)
        mean_full = var_full = None

    if use_moving_averages:
        use_mean, use_var = _moving_moments_for_inference(
            mean=mean, variance=variance, is_training=is_training,
            decay=decay)
    else:
        use_mean, use_var = _accumulated_moments_for_inference(
            mean=mean, variance=variance, is_training=is_training)

    if num_batch_groups > 1 and is_training:
        use_mean = mean_full[:, None, None, :]
        use_var = var_full[:, None, None, :]
    out = (x32 - use_mean) * jax.lax.rsqrt(use_var + epsilon)
    out = out.astype(in_dtype)
    if len(in_shape) == 2:
        out = out.reshape(in_shape)
    return out


@gin.configurable("no_batch_norm")
def no_batch_norm(x, **unused_kwargs):
    return x


@gin.configurable("batch_norm")
def batch_norm(x, is_training, center=True, scale=True, name="batch_norm"):
    """BN with trainable gamma/beta (arch_ops.py:327-367)."""
    with core.scope(name):
        out = standardize_batch(x, is_training=is_training)
        num_channels = x.shape[-1]
        if scale:
            gamma = core.param("gamma", (num_channels,), ones_init())
            out = out * gamma.astype(out.dtype)
        if center:
            beta = core.param("beta", (num_channels,), zeros_init())
            out = out + beta.astype(out.dtype)
        return out


@gin.configurable("self_modulated_batch_norm")
def self_modulated_batch_norm(x, z, is_training, use_sn, center=True,
                              scale=True, name="batch_norm", num_hidden=32):
    """Self-modulation: gamma/beta = MLP(z) (arch_ops.py:370-420,
    arXiv:1810.01365)."""
    if z is None:
        raise ValueError("You must provide z for self modulation.")
    with core.scope(name):
        out = standardize_batch(x, is_training=is_training)
        num_channels = x.shape[-1]
        with core.scope("sbn"):
            h = z
            if num_hidden > 0:
                h = jax.nn.relu(linear(h, num_hidden, scope="hidden",
                                       use_sn=use_sn))
            if scale:
                gamma = linear(h, num_channels, scope="gamma",
                               bias_start=1.0, use_sn=use_sn)
                out = out * gamma[:, None, None, :].astype(out.dtype)
            if center:
                beta = linear(h, num_channels, scope="beta", use_sn=use_sn)
                out = out + beta[:, None, None, :].astype(out.dtype)
            return out


@gin.configurable("conditional_batch_norm")
def conditional_batch_norm(x, y, is_training, use_sn, center=True,
                           scale=True, name="batch_norm", use_bias=False):
    """Class-conditional BN: gamma/beta = linear(y) (arch_ops.py:423-445)."""
    if y is None:
        raise ValueError("You must provide y for conditional batch norm.")
    if y.ndim != 2:
        raise ValueError("Conditioning must have rank 2.")
    with core.scope(name):
        out = standardize_batch(x, is_training=is_training)
        num_channels = x.shape[-1]
        with core.scope("condition"):
            if scale:
                gamma = linear(y, num_channels, scope="gamma", use_sn=use_sn,
                               use_bias=use_bias)
                out = out * gamma[:, None, None, :].astype(out.dtype)
            if center:
                beta = linear(y, num_channels, scope="beta", use_sn=use_sn,
                              use_bias=use_bias)
                out = out + beta[:, None, None, :].astype(out.dtype)
            return out


def layer_norm(x, is_training, scope="LayerNorm"):
    """Layer norm over all non-batch axes, per-channel gamma/beta
    (arch_ops.py:448-450 / tf.contrib.layers.layer_norm)."""
    del is_training
    with core.scope(scope):
        num_channels = x.shape[-1]
        gamma = core.param("gamma", (num_channels,), ones_init())
        beta = core.param("beta", (num_channels,), zeros_init())
        x32 = x.astype(jnp.float32)
        axes = tuple(range(1, x.ndim))
        mean = jnp.mean(x32, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=axes, keepdims=True)
        out = (x32 - mean) * jax.lax.rsqrt(var + 1e-12)
        return (out * gamma + beta).astype(x.dtype)


@gin.configurable("evonorm_s0")
def evonorm_s0(x, name="evonorm"):
    """EvoNorm-S0 (Liu et al. 2020) — BN-free, collective-free normalization;
    a TPU-native extension (no reference counterpart), useful when
    cross-replica BN traffic dominates at small per-chip batch. Gin hook:
    `G.batch_norm_fn = @evonorm_s0` (batch-independent, so no cross-replica
    moments and no moving statistics to synchronize)."""
    with core.scope(name):
        c = x.shape[-1]
        gamma = core.param("gamma", (c,), ones_init())
        beta = core.param("beta", (c,), zeros_init())
        v = core.param("v", (c,), ones_init())
        x32 = x.astype(jnp.float32)
        b, h, w, _ = x32.shape
        # Largest divisor of c that is <= 32 (c=48 -> 24, c=80 -> 20):
        # groups must tile the channel dim exactly.
        groups = max(g for g in range(1, min(32, c) + 1) if c % g == 0)
        xg = x32.reshape(b, h, w, groups, c // groups)
        std = jnp.sqrt(jnp.var(xg, axis=(1, 2, 4), keepdims=True) + 1e-5)
        std = jnp.broadcast_to(std, xg.shape).reshape(x32.shape)
        num = x32 * jax.nn.sigmoid(v * x32)
        return ((num / std) * gamma + beta).astype(x.dtype)


# ---------------------------------------------------------------------------
# Weight normalization (arch_ops.py:600-706)
# ---------------------------------------------------------------------------


def _weight_norm_gb(init_scale, x_init, eps=1e-8):
    """Data-dependent g/b init from the init-trace batch (Salimans&Kingma).
    eps matches the reference per layer: 1e-10 for the linear
    (arch_ops.py:617), 1e-8 for conv/deconv (:654,:694)."""
    axes = tuple(range(x_init.ndim - 1))
    m_init = jnp.mean(x_init, axis=axes)
    v_init = jnp.var(x_init, axis=axes)
    scale_init = init_scale / jnp.sqrt(v_init + eps)
    return m_init, scale_init


def weight_norm_linear(x, output_size, init=False, init_scale=1.0,
                       name="wn_linear", stddev=0.02):
    """Weight-normalized dense (arch_ops.py:600-631)."""
    with core.scope(name):
        v = core.param("V", (x.shape[-1], output_size),
                       _truncated_normal_init(stddev))
        if init and core.is_initializing():
            v_normed = v * jax.lax.rsqrt(
                jnp.sum(jnp.square(v), 0, keepdims=True))
            x_init = jnp.dot(x, v_normed,
                             preferred_element_type=jnp.float32)
            m_init, scale_init = _weight_norm_gb(init_scale, x_init,
                                                 eps=1e-10)
            g = core.param("g", (output_size,),
                           lambda k, s, d: scale_init.astype(d))
            b = core.param("b", (output_size,),
                           lambda k, s, d: (-m_init * scale_init).astype(d))
        else:
            g = core.param("g", (output_size,), ones_init())
            b = core.param("b", (output_size,), zeros_init())
        scaler = g * jax.lax.rsqrt(jnp.sum(jnp.square(v), 0))
        return scaler[None, :] * jnp.dot(
            x, v, preferred_element_type=jnp.float32) + b[None, :]


def weight_norm_conv2d(x, output_dim, k_h, k_w, d_h, d_w, init=False,
                       init_scale=1.0, stddev=0.02, name="wn_conv2d"):
    """Weight-normalized conv (arch_ops.py:634-668)."""
    with core.scope(name):
        v = core.param("V", (k_h, k_w, x.shape[-1], output_dim),
                       _truncated_normal_init(stddev))
        if init and core.is_initializing():
            v_norm = v * jax.lax.rsqrt(
                jnp.sum(jnp.square(v), (0, 1, 2), keepdims=True))
            x_init = jax.lax.conv_general_dilated(
                x, v_norm, (d_h, d_w), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            m_init, scale_init = _weight_norm_gb(init_scale, x_init)
            g = core.param("g", (output_dim,),
                           lambda k, s, d: scale_init.astype(d))
            b = core.param("b", (output_dim,),
                           lambda k, s, d: (-m_init * scale_init).astype(d))
        else:
            g = core.param("g", (output_dim,), ones_init())
            b = core.param("b", (output_dim,), zeros_init())
        w = g[None, None, None, :] * v * jax.lax.rsqrt(
            jnp.sum(jnp.square(v), (0, 1, 2), keepdims=True))
        out = jax.lax.conv_general_dilated(
            x, w, (d_h, d_w), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + b[None, None, None, :]


def weight_norm_deconv2d(x, output_dim, k_h, k_w, d_h, d_w, init=False,
                         init_scale=1.0, stddev=0.02, name="wn_deconv2d"):
    """Weight-normalized transposed conv (arch_ops.py:671-706)."""
    with core.scope(name):
        v = core.param("V", (k_h, k_w, output_dim, x.shape[-1]),
                       _truncated_normal_init(stddev))
        v_normed = v * jax.lax.rsqrt(
            jnp.sum(jnp.square(v), (0, 1, 3), keepdims=True))
        if init and core.is_initializing():
            x_init = jax.lax.conv_transpose(
                x, v_normed, (d_h, d_w), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                transpose_kernel=True)
            m_init, scale_init = _weight_norm_gb(init_scale, x_init)
            g = core.param("g", (output_dim,),
                           lambda k, s, d: scale_init.astype(d))
            b = core.param("b", (output_dim,),
                           lambda k, s, d: (-m_init * scale_init).astype(d))
        else:
            g = core.param("g", (output_dim,), ones_init())
            b = core.param("b", (output_dim,), zeros_init())
        w = g[None, None, :, None] * v_normed
        # Same tf.nn.conv2d_transpose lowering as deconv2d above.
        out = jax.lax.conv_transpose(
            x, w, (d_h, d_w), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True)
        return out + b[None, None, None, :]


# ---------------------------------------------------------------------------
# Self-attention (SAGAN non-local block)
# ---------------------------------------------------------------------------


def _max_pool_2x2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1), padding="VALID")


@gin.configurable("attention")
def attention_options(use_pallas=None):
    """use_pallas: None = auto (Pallas fused attention on TPU, einsum
    elsewhere); True/False force."""
    if use_pallas is None:
        return jax.default_backend() == "tpu"
    return use_pallas


def non_local_block(x, name, use_sn):
    """SAGAN self-attention (arch_ops.py:709-758): theta/phi/g 1x1 convs,
    2x2 max-pool on phi and g, softmax attention, learned sigma gate.

    The attention matmuls ([B, HW, HW/4]) map directly onto the MXU; phi/g
    pooling quarters the attention FLOPs exactly as in the reference.
    """
    with core.scope(name):
        b, h, w, num_channels = x.shape
        attn_ch = num_channels // 8
        g_ch = num_channels // 2

        theta = conv1x1(x, attn_ch, name="conv2d_theta", use_sn=use_sn,
                        use_bias=False)
        theta = theta.reshape(b, h * w, attn_ch)

        phi = conv1x1(x, attn_ch, name="conv2d_phi", use_sn=use_sn,
                      use_bias=False)
        phi = _max_pool_2x2(phi).reshape(b, (h // 2) * (w // 2), attn_ch)

        g = conv1x1(x, g_ch, name="conv2d_g", use_sn=use_sn, use_bias=False)
        g = _max_pool_2x2(g).reshape(b, (h // 2) * (w // 2), g_ch)

        from compare_gan_tpu.ops import pallas_attention
        if attention_options():
            attn_g = pallas_attention.fused_attention(theta, phi, g)
        else:
            # The SAME numerics as the fused kernel (f32 scores, softmax,
            # AND PV product) so fallback == fused holds bitwise-closely
            # on every backend — don't reimplement inline.
            attn_g = pallas_attention.reference_attention(theta, phi, g)
        attn_g = attn_g.reshape(b, h, w, g_ch).astype(x.dtype)
        sigma = core.param("sigma", (), zeros_init())
        attn_g = conv1x1(attn_g, num_channels, name="conv2d_attn_g",
                         use_sn=use_sn, use_bias=False)
        return x + sigma.astype(x.dtype) * attn_g
