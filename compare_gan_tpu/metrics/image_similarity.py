"""SSIM / multiscale SSIM in JAX.

Rebuild of compare_gan/metrics/image_similarity.py:85-333 (a TF port of the
classic Wang et al. MS-SSIM). Written as pure JAX on NHWC batches: the
11×11 Gaussian window becomes a depthwise conv (XLA fuses the whole
pyramid), so the metric can run on TPU over large pair batches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Wang et al. 2003 power factors (image_similarity.py:247).
_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _fspecial_gauss(size: int, sigma: float) -> np.ndarray:
    """2-D Gaussian window (image_similarity.py:63-82)."""
    radius = size // 2
    offset = 0.0 if size % 2 else 0.5
    coords = np.arange(size) - radius + offset
    g = np.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    window = np.outer(g, g)
    return (window / window.sum()).astype(np.float32)


def _depthwise_filter(x, window):
    """Depthwise 'VALID' conv of NHWC x with a single 2-D window."""
    c = x.shape[-1]
    w = jnp.asarray(window)[:, :, None, None] * jnp.eye(c)[None, None]
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _ssim_per_scale(img1, img2, max_val=255.0, filter_size=11,
                    filter_sigma=1.5, k1=0.01, k2=0.03):
    """Per-scale mean SSIM and contrast-structure (image_similarity.py:
    85-180). Returns (ssim [N], cs [N])."""
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    h, w = img1.shape[1], img1.shape[2]
    size = min(filter_size, h, w)
    sigma = size * filter_sigma / filter_size if filter_size else filter_sigma
    window = _fspecial_gauss(size, sigma)

    mu1 = _depthwise_filter(img1, window)
    mu2 = _depthwise_filter(img2, window)
    sigma11 = _depthwise_filter(img1 * img1, window)
    sigma22 = _depthwise_filter(img2 * img2, window)
    sigma12 = _depthwise_filter(img1 * img2, window)

    mu11, mu22, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma11 = sigma11 - mu11
    sigma22 = sigma22 - mu22
    sigma12 = sigma12 - mu12

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    v1 = 2.0 * sigma12 + c2
    v2 = sigma11 + sigma22 + c2
    # Per-CHANNEL means [N, C]: the reference combines the weighted
    # geometric product per channel and averages over channels only after
    # the final product (image_similarity.py:323-333) — averaging earlier
    # changes the result whenever channels have different statistics.
    axes = (1, 2)
    ssim = jnp.mean(((2.0 * mu12 + c1) * v1) / ((mu11 + mu22 + c1) * v2),
                    axis=axes)
    cs = jnp.mean(v1 / v2, axis=axes)
    return ssim, cs


def _downsample_2x(x):
    """2×2 mean pool with reflect-pad to even dims
    (image_similarity.py:293-300 uses same semantics)."""
    n, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)), mode="edge")
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


@functools.partial(jax.jit, static_argnames=("levels",))
def multiscale_ssim(img1, img2, max_val=255.0, levels=5):
    """MS-SSIM over `levels` scales (image_similarity.py:183-333). Inputs
    NHWC in [0, max_val]; returns [N]."""
    weights = jnp.asarray(_MSSSIM_WEIGHTS[:levels])
    mcs = []
    ssim = None
    for level in range(levels):
        ssim, cs = _ssim_per_scale(img1, img2, max_val=max_val)
        mcs.append(jnp.maximum(cs, 0.0))
        if level < levels - 1:
            img1 = _downsample_2x(img1)
            img2 = _downsample_2x(img2)
    mcs = jnp.stack(mcs[:-1])  # Last level contributes via ssim term.
    per_channel = (jnp.prod(mcs ** weights[:-1, None, None], axis=0)
                   * jnp.maximum(ssim, 0.0) ** weights[-1])  # [N, C]
    return jnp.mean(per_channel, axis=-1)


def ssim(img1, img2, max_val=255.0):
    """Single-scale SSIM, [N] (channel-averaged)."""
    return jnp.mean(_ssim_per_scale(jnp.asarray(img1), jnp.asarray(img2),
                                    max_val=max_val)[0], axis=-1)
