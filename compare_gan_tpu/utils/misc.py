"""Misc utilities.

Rebuilds compare_gan/utils.py (kwarg filtering, parameter overview) and
compare_gan/gans/utils.py (rotate_images, image grids) as pure JAX/NumPy.
"""

from __future__ import annotations

import inspect
import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def enable_persistent_compile_cache(cache_dir=None):
    """Production default for every entry point (main, bench, demo,
    tools): persist XLA compilations across processes. BigGAN-size
    graphs take 15-25 minutes to compile over a tunneled TPU backend —
    without this every CLI invocation pays that again. Respects an
    explicit JAX_COMPILATION_CACHE_DIR env var or a prior jax.config
    setting; call before the first jit compilation."""
    import os

    if cache_dir is None:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   "/tmp/jax_compile_cache")
    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          2.0)


def call_with_accepted_args(fn, **kwargs):
    """Call fn with only the kwargs its signature accepts
    (compare_gan/utils.py:92-96) — lets gin configs target any fn."""
    target = fn
    # Unwrap gin-configurable wrappers so we see the real signature.
    while hasattr(target, "__wrapped_fn__"):
        target = target.__wrapped_fn__
    if inspect.isclass(target):
        target = target.__init__
    sig = inspect.signature(target)
    if any(p.kind == inspect.Parameter.VAR_KEYWORD
           for p in sig.parameters.values()):
        return fn(**kwargs)
    accepted = {k: v for k, v in kwargs.items() if k in sig.parameters}
    return fn(**accepted)


def rotate_images(images, rot90_scalars=(0, 1, 2, 3)):
    """Rotated copies of the batch, grouped rotation-major, selected by
    rot90_scalars (compare_gan/gans/utils.py:38-50: output batch =
    len(rot90_scalars) x input). Pure transpose/flip — VPU-only."""
    rotations = {
        0: lambda x: x,
        1: lambda x: jnp.flip(jnp.transpose(x, (0, 2, 1, 3)), axis=1),
        2: lambda x: jnp.flip(jnp.flip(x, axis=1), axis=2),
        3: lambda x: jnp.flip(jnp.transpose(x, (0, 2, 1, 3)), axis=2),
    }
    return jnp.concatenate([rotations[i](images) for i in rot90_scalars],
                           axis=0)


def image_grid(images, grid_shape=None):
    """Tile [N, H, W, C] into one [gh*H, gw*W, C] image (summaries,
    modular_gan.py:308-343)."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    if grid_shape is None:
        gw = int(math.ceil(math.sqrt(n)))
        gh = int(math.ceil(n / gw))
    else:
        gh, gw = grid_shape
        if n > gh * gw:
            images, n = images[:gh * gw], gh * gw  # Only first gh*gw used.
    pad = gh * gw - n
    if pad > 0:
        images = np.concatenate(
            [images, np.zeros((pad, h, w, c), images.dtype)], 0)
    return (images.reshape(gh, gw, h, w, c)
            .transpose(0, 2, 1, 3, 4)
            .reshape(gh * h, gw * w, c))


def check_folder(log_dir):
    """mkdir -p and return the path (compare_gan/gans/utils.py:24-30)."""
    import os
    os.makedirs(log_dir, exist_ok=True)
    return log_dir


def save_images(images, image_path):
    """Save an image (grid) in [0, 1] to disk
    (compare_gan/gans/utils.py:33-35; scipy.misc.imsave → PIL)."""
    from PIL import Image
    arr = np.asarray(images)
    if arr.ndim == 4:
        arr = image_grid(arr)
    arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[:, :, 0]
    Image.fromarray(arr).save(image_path)


def gaussian(batch_size, n_dim, mean=0.0, var=1.0):
    """NumPy gaussian batch (compare_gan/gans/utils.py:53-54)."""
    return np.random.normal(mean, var, (batch_size, n_dim)).astype(
        np.float32)


def get_parameter_overview(params: Dict[str, jax.Array],
                           include_stats: bool = False) -> str:
    """Markdown-ish table of variables (compare_gan/utils.py:99-175);
    include_stats adds per-variable mean/std columns like the
    reference."""
    rows, total = [], 0
    for name in sorted(params):
        v = params[name]
        n = int(np.prod(v.shape)) if v.shape else 1
        total += n
        row = f"| {name} | {tuple(v.shape)} | {n} |"
        if include_stats:
            arr = np.asarray(v, np.float64)
            row += f" {arr.mean():.3g} | {arr.std():.3g} |"
        rows.append(row)
    header = ("| Name | Shape | Size | Mean | Std |\n|---|---|---|---|---|\n"
              if include_stats else
              "| Name | Shape | Size |\n|---|---|---|\n")
    return header + "\n".join(rows) + f"\n\nTotal: {total:,}"
