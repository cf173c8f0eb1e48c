"""Inception network for FID/IS feature extraction, in JAX — on TPU.

The reference runs the frozen `inceptionv1_for_inception_score.pb` graph
(the classic 2015-12-05 Inception-v3 graph with `pool_3` 2048-d features
and 1008-way `logits`) through host TensorFlow sessions
(eval_utils.py:41-49,165-206), which is why it documents "evaluation on
TPUs is not supported". This module re-implements that exact architecture
as a pure JAX function so feature extraction runs jitted on TPU, plus
`convert_frozen_graph` to translate the public frozen GraphDef's weights
into the `.npz` this model consumes (weights keyed by the graph's own op
names, so conversion is a mechanical Const dump).

Architecture (op names follow the frozen graph):
  input [N,299,299,3] in [-1,1]
  conv(3x3/2 V) conv_1(3x3 V) conv_2(3x3 S) maxpool(3x3/2 V)
  conv_3(1x1 V) conv_4(3x3 V) maxpool(3x3/2 V)
  mixed, mixed_1, mixed_2          (35x35 inception-A; pool proj 32/64/64)
  mixed_3                          (reduction-A)
  mixed_4..mixed_7                 (17x17 inception-B; 128/160/160/192)
  mixed_8                          (reduction-B)
  mixed_9, mixed_10                (8x8 inception-C)
  pool_3 = global avg -> [N,2048]; logits = pool_3 @ softmax/weights + b
Every conv is conv -> batchnorm(beta only, eps 1e-3) -> relu.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def _conv_bn_relu(params, x, scope, stride=1, padding="SAME"):
    w = params[f"{scope}/conv2d_params"]
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    beta = params[f"{scope}/batchnorm/beta"].astype(jnp.float32)
    mean = params[f"{scope}/batchnorm/moving_mean"].astype(jnp.float32)
    var = params[f"{scope}/batchnorm/moving_variance"].astype(jnp.float32)
    out = (out - mean) * jax.lax.rsqrt(var + 1e-3) + beta
    return jax.nn.relu(out).astype(x.dtype)


def _max_pool(x, size=3, stride=2, padding="VALID"):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, size, size, 1),
        (1, stride, stride, 1), padding)


def _avg_pool(x, size=3, stride=1, padding="SAME"):
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, size, size, 1), (1, stride, stride, 1),
        padding)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, size, size, 1), (1, stride, stride, 1),
        padding)
    return summed / counts


def _inception_a(params, x, scope, pool_proj):
    """35x35 block `mixed`/`mixed_1`/`mixed_2`."""
    b0 = _conv_bn_relu(params, x, f"{scope}/conv")              # 1x1 64
    b1 = _conv_bn_relu(params, x, f"{scope}/tower/conv")        # 1x1 48
    b1 = _conv_bn_relu(params, b1, f"{scope}/tower/conv_1")     # 5x5 64
    b2 = _conv_bn_relu(params, x, f"{scope}/tower_1/conv")      # 1x1 64
    b2 = _conv_bn_relu(params, b2, f"{scope}/tower_1/conv_1")   # 3x3 96
    b2 = _conv_bn_relu(params, b2, f"{scope}/tower_1/conv_2")   # 3x3 96
    b3 = _avg_pool(x)
    b3 = _conv_bn_relu(params, b3, f"{scope}/tower_2/conv")     # pool proj
    del pool_proj
    return jnp.concatenate([b0, b1, b2, b3], axis=3)


def _reduction_a(params, x, scope):
    """`mixed_3`: 35x35 -> 17x17."""
    b0 = _conv_bn_relu(params, x, f"{scope}/conv", stride=2,
                       padding="VALID")                          # 3x3/2 384
    b1 = _conv_bn_relu(params, x, f"{scope}/tower/conv")         # 1x1 64
    b1 = _conv_bn_relu(params, b1, f"{scope}/tower/conv_1")      # 3x3 96
    b1 = _conv_bn_relu(params, b1, f"{scope}/tower/conv_2", stride=2,
                       padding="VALID")                          # 3x3/2 96
    b2 = _max_pool(x)
    return jnp.concatenate([b0, b1, b2], axis=3)


def _inception_b(params, x, scope):
    """17x17 block `mixed_4`..`mixed_7` (1x7/7x1 factorized)."""
    b0 = _conv_bn_relu(params, x, f"{scope}/conv")               # 1x1 192
    b1 = _conv_bn_relu(params, x, f"{scope}/tower/conv")
    b1 = _conv_bn_relu(params, b1, f"{scope}/tower/conv_1")      # 1x7
    b1 = _conv_bn_relu(params, b1, f"{scope}/tower/conv_2")      # 7x1 192
    b2 = _conv_bn_relu(params, x, f"{scope}/tower_1/conv")
    b2 = _conv_bn_relu(params, b2, f"{scope}/tower_1/conv_1")    # 7x1
    b2 = _conv_bn_relu(params, b2, f"{scope}/tower_1/conv_2")    # 1x7
    b2 = _conv_bn_relu(params, b2, f"{scope}/tower_1/conv_3")    # 7x1
    b2 = _conv_bn_relu(params, b2, f"{scope}/tower_1/conv_4")    # 1x7 192
    b3 = _avg_pool(x)
    b3 = _conv_bn_relu(params, b3, f"{scope}/tower_2/conv")      # 1x1 192
    return jnp.concatenate([b0, b1, b2, b3], axis=3)


def _reduction_b(params, x, scope):
    """`mixed_8`: 17x17 -> 8x8."""
    b0 = _conv_bn_relu(params, x, f"{scope}/tower/conv")         # 1x1 192
    b0 = _conv_bn_relu(params, b0, f"{scope}/tower/conv_1", stride=2,
                       padding="VALID")                          # 3x3/2 320
    b1 = _conv_bn_relu(params, x, f"{scope}/tower_1/conv")       # 1x1 192
    b1 = _conv_bn_relu(params, b1, f"{scope}/tower_1/conv_1")    # 1x7
    b1 = _conv_bn_relu(params, b1, f"{scope}/tower_1/conv_2")    # 7x1
    b1 = _conv_bn_relu(params, b1, f"{scope}/tower_1/conv_3", stride=2,
                       padding="VALID")                          # 3x3/2 192
    b2 = _max_pool(x)
    return jnp.concatenate([b0, b1, b2], axis=3)


def _inception_c(params, x, scope):
    """8x8 block `mixed_9`/`mixed_10` (split 1x3 / 3x1 towers)."""
    b0 = _conv_bn_relu(params, x, f"{scope}/conv")               # 1x1 320
    b1 = _conv_bn_relu(params, x, f"{scope}/tower/conv")         # 1x1 384
    b1a = _conv_bn_relu(params, b1, f"{scope}/tower/mixed/conv")    # 1x3
    b1b = _conv_bn_relu(params, b1, f"{scope}/tower/mixed/conv_1")  # 3x1
    b2 = _conv_bn_relu(params, x, f"{scope}/tower_1/conv")       # 1x1 448
    b2 = _conv_bn_relu(params, b2, f"{scope}/tower_1/conv_1")    # 3x3 384
    b2a = _conv_bn_relu(params, b2, f"{scope}/tower_1/mixed/conv")
    b2b = _conv_bn_relu(params, b2, f"{scope}/tower_1/mixed/conv_1")
    b3 = _avg_pool(x)
    b3 = _conv_bn_relu(params, b3, f"{scope}/tower_2/conv")      # 1x1 192
    return jnp.concatenate([b0, b1a, b1b, b2a, b2b, b3], axis=3)


def inception_features(params: Dict[str, jax.Array], images):
    """images: [N,299,299,3] in [-1,1] -> (pool_3 [N,2048],
    logits [N,1008])."""
    x = images
    x = _conv_bn_relu(params, x, "conv", stride=2, padding="VALID")
    x = _conv_bn_relu(params, x, "conv_1", padding="VALID")
    x = _conv_bn_relu(params, x, "conv_2", padding="SAME")
    x = _max_pool(x)
    x = _conv_bn_relu(params, x, "conv_3", padding="VALID")
    x = _conv_bn_relu(params, x, "conv_4", padding="VALID")
    x = _max_pool(x)

    x = _inception_a(params, x, "mixed", 32)
    x = _inception_a(params, x, "mixed_1", 64)
    x = _inception_a(params, x, "mixed_2", 64)
    x = _reduction_a(params, x, "mixed_3")
    for scope in ["mixed_4", "mixed_5", "mixed_6", "mixed_7"]:
        x = _inception_b(params, x, scope)
    x = _reduction_b(params, x, "mixed_8")
    x = _inception_c(params, x, "mixed_9")
    x = _inception_c(params, x, "mixed_10")

    pool = jnp.mean(x, axis=(1, 2))  # pool_3
    logits = (pool @ params["softmax/weights"].astype(pool.dtype)
              + params["softmax/biases"].astype(pool.dtype))
    return pool, logits


def _resize_bilinear(images, size):
    """TF1 `tf.image.resize_bilinear` (align_corners=False, legacy scaling
    src = dst_idx * in/out) — the exact op inside tfgan.eval's
    preprocess_image that the reference maps over eval batches
    (eval_utils.py:165-176). jax.image.resize uses half-pixel centers,
    which diverges from the frozen graph's features."""
    n, h, w, c = images.shape
    if h == size and w == size:
        return images
    fy = jnp.arange(size, dtype=jnp.float32) * (np.float32(h) / size)
    fx = jnp.arange(size, dtype=jnp.float32) * (np.float32(w) / size)
    y0 = jnp.minimum(fy.astype(jnp.int32), h - 1)
    x0 = jnp.minimum(fx.astype(jnp.int32), w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (fy - y0.astype(jnp.float32))[None, :, None, None]
    wx = (fx - x0.astype(jnp.float32))[None, None, :, None]
    rows0, rows1 = images[:, y0], images[:, y1]
    top = rows0[:, :, x0] + (rows0[:, :, x1] - rows0[:, :, x0]) * wx
    bot = rows1[:, :, x0] + (rows1[:, :, x1] - rows1[:, :, x0]) * wx
    return top + (bot - top) * wy


@functools.partial(jax.jit, static_argnums=())
def _feature_jit(params, images_255):
    x = images_255.astype(jnp.float32)
    x = _resize_bilinear(x, 299)
    x = (x - 128.0) / 128.0  # The frozen graph's `Mul` preprocessing.
    return inception_features(params, x)


def make_feature_fn(npz_path: str) -> Callable:
    """(images uint8-range [N,H,W,3]) -> (pool [N,2048], logits [N,1008]),
    jitted; weights from `convert_frozen_graph` output."""
    with np.load(npz_path) as data:
        params = {k: jnp.asarray(data[k]) for k in data.files}

    def fn(images):
        pool, logits = _feature_jit(params, jnp.asarray(images))
        return np.asarray(pool), np.asarray(logits)

    return fn


# ---------------------------------------------------------------------------
# Weight conversion + test init
# ---------------------------------------------------------------------------


def convert_frozen_graph(pb_path: str, npz_out: str) -> None:
    """Dump every Const of the frozen 2015-12-05 Inception graph into the
    npz consumed by `inception_features` (names match graph op names,
    conv kernels already HWIO)."""
    import tensorflow as tf
    graph_def = tf.compat.v1.GraphDef()
    with open(pb_path, "rb") as f:
        graph_def.ParseFromString(f.read())
    out = {}
    for node in graph_def.node:
        if node.op != "Const":
            continue
        tensor = tf.make_ndarray(node.attr["value"].tensor)
        # Weights only: the graph also carries int32 plumbing Consts
        # (reduction indices, reshape shapes) that must not reach the npz.
        if tensor.ndim >= 1 and np.issubdtype(tensor.dtype, np.floating):
            out[node.name] = tensor
    np.savez(npz_out, **out)


_A_CH = {"mixed": (192, 32), "mixed_1": (256, 64), "mixed_2": (288, 64)}
_B_MID = {"mixed_4": 128, "mixed_5": 160, "mixed_6": 160, "mixed_7": 192}


def init_random(key) -> Dict[str, jax.Array]:
    """Random weights with the correct shapes (tests / benchmarks only —
    features are meaningless for metric values)."""
    shapes: Dict[str, tuple] = {}

    def conv(scope, kh, kw, cin, cout):
        shapes[f"{scope}/conv2d_params"] = (kh, kw, cin, cout)
        for suffix in ["beta", "moving_mean", "moving_variance"]:
            shapes[f"{scope}/batchnorm/{suffix}"] = (cout,)

    conv("conv", 3, 3, 3, 32)
    conv("conv_1", 3, 3, 32, 32)
    conv("conv_2", 3, 3, 32, 64)
    conv("conv_3", 1, 1, 64, 80)
    conv("conv_4", 3, 3, 80, 192)
    for scope, (cin, proj) in _A_CH.items():
        conv(f"{scope}/conv", 1, 1, cin, 64)
        conv(f"{scope}/tower/conv", 1, 1, cin, 48)
        conv(f"{scope}/tower/conv_1", 5, 5, 48, 64)
        conv(f"{scope}/tower_1/conv", 1, 1, cin, 64)
        conv(f"{scope}/tower_1/conv_1", 3, 3, 64, 96)
        conv(f"{scope}/tower_1/conv_2", 3, 3, 96, 96)
        conv(f"{scope}/tower_2/conv", 1, 1, cin, proj)
    conv("mixed_3/conv", 3, 3, 288, 384)
    conv("mixed_3/tower/conv", 1, 1, 288, 64)
    conv("mixed_3/tower/conv_1", 3, 3, 64, 96)
    conv("mixed_3/tower/conv_2", 3, 3, 96, 96)
    for scope, mid in _B_MID.items():
        conv(f"{scope}/conv", 1, 1, 768, 192)
        conv(f"{scope}/tower/conv", 1, 1, 768, mid)
        conv(f"{scope}/tower/conv_1", 1, 7, mid, mid)
        conv(f"{scope}/tower/conv_2", 7, 1, mid, 192)
        conv(f"{scope}/tower_1/conv", 1, 1, 768, mid)
        conv(f"{scope}/tower_1/conv_1", 7, 1, mid, mid)
        conv(f"{scope}/tower_1/conv_2", 1, 7, mid, mid)
        conv(f"{scope}/tower_1/conv_3", 7, 1, mid, mid)
        conv(f"{scope}/tower_1/conv_4", 1, 7, mid, 192)
        conv(f"{scope}/tower_2/conv", 1, 1, 768, 192)
    conv("mixed_8/tower/conv", 1, 1, 768, 192)
    conv("mixed_8/tower/conv_1", 3, 3, 192, 320)
    conv("mixed_8/tower_1/conv", 1, 1, 768, 192)
    conv("mixed_8/tower_1/conv_1", 1, 7, 192, 192)
    conv("mixed_8/tower_1/conv_2", 7, 1, 192, 192)
    conv("mixed_8/tower_1/conv_3", 3, 3, 192, 192)
    for scope, cin in [("mixed_9", 1280), ("mixed_10", 2048)]:
        conv(f"{scope}/conv", 1, 1, cin, 320)
        conv(f"{scope}/tower/conv", 1, 1, cin, 384)
        conv(f"{scope}/tower/mixed/conv", 1, 3, 384, 384)
        conv(f"{scope}/tower/mixed/conv_1", 3, 1, 384, 384)
        conv(f"{scope}/tower_1/conv", 1, 1, cin, 448)
        conv(f"{scope}/tower_1/conv_1", 3, 3, 448, 384)
        conv(f"{scope}/tower_1/mixed/conv", 1, 3, 384, 384)
        conv(f"{scope}/tower_1/mixed/conv_1", 3, 1, 384, 384)
        conv(f"{scope}/tower_2/conv", 1, 1, cin, 192)
    shapes["softmax/weights"] = (2048, 1008)
    shapes["softmax/biases"] = (1008,)

    params = {}
    for i, (name, shape) in enumerate(sorted(shapes.items())):
        sub = jax.random.fold_in(key, i)
        if name.endswith("moving_variance"):
            params[name] = jnp.ones(shape, jnp.float32)
        elif name.endswith(("beta", "moving_mean", "biases")):
            params[name] = jnp.zeros(shape, jnp.float32)
        else:
            # He scaling: each ReLU halves the signal's second moment, so
            # sqrt(2/fan_in) keeps activation magnitude roughly constant
            # through the ~40-conv stack. With 1/sqrt(fan_in) the pool
            # features decayed to ~1e-4 and all distributions collapsed
            # to near-zero FID — useless as a random-feature FID proxy.
            fan_in = int(np.prod(shape[:-1]))
            params[name] = (jax.random.normal(sub, shape, jnp.float32)
                            * np.sqrt(2.0 / fan_in))
    return params
