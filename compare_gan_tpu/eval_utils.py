"""Eval data holders + Inception feature extraction.

Rebuild of compare_gan/eval_utils.py (206 LoC). The reference downloads the
frozen 2015-12-05 Inception graph (eval_utils.py:41-49) and pushes NumPy
batches through `pool_3:0` / `logits:0` with feed-dicts
(eval_utils.py:165-206). This rebuild keeps the same feature contract
(activations from the penultimate pool, logits from the classifier) with a
pluggable backend chain, best first:

1. JAX InceptionV3 (metrics/inception_net.py) with weights from
   `$COMPARE_GAN_INCEPTION_NPZ` — runs ON TPU, lifting the reference's
   "eval on TPU unsupported" limitation (README.md:113-115).
2. The frozen GraphDef at `$COMPARE_GAN_INCEPTION_PB` executed by
   host TensorFlow (exactly the reference's numerics).
3. A test-injected fake via `set_inception_fn` (reference
   test_utils.py:87-107 mocks the graph the same way).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import numpy as np

NanFoundError = type("NanFoundError", (ValueError,), {})

INCEPTION_NPZ_ENV = "COMPARE_GAN_INCEPTION_NPZ"
INCEPTION_PB_ENV = "COMPARE_GAN_INCEPTION_PB"

# Test hook: fn(images_uint8_0_255 [N,H,W,3]) -> (pool [N,D], logits [N,K]).
_inception_fn: Optional[Callable] = None


def set_inception_fn(fn: Optional[Callable]) -> None:
    global _inception_fn
    _inception_fn = fn


class EvalDataSample:
    """Images + lazily attached activations/logits
    (reference EvalDataSample, eval_utils.py:56-84). Images are [0, 255]."""

    def __init__(self, images: np.ndarray):
        self.images = images
        self.activations: Optional[np.ndarray] = None
        self.logits: Optional[np.ndarray] = None

    def set_num_examples(self, num_examples: int):
        """Truncate to exactly num_examples (reference eval_utils.py:68-78:
        sampling rounds up to full batches, metrics use exactly N)."""
        if len(self.images):
            assert len(self.images) >= num_examples
            self.images = self.images[:num_examples]
        if self.activations is not None:
            self.activations = self.activations[:num_examples]
        if self.logits is not None:
            self.logits = self.logits[:num_examples]

    def discard_images(self):
        """Free image memory once features exist (eval_gan_lib.py:179-183
        frees runs > 0 to bound host memory)."""
        self.images = np.empty((0,))

    def set_data(self, activations, logits):
        self.activations = activations
        self.logits = logits


def _tf_frozen_graph_fn(pb_path: str) -> Callable:
    import tensorflow as tf

    graph_def = tf.compat.v1.GraphDef()
    with open(pb_path, "rb") as f:
        graph_def.ParseFromString(f.read())

    # Build the graph and session ONCE — a 50k-image eval calls the
    # returned fn ~800 times, and a per-call import_graph_def + Session
    # startup would swamp the actual inference time.
    graph = tf.Graph()
    with graph.as_default():
        tf.import_graph_def(graph_def, name="")
    pool = graph.get_tensor_by_name("pool_3:0")
    logits = graph.get_tensor_by_name("logits:0")
    inp = graph.get_tensor_by_name("Mul:0")
    sess = tf.compat.v1.Session(graph=graph)

    def run(images):
        pools, logit_out = [], []
        for i in range(0, len(images), 64):
            # tfgan.eval.preprocess_image, which the reference maps
            # over inputs before run_inception (eval_utils.py:165-176):
            # bilinear resize to 299x299 then (x - 128) / 128 —
            # Mul:0 sits *after* the graph's own preprocessing, so
            # raw [0,255] dataset-resolution batches would crash on
            # non-299 inputs or skew the features.
            batch = np.asarray(images[i:i + 64], np.float32)
            if batch.shape[1:3] != (299, 299):
                from compare_gan_tpu.datasets import _resize_bilinear_np
                batch = np.stack([_resize_bilinear_np(im, (299, 299))
                                  for im in batch])
            batch = (batch - 128.0) / 128.0
            p, l = sess.run([pool, logits], {inp: batch})
            pools.append(p.reshape(len(batch), -1))
            logit_out.append(l.reshape(len(batch), -1))
        return np.concatenate(pools), np.concatenate(logit_out)

    return run


def _jax_inception_fn(npz_path: str) -> Callable:
    from compare_gan_tpu.metrics import inception_net
    return inception_net.make_feature_fn(npz_path)


_resolved_fns: dict = {}  # path -> fn (weights load + session build once)


def get_inception_fn() -> Callable:
    """Resolve the feature extractor (priority: test hook > JAX-on-TPU >
    TF frozen graph). Resolved extractors are memoized by path — each
    build costs a ~90 MB weight load (JAX) or a graph import + session
    startup (TF), and eval calls this several times per checkpoint."""
    if _inception_fn is not None:
        return _inception_fn
    npz = os.environ.get(INCEPTION_NPZ_ENV)
    if npz and os.path.exists(npz):
        if npz not in _resolved_fns:
            _resolved_fns[npz] = _jax_inception_fn(npz)
        return _resolved_fns[npz]
    pb = os.environ.get(INCEPTION_PB_ENV)
    if pb and os.path.exists(pb):
        if pb not in _resolved_fns:
            _resolved_fns[pb] = _tf_frozen_graph_fn(pb)
        return _resolved_fns[pb]
    raise RuntimeError(
        "No Inception feature extractor available. Set "
        f"${INCEPTION_NPZ_ENV} (JAX weights) or ${INCEPTION_PB_ENV} "
        "(frozen graph), or inject one with "
        "eval_utils.set_inception_fn (tests).")


def inception_transform_np(images: np.ndarray, batch_size: int = 64
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Batched (pool, logits) features for uint8-range images [N,H,W,3]
    (reference inception_transform_np, eval_utils.py:178-206). Raises
    NanFoundError on NaN inputs (eval_utils.py:150-154 protocol)."""
    if np.isnan(images).any():
        raise NanFoundError("NaN detected in images fed to Inception.")
    fn = get_inception_fn()
    pools, logits = [], []
    for i in range(0, len(images), batch_size):
        p, l = fn(images[i:i + batch_size])
        pools.append(np.asarray(p))
        logits.append(np.asarray(l))
    return np.concatenate(pools), np.concatenate(logits)


def sample_fake_dataset(sample_fn: Callable, num_batches: int,
                        batch_size: int = 64) -> np.ndarray:
    """Draw num_batches×batch_size images via `sample_fn(batch_index) ->
    [B,H,W,C] in [0,1]`, rescale to [0,255], tile grayscale → RGB
    (reference sample_fake_dataset, eval_utils.py:144-162)."""
    out = []
    for i in range(num_batches):
        images = np.asarray(sample_fn(i))
        if np.isnan(images).any():
            raise NanFoundError("Detected NaN in fake images.")
        out.append(images * 255.0)
    images = np.concatenate(out)
    if images.shape[-1] == 1:
        images = np.tile(images, (1, 1, 1, 3))
    return images
