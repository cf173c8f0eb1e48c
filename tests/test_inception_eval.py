"""On-TPU Inception feature extractor + eval pipeline integration
(the reference cannot do this: README.md:113-115 'eval on TPU
unsupported'; here the network is pure JAX)."""

import os

import jax
import numpy as np
import pytest

from compare_gan_tpu import eval_utils
from compare_gan_tpu.metrics import inception_net


@pytest.fixture(autouse=True)
def _cleanup():
    yield
    eval_utils.set_inception_fn(None)
    os.environ.pop(eval_utils.INCEPTION_NPZ_ENV, None)


def test_architecture_param_count():
    """The 2015-12-05 Inception-v3 graph has ~23.9M parameters."""
    params = inception_net.init_random(jax.random.PRNGKey(0))
    total = sum(int(np.prod(v.shape)) for v in params.values())
    assert 23_000_000 < total < 25_000_000, total
    assert params["softmax/weights"].shape == (2048, 1008)


def test_feature_shapes_and_determinism():
    params = inception_net.init_random(jax.random.PRNGKey(0))
    imgs = np.random.RandomState(0).rand(3, 32, 32, 3) * 255
    p1, l1 = inception_net._feature_jit(params, imgs.astype(np.float32))
    p2, l2 = inception_net._feature_jit(params, imgs.astype(np.float32))
    assert p1.shape == (3, 2048) and l1.shape == (3, 1008)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_npz_roundtrip_backend(tmp_path):
    """Weights saved to npz load through the eval_utils backend chain."""
    params = inception_net.init_random(jax.random.PRNGKey(1))
    npz = str(tmp_path / "inception.npz")
    np.savez(npz, **{k: np.asarray(v) for k, v in params.items()})
    os.environ[eval_utils.INCEPTION_NPZ_ENV] = npz
    imgs = np.random.RandomState(0).rand(4, 32, 32, 3) * 255
    pool, logits = eval_utils.inception_transform_np(imgs, batch_size=2)
    assert pool.shape == (4, 2048) and logits.shape == (4, 1008)


def test_no_backend_raises():
    with pytest.raises(RuntimeError):
        eval_utils.get_inception_fn()


def test_nan_images_raise():
    eval_utils.set_inception_fn(lambda x: (x.reshape(len(x), -1),
                                           x.reshape(len(x), -1)))
    bad = np.full((2, 4, 4, 3), np.nan)
    with pytest.raises(eval_utils.NanFoundError):
        eval_utils.inception_transform_np(bad)


# ---------------------------------------------------------------------------
# Converter proof without the real weights (r1 VERDICT Next #6): build a
# frozen GraphDef with the frozen graph's op layout (Mul:0 input, pool_3:0 /
# logits:0 outputs, Consts named like the 2015-12-05 graph), run
# convert_frozen_graph on it, and assert the JAX network reproduces the TF
# session's features. With the real .pb the only remaining unknown is
# numerics, not plumbing.
# ---------------------------------------------------------------------------


def _build_tf_graphdef(params):
    """TF mirror of inception_net.inception_features with Const weights."""
    import tensorflow as tf

    g = tf.Graph()
    with g.as_default():
        inp = tf.compat.v1.placeholder(
            tf.float32, [None, 299, 299, 3], name="Mul")

        def cbr(x, scope, stride=1, padding="SAME"):
            w = tf.constant(params[f"{scope}/conv2d_params"],
                            name=f"{scope}/conv2d_params")
            x = tf.nn.conv2d(x, w, strides=[1, stride, stride, 1],
                             padding=padding)
            bn = {s: tf.constant(params[f"{scope}/batchnorm/{s}"],
                                 name=f"{scope}/batchnorm/{s}")
                  for s in ("beta", "moving_mean", "moving_variance")}
            x = tf.nn.batch_normalization(
                x, bn["moving_mean"], bn["moving_variance"], bn["beta"],
                None, 1e-3)
            return tf.nn.relu(x)

        maxp = lambda x: tf.nn.max_pool2d(x, 3, 2, "VALID")  # noqa: E731
        avgp = lambda x: tf.nn.avg_pool2d(x, 3, 1, "SAME")   # noqa: E731

        def block_a(x, s):
            b0 = cbr(x, f"{s}/conv")
            b1 = cbr(cbr(x, f"{s}/tower/conv"), f"{s}/tower/conv_1")
            b2 = cbr(cbr(cbr(x, f"{s}/tower_1/conv"),
                         f"{s}/tower_1/conv_1"), f"{s}/tower_1/conv_2")
            b3 = cbr(avgp(x), f"{s}/tower_2/conv")
            return tf.concat([b0, b1, b2, b3], 3)

        def block_b(x, s):
            b0 = cbr(x, f"{s}/conv")
            b1 = cbr(cbr(cbr(x, f"{s}/tower/conv"), f"{s}/tower/conv_1"),
                     f"{s}/tower/conv_2")
            b2 = x
            for i in ["", "_1", "_2", "_3", "_4"]:
                b2 = cbr(b2, f"{s}/tower_1/conv{i}")
            b3 = cbr(avgp(x), f"{s}/tower_2/conv")
            return tf.concat([b0, b1, b2, b3], 3)

        def block_c(x, s):
            b0 = cbr(x, f"{s}/conv")
            b1 = cbr(x, f"{s}/tower/conv")
            b1a = cbr(b1, f"{s}/tower/mixed/conv")
            b1b = cbr(b1, f"{s}/tower/mixed/conv_1")
            b2 = cbr(cbr(x, f"{s}/tower_1/conv"), f"{s}/tower_1/conv_1")
            b2a = cbr(b2, f"{s}/tower_1/mixed/conv")
            b2b = cbr(b2, f"{s}/tower_1/mixed/conv_1")
            b3 = cbr(avgp(x), f"{s}/tower_2/conv")
            return tf.concat([b0, b1a, b1b, b2a, b2b, b3], 3)

        x = cbr(inp, "conv", stride=2, padding="VALID")
        x = cbr(x, "conv_1", padding="VALID")
        x = cbr(x, "conv_2", padding="SAME")
        x = maxp(x)
        x = cbr(x, "conv_3", padding="VALID")
        x = cbr(x, "conv_4", padding="VALID")
        x = maxp(x)
        for s in ["mixed", "mixed_1", "mixed_2"]:
            x = block_a(x, s)
        # reduction-A (mixed_3)
        b0 = cbr(x, "mixed_3/conv", stride=2, padding="VALID")
        b1 = cbr(cbr(x, "mixed_3/tower/conv"), "mixed_3/tower/conv_1")
        b1 = cbr(b1, "mixed_3/tower/conv_2", stride=2, padding="VALID")
        x = tf.concat([b0, b1, maxp(x)], 3)
        for s in ["mixed_4", "mixed_5", "mixed_6", "mixed_7"]:
            x = block_b(x, s)
        # reduction-B (mixed_8)
        b0 = cbr(cbr(x, "mixed_8/tower/conv"), "mixed_8/tower/conv_1",
                 stride=2, padding="VALID")
        b1 = x
        for i in ["", "_1", "_2"]:
            b1 = cbr(b1, f"mixed_8/tower_1/conv{i}")
        b1 = cbr(b1, "mixed_8/tower_1/conv_3", stride=2, padding="VALID")
        x = tf.concat([b0, b1, maxp(x)], 3)
        x = block_c(x, "mixed_9")
        x = block_c(x, "mixed_10")

        pool = tf.reduce_mean(x, axis=[1, 2])
        pool = tf.identity(pool, name="pool_3")
        w = tf.constant(params["softmax/weights"], name="softmax/weights")
        b = tf.constant(params["softmax/biases"], name="softmax/biases")
        tf.identity(tf.matmul(pool, w) + b, name="logits")
    return g.as_graph_def()


def test_convert_frozen_graph_roundtrip_and_feature_parity(tmp_path):
    tf = pytest.importorskip("tensorflow")
    del tf
    params = {k: np.asarray(v) for k, v in
              inception_net.init_random(jax.random.PRNGKey(2)).items()}
    graph_def = _build_tf_graphdef(params)
    pb = tmp_path / "inception_synthetic.pb"
    pb.write_bytes(graph_def.SerializeToString())

    npz = str(tmp_path / "weights.npz")
    inception_net.convert_frozen_graph(str(pb), npz)
    with np.load(npz) as data:
        assert set(data.files) == set(params)
        for k in params:
            np.testing.assert_array_equal(data[k], params[k])

    # Same uint8-range images through both backends: the TF session on the
    # frozen graph (the reference's exact execution path, incl. the
    # preprocess resize) and the JAX network from the converted npz.
    imgs = (np.random.RandomState(0).rand(2, 64, 64, 3) * 255).astype(
        np.float32)
    pj, lj = eval_utils._jax_inception_fn(npz)(imgs)
    pt, lt = eval_utils._tf_frozen_graph_fn(str(pb))(imgs)
    assert pj.shape == pt.shape == (2, 2048)
    np.testing.assert_allclose(pj, pt, rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(lj, lt, rtol=1e-3, atol=5e-3)


def test_init_random_name_audit():
    """Freeze the converter's expected variable inventory: 378 tensors
    whose names follow the frozen graph's op naming. A drift in
    init_random / inception_features shows up as a changed digest."""
    import hashlib
    params = inception_net.init_random(jax.random.PRNGKey(0))
    names = sorted(params)
    digest = hashlib.sha256("\n".join(names).encode()).hexdigest()
    assert len(names) == EXPECTED_NUM_TENSORS, len(names)
    assert digest == EXPECTED_NAME_DIGEST, digest
    for probe in ["conv/conv2d_params", "mixed_10/tower_1/mixed/conv_1/"
                  "batchnorm/moving_variance", "softmax/weights"]:
        assert probe in params


EXPECTED_NUM_TENSORS = 378
EXPECTED_NAME_DIGEST = (
    "51c1f54f1a20d874db59c7dacee2a7d15c7092416700bc096d974550e7ee6758")
