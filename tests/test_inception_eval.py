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
