"""tools/fid_anchors.py: real-vs-real / real-vs-noise FID scale anchors
for the convergence-proof datasets (noise floor and "maximally wrong"
scale with the same extractor the evals use)."""

import os

import numpy as np
import pytest

from compare_gan_tpu import eval_utils
from tests.helpers import fake_inception
from tools import fid_anchors


@pytest.fixture(autouse=True)
def _fake_inception():
    eval_utils.set_inception_fn(fake_inception)
    yield
    eval_utils.set_inception_fn(None)


def _write_split(root, split, images):
    np.savez(os.path.join(root, f"{split}.npz"),
             images=images, labels=np.zeros(len(images), np.int64))


def test_anchor_ordering_and_floor(tmp_path, monkeypatch):
    # Two draws of the same distribution vs uniform noise: the
    # real-vs-real anchor must sit far below real-vs-noise.
    rng = np.random.RandomState(0)
    root = os.path.join(tmp_path, "toy")
    os.makedirs(root)
    base = (rng.uniform(size=(64, 8, 8, 1)) < 0.15).astype(np.uint8) * 255
    _write_split(root, "test", base)
    shuffled = base[rng.permutation(len(base))]
    _write_split(root, "holdout", shuffled)
    monkeypatch.setenv("COMPARE_GAN_DATA_DIR", str(tmp_path))

    anchors = fid_anchors.compute_anchors("toy", max_per_split=64)
    assert anchors["num_per_split"] == 64
    assert 0.0 <= anchors["real_vs_real"] < 1e-3  # same images, reordered
    assert anchors["real_vs_noise"] > 10 * (anchors["real_vs_real"] + 1e-6)
    assert np.isfinite(anchors["real_vs_noise"])


def test_grayscale_tiling_and_truncation(tmp_path, monkeypatch):
    rng = np.random.RandomState(1)
    root = os.path.join(tmp_path, "toy2")
    os.makedirs(root)
    _write_split(root, "test", rng.randint(0, 256, (32, 8, 8, 1), np.uint8))
    _write_split(root, "holdout",
                 rng.randint(0, 256, (32, 8, 8, 1), np.uint8))
    monkeypatch.setenv("COMPARE_GAN_DATA_DIR", str(tmp_path))
    anchors = fid_anchors.compute_anchors("toy2", max_per_split=16)
    assert anchors["num_per_split"] == 16
    assert anchors["real_vs_real"] >= 0.0
