"""tools/rotation_probe.py: the rot90-pretext learnability probe that
backs the S3GAN diagnosis (docs/convergence_s3gan/README.md) — a
rotation-invariant image distribution caps the probe at chance, an
orientation cue makes it near-perfect."""

import os

import numpy as np
import pytest

from tools import rotation_probe


def _write_split(root, split, images):
    np.savez(os.path.join(root, f"{split}.npz"),
             images=images, labels=np.zeros(len(images), np.int64))


def _make_dataset(tmp_path, name, images_fn, n_train=256, n_test=128):
    root = os.path.join(tmp_path, name)
    os.makedirs(root)
    rng = np.random.RandomState(0)
    _write_split(root, "train", images_fn(rng, n_train))
    _write_split(root, "test", images_fn(rng, n_test))


def _invariant_images(rng, n):
    # Uniform noise is exactly rot90-invariant in distribution.
    return rng.randint(0, 256, (n, 8, 8, 1), np.uint8)


def _oriented_images(rng, n):
    # Vertical intensity ramp + noise: rotation is trivially decodable
    # (the cue the *_oriented polygon writers add, polygons.py:130-143).
    ramp = np.linspace(0, 200, 8, dtype=np.float32)[None, :, None, None]
    noise = rng.randint(0, 56, (n, 8, 8, 1)).astype(np.float32)
    return np.clip(ramp + noise, 0, 255).astype(np.uint8)


def test_make_rotation_task_balanced_and_consistent():
    images = np.arange(2 * 4 * 4 * 1, dtype=np.uint8).reshape(2, 4, 4, 1)
    xs, ys = rotation_probe.make_rotation_task(images)
    assert xs.shape == (8, 4, 4, 1) and ys.shape == (8,)
    assert np.bincount(ys, minlength=4).tolist() == [2, 2, 2, 2]
    # k=0 copies are the originals; k=2 is a 180-degree flip.
    np.testing.assert_allclose(xs[:2], images.astype(np.float32) / 255.0)
    np.testing.assert_allclose(
        xs[4:6], np.rot90(images, 2, axes=(1, 2)).astype(np.float32) / 255.0)


def test_probe_separates_invariant_from_oriented(tmp_path, monkeypatch):
    _make_dataset(tmp_path, "inv", _invariant_images)
    _make_dataset(tmp_path, "ori", _oriented_images)
    monkeypatch.setenv("COMPARE_GAN_DATA_DIR", str(tmp_path))

    inv = rotation_probe.probe_dataset("inv", n_train=256, n_test=128,
                                       steps=120, batch_size=128)
    ori = rotation_probe.probe_dataset("ori", n_train=256, n_test=128,
                                       steps=120, batch_size=128)
    # Rot90-invariant distribution: test accuracy pinned near chance.
    assert abs(inv["test_accuracy"] - 0.25) < 0.08, inv
    # Orientation cue: near-perfect.
    assert ori["test_accuracy"] > 0.95, ori
