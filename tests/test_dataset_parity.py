"""Transform parity vs the reference's TF ops (r1 VERDICT Missing #1-#5).

TensorFlow is used here as the test ORACLE only (the reference pipeline is
built on these exact ops — compare_gan/datasets.py:387-497); the
framework's own host pipeline stays TF-free in the compute path.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from compare_gan_tpu import config as gin
from compare_gan_tpu import datasets


def _rand_img(h, w, c=3, seed=0):
    return np.random.RandomState(seed).rand(h, w, c).astype(np.float32)


@pytest.mark.parametrize("shape,size", [
    ((200, 180), (64, 64)),    # downscale
    ((37, 53), (128, 128)),    # upscale
    ((100, 100), (64, 64)),    # square downscale
])
def test_bilinear_resize_matches_tf1_resize_images(shape, size):
    """_resize(bilinear) == tf.image.resize_images default (the resize the
    reference applies after every crop, datasets.py:474-476)."""
    img = _rand_img(*shape)
    ours = datasets._resize(img, size)
    ref = tf.compat.v1.image.resize_images(
        tf.constant(img), list(size)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_bilinear_numpy_fallback_matches_native():
    img = _rand_img(120, 90)
    np_out = datasets._resize_bilinear_np(img, (64, 64))
    ref = tf.compat.v1.image.resize_images(tf.constant(img), [64, 64]).numpy()
    np.testing.assert_allclose(np_out, ref, atol=1e-5)
    from compare_gan_tpu import native
    if native.available():
        np.testing.assert_allclose(
            native.resize_bilinear(img, (64, 64)), np_out, atol=1e-5)


@pytest.mark.parametrize("shape,target", [
    ((218, 178), (160, 160)),  # crop both (CelebA)
    ((100, 100), (128, 128)),  # pad both
    ((100, 240), (128, 128)),  # pad h, crop w (LSUN-style)
    ((240, 100), (128, 128)),  # crop h, pad w
])
def test_crop_or_pad_matches_tf(shape, target):
    """_crop_or_pad == tf.image.resize_image_with_crop_or_pad (reference
    CelebA datasets.py:390-392, LSUN datasets.py:422-424)."""
    img = _rand_img(*shape)
    ours = datasets._crop_or_pad(img, *target)
    ref = tf.image.resize_with_crop_or_pad(
        tf.constant(img), target[0], target[1]).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_celeba_transform_matches_reference_ops():
    """crop_or_pad(160) -> bilinear resize(64), label 0 (reference
    CelebaDataset._parse_fn, datasets.py:387-396)."""
    img = _rand_img(218, 178)
    ours, label = datasets.transform_celeba(
        img, 7, 1, np.random.default_rng(0))
    x = tf.image.resize_with_crop_or_pad(tf.constant(img), 160, 160)
    ref = tf.compat.v1.image.resize_images(x, [64, 64]).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    assert label == 0


def test_lsun_transform_matches_reference_ops():
    """crop_or_pad(128), NO resize, label 0 (reference
    LsunBedroomDataset._parse_fn, datasets.py:420-427)."""
    img = _rand_img(100, 240)
    ours, label = datasets.transform_crop_or_pad(
        img, 3, 1, np.random.default_rng(0), size=128)
    ref = tf.image.resize_with_crop_or_pad(tf.constant(img), 128, 128).numpy()
    np.testing.assert_array_equal(ours, ref)
    assert label == 0


def test_middle_crop_matches_reference_ops():
    """Center square crop + bilinear resize (reference `middle` crop,
    datasets.py:464-476)."""
    img = _rand_img(150, 100)
    ours, _ = datasets.transform_middle_crop(
        img, 0, 1, np.random.default_rng(0), size=64)
    h, w = img.shape[:2]
    s = min(h, w)
    begin = [int((h - s) / 2.0), int((w - s) / 2.0)]
    crop = img[begin[0]:begin[0] + s, begin[1]:begin[1] + s]
    ref = tf.compat.v1.image.resize_images(tf.constant(crop), [64, 64]).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def _identity_resize(im, size, crop=None):
    if crop is not None:
        top, left, ch, cw = crop
        return im[top:top + ch, left:left + cw]
    return im


def test_distorted_crop_distribution(monkeypatch):
    """Square crops (aspect_ratio_range [1,1]) covering 50-100% of the
    image area with varying offsets (reference datasets.py:444-452)."""
    monkeypatch.setattr(datasets, "_resize", _identity_resize)
    rng = np.random.default_rng(0)
    img = _rand_img(100, 150)
    sides, tops = [], []
    for _ in range(200):
        crop, _ = datasets.transform_distorted_crop(img, 0, 1, rng, size=64)
        h, w = crop.shape[:2]
        assert h == w, "aspect_ratio_range [1,1] must give square crops"
        frac = h * w / (100.0 * 150.0)
        assert 0.5 - 0.02 <= frac <= 1.0, frac
        sides.append(h)
    assert len(set(sides)) > 3, "crop size must vary"


def test_distorted_crop_whole_image_fallback(monkeypatch):
    """No valid square crop with >=50% area on a 10x300 strip ->
    use_image_if_no_bounding_boxes semantics: the WHOLE image."""
    monkeypatch.setattr(datasets, "_resize", _identity_resize)
    img = _rand_img(10, 300)
    crop, _ = datasets.transform_distorted_crop(
        img, 0, 1, np.random.default_rng(0), size=64)
    assert crop.shape == img.shape
    np.testing.assert_array_equal(crop, img)


def test_crop_method_gin_binding():
    """train_imagenet_transform.crop_method is a live gin knob (reference
    datasets.py:479-487 whitelists it)."""
    gin.parse_config('train_imagenet_transform.crop_method = "middle"')
    img = _rand_img(100, 150)
    out, _ = datasets.train_imagenet_transform(
        img, 0, 1, np.random.default_rng(0), size=64)
    exp, _ = datasets.transform_middle_crop(
        img, 0, 1, np.random.default_rng(0), size=64)
    np.testing.assert_array_equal(out, exp)


def test_eval_imagenet_transform_default_is_middle():
    img = _rand_img(100, 150)
    out, _ = datasets.eval_imagenet_transform(
        img, 0, 1, np.random.default_rng(0), size=64)
    exp, _ = datasets.transform_middle_crop(
        img, 0, 1, np.random.default_rng(0), size=64)
    np.testing.assert_array_equal(out, exp)


def test_fused_crop_resize_matches_slice_then_resize():
    """native crop_resize_bilinear == slice + resize_bilinear, and the
    middle-crop transform (which uses the fused path) == TF oracle."""
    from compare_gan_tpu import native
    img = _rand_img(150, 100)
    ours = datasets._resize(img, (64, 64), crop=(25, 0, 100, 100))
    ref = tf.compat.v1.image.resize_images(
        tf.constant(img[25:125, 0:100]), [64, 64]).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    if native.available():
        fused = native.crop_resize_bilinear(img, 25, 0, 100, 100, (64, 64))
        np.testing.assert_allclose(fused, ref, atol=1e-5)


def test_area_resize_optin_via_gin():
    gin.parse_config('image_resize.method = "area"')
    img = _rand_img(128, 128)
    out = datasets._resize(img, (64, 64))
    exp = datasets._resize_area(img, (64, 64))
    np.testing.assert_allclose(out, exp, atol=1e-6)


# ---------------------------------------------------------------------------
# Registry-level semantics on real (synthetic .npz) data
# ---------------------------------------------------------------------------


def _write_npz(dirpath, split, n, seed, labels=None):
    os.makedirs(dirpath, exist_ok=True)
    rs = np.random.RandomState(seed)
    images = (rs.rand(n, 8, 8, 3) * 255).astype(np.uint8)
    if labels is None:
        labels = rs.randint(0, 10, n)
    np.savez(os.path.join(dirpath, f"{split}.npz"),
             images=images, labels=np.asarray(labels))


def test_labeled_only_imagenet_filters_negative_labels(tmp_path, monkeypatch):
    """labeled_only_imagenet_128 trains only on label >= 0 (reference
    filter_unlabeled, datasets.py:516-522,645-646)."""
    monkeypatch.setattr(datasets, "DATA_DIR", str(tmp_path))
    labels = np.array(([-1, 0, 1, -1, 2, 3, -1, 4] * 4))
    _write_npz(tmp_path / "imagenet2012", "train", len(labels), 0, labels)
    ds = datasets.get_dataset("labeled_only_imagenet_128")
    batch = next(ds.train_input_fn(8, prefetch=0))
    assert np.all(batch["labels"] >= 0)


def test_plain_imagenet_does_not_filter(tmp_path, monkeypatch):
    monkeypatch.setattr(datasets, "DATA_DIR", str(tmp_path))
    labels = -np.ones(16, np.int64)
    _write_npz(tmp_path / "imagenet2012", "train", 16, 0, labels)
    ds = datasets.get_dataset("imagenet_128")
    batch = next(ds.train_input_fn(8, prefetch=0))
    assert np.all(batch["labels"] == -1)


def test_imagenet_eval_split_is_validation(tmp_path, monkeypatch):
    """ImageNet evaluates on VALIDATION (reference datasets.py:514); a
    train-only directory must hard-error, never silently use train."""
    monkeypatch.setattr(datasets, "DATA_DIR", str(tmp_path))
    d = tmp_path / "imagenet2012"
    _write_npz(d, "train", 16, 0)
    with pytest.raises(FileNotFoundError, match="eval split"):
        datasets.get_dataset("imagenet_128").eval_input_fn(4)
    _write_npz(d, "validation", 16, 1)
    batch = next(datasets.get_dataset("imagenet_128").eval_input_fn(
        4, prefetch=0))
    with np.load(d / "validation.npz") as val:
        first = val["images"][0].astype(np.float32) / 255.0
    exp, _ = datasets.eval_imagenet_transform(
        first, 0, 547, np.random.default_rng(0), size=128)
    np.testing.assert_allclose(batch["images"][0], exp, atol=1e-6)


def test_generic_eval_falls_back_to_validation_not_train(
        tmp_path, monkeypatch):
    monkeypatch.setattr(datasets, "DATA_DIR", str(tmp_path))
    d = tmp_path / "cifar10"
    _write_npz(d, "train", 16, 0)
    _write_npz(d, "validation", 16, 1)
    batch = next(datasets.get_dataset("cifar10").eval_input_fn(4, prefetch=0))
    with np.load(d / "validation.npz") as val:
        first = val["images"][0].astype(np.float32) / 255.0
    exp = datasets._resize(first, (32, 32))
    np.testing.assert_allclose(batch["images"][0], exp, atol=1e-6)


def test_resume_skip_counts_post_filter_examples(tmp_path, monkeypatch):
    """skip_batches fast-forward must count yielded (post-filter) examples
    (r1 ADVICE datasets.py:399): resumed stream == unbroken stream with the
    first k batches dropped, on a filtered dataset."""
    monkeypatch.setattr(datasets, "DATA_DIR", str(tmp_path))
    labels = np.arange(64) % 5 - 1  # every 5th label is -1 -> filtered
    _write_npz(tmp_path / "imagenet2012", "train", 64, 0, labels)
    ds = datasets.get_dataset("labeled_only_imagenet_128")
    full = [b for _, b in zip(range(6), ds.train_input_fn(4, prefetch=0))]
    ds2 = datasets.get_dataset("labeled_only_imagenet_128")
    resumed = [b for _, b in zip(
        range(4), ds2.train_input_fn(4, prefetch=0, skip_batches=2))]
    for a, b in zip(full[2:], resumed):
        np.testing.assert_array_equal(a["images"], b["images"])
        np.testing.assert_array_equal(a["labels"], b["labels"])


def test_fake_source_stable_across_hash_seeds():
    """Fake-data pixel content must not depend on Python's per-process
    string-hash salt (r1 ADVICE datasets.py:76)."""
    code = ("from compare_gan_tpu import datasets; import numpy as np; "
            "datasets.set_fake_dataset(True); "
            "b = next(datasets.get_dataset('cifar10').train_input_fn("
            "4, prefetch=0)); "
            "print('SUM', repr(float(np.float64(b['images']).sum())))")
    outs = []
    for salt in ("1", "2"):
        env = dict(os.environ, PYTHONHASHSEED=salt)
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, cwd="/root/repo",
                           timeout=120)
        lines = [ln for ln in r.stdout.splitlines() if ln.startswith("SUM")]
        assert lines, r.stderr[-2000:]
        outs.append(lines[-1])
    assert outs[0] == outs[1]
