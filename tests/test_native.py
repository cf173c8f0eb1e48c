"""Native C++ data-IO runtime tests (builds libdataio.so with g++ at
import; skipped if no toolchain)."""

import numpy as np
import pytest

from compare_gan_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _write_tfrecord(path, payloads):
    import struct
    with open(path, "wb") as f:
        for p in payloads:
            f.write(struct.pack("<Q", len(p)))
            f.write(b"\x00" * 4)  # length crc (unchecked)
            f.write(p)
            f.write(b"\x00" * 4)  # payload crc


def test_tfrecord_index_and_read(tmp_path):
    path = str(tmp_path / "a.tfrecord")
    payloads = [b"hello", b"x" * 1000, b"world!"]
    _write_tfrecord(path, payloads)
    offsets = native.index_tfrecords(path)
    assert len(offsets) == 3
    for off, expected in zip(offsets, payloads):
        assert native.read_record(path, off) == expected


def test_read_record_distinguishes_io_error_from_small_buffer(tmp_path):
    """Round-2 advisor: a genuine IO error must fail immediately (no
    1MB→8MB→64MB grow-and-retry) and say so; only 'record larger than
    buffer' grows the scratch buffer."""
    # Missing file: immediate IOError mentioning an IO failure.
    with pytest.raises(IOError, match="IO error"):
        native.read_record(str(tmp_path / "nope.tfrecord"), 0)
    # Bad offset past EOF: immediate IOError, not the max_size message.
    path = str(tmp_path / "b.tfrecord")
    _write_tfrecord(path, [b"data"])
    with pytest.raises(IOError, match="IO error"):
        native.read_record(path, 10_000_000)
    # A record bigger than the initial 1MB scratch still reads fine
    # (the grow-on--2 path).
    big = bytes(range(256)) * 8192  # 2 MiB
    path2 = str(tmp_path / "c.tfrecord")
    _write_tfrecord(path2, [big])
    off, = native.index_tfrecords(path2)
    assert native.read_record(path2, off) == big


def test_resize_area_matches_python_reference():
    rng = np.random.RandomState(0)
    img = rng.rand(64, 48, 3).astype(np.float32)
    out = native.resize_area(img, (32, 24))
    assert out.shape == (32, 24, 3)
    # Exact 2x box downsample == mean pooling.
    expected = img.reshape(32, 2, 24, 2, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_resize_area_identity():
    img = np.random.RandomState(1).rand(16, 16, 1).astype(np.float32)
    np.testing.assert_allclose(native.resize_area(img, (16, 16)), img,
                               atol=1e-6)


def test_crop_resize():
    img = np.arange(8 * 8 * 1, dtype=np.float32).reshape(8, 8, 1)
    out = native.crop_resize(img, 2, 2, 4, 4, (2, 2))
    expected = img[2:6, 2:6].reshape(2, 2, 2, 2, 1).mean(axis=(1, 3))
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_u8_to_f32():
    raw = np.array([0, 51, 255], np.uint8)
    np.testing.assert_allclose(native.u8_to_f32(raw),
                               [0.0, 0.2, 1.0], atol=1e-6)


def test_dataset_tfrecord_source_uses_native(tmp_path, monkeypatch):
    """End-to-end: a TFRecord dataset dir parses through the native
    indexer."""
    import tensorflow as tf
    from compare_gan_tpu import datasets

    d = tmp_path / "cifar10"
    d.mkdir()
    rng = np.random.RandomState(0)
    payloads = []
    for i in range(6):
        img = rng.randint(0, 255, (32, 32, 3), np.uint8)
        ex = tf.train.Example(features=tf.train.Features(feature={
            "image": tf.train.Feature(bytes_list=tf.train.BytesList(
                value=[tf.io.encode_png(img).numpy()])),
            "label": tf.train.Feature(int64_list=tf.train.Int64List(
                value=[i % 10])),
        }))
        payloads.append(ex.SerializeToString())
    _write_tfrecord(str(d / "train.tfrecord-00000-of-00001"), payloads)

    monkeypatch.setattr(datasets, "DATA_DIR", str(tmp_path))
    datasets.set_fake_dataset(False)
    ds = datasets.get_dataset("cifar10")
    batch = next(ds.train_input_fn(4))
    assert batch["images"].shape == (4, 32, 32, 3)
    assert batch["images"].max() <= 1.0
