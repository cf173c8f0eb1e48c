"""Shared test fixtures (the reference's test_utils.py equivalents)."""

import numpy as np


def fake_inception(images):
    """Deterministic stand-in feature extractor: random-projection pool
    features and logits with the real tensor contract (the reference
    mocks the Inception graph the same way, test_utils.py:37-55)."""
    flat = images.reshape(len(images), -1).astype(np.float64) / 255.0
    rng = np.random.RandomState(0)
    pool = flat @ rng.randn(flat.shape[1], 16)
    logits = flat @ rng.randn(flat.shape[1], 10)
    return pool, logits


def write_tfds_fixture(data_dir, tfds_name="cifar10", resolution=32,
                       colors=3, num_classes=10,
                       split_shards=(("train", 10, 2), ("test", 6, 1)),
                       seed=0, with_file_name=True):
    """Emit a mini dataset byte-compatible with `tfds build` output:
    shard naming `<name>-<split>.tfrecord-00000-of-0000N`, tf.train
    .Example records with `image/encoded` (PNG) + `label` + `file_name`
    features, written through tf.io.TFRecordWriter (real CRC framing).

    Returns {split: (file_names, labels, images_uint8)} in record order.
    """
    import os
    import tensorflow as tf

    out_dir = os.path.join(str(data_dir), tfds_name)
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    result = {}
    for split, n, num_shards in split_shards:
        images = rng.randint(0, 255, (n, resolution, resolution, colors),
                             dtype=np.uint8)
        labels = rng.randint(0, num_classes, n).astype(np.int64)
        file_names = [f"{tfds_name}_{split}_{i:05d}.png" for i in range(n)]
        writers = [
            tf.io.TFRecordWriter(os.path.join(
                out_dir,
                f"{tfds_name}-{split}.tfrecord-{s:05d}-of-{num_shards:05d}"))
            for s in range(num_shards)]
        for i in range(n):
            feats = {
                "image/encoded": tf.train.Feature(
                    bytes_list=tf.train.BytesList(
                        value=[tf.io.encode_png(images[i]).numpy()])),
                "label": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[labels[i]])),
            }
            if with_file_name:
                feats["file_name"] = tf.train.Feature(
                    bytes_list=tf.train.BytesList(
                        value=[file_names[i].encode()]))
            ex = tf.train.Example(
                features=tf.train.Features(feature=feats))
            # Round-robin like tfds sharding; record order across sorted
            # shards must equal dataset order, so use contiguous blocks.
            writers[i * num_shards // n].write(ex.SerializeToString())
        for w in writers:
            w.close()
        result[split] = (file_names, labels, images)
    return result


def write_label_sidecar(path, file_names, labels):
    """Sidecar TFRecords for replace_labels: `file_name` + `label`
    (int64 hard labels, or float logits lists for soft labels) —
    the reference's label-replacement input (datasets.py:174-223)."""
    import tensorflow as tf

    with tf.io.TFRecordWriter(str(path)) as w:
        for name, label in zip(file_names, labels):
            if np.ndim(label) == 0:
                label_feat = tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[int(label)]))
            else:
                label_feat = tf.train.Feature(
                    float_list=tf.train.FloatList(
                        value=np.asarray(label, np.float32)))
            ex = tf.train.Example(features=tf.train.Features(feature={
                "file_name": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=[name.encode()])),
                "label": label_feat,
            }))
            w.write(ex.SerializeToString())
