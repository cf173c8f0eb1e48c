"""Measure whether the rot90 pretext task is learnable on a dataset.

The S3GAN/SSGAN self-supervision asks a head to predict which of 4
rotations was applied to an image (reference gans/ssgan.py:147-168).
That task is only learnable if the data distribution is NOT invariant
to 90-degree rotations. `convex_polygons*` draws each polygon's
orientation uniformly over the full circle (polygons.py:48), so its
image distribution is rot90-invariant BY CONSTRUCTION and no classifier
can beat 0.25 test accuracy; the `*_oriented` variants add a vertical
shading ramp (polygons.py:130-143) that makes the same task trivial.

This probe trains a small standalone CNN (independent of the GAN
discriminator) on the 4-way rotation task and reports train/test
accuracy per dataset — the dataset-level evidence behind the S3GAN
late-training-degradation diagnosis (docs/convergence_s3gan/README.md):
a weight-1.0 rotation CE on an unlearnable pretext feeds
constant-magnitude noise gradients into D's trunk for the entire run.

Usage:
  COMPARE_GAN_DATA_DIR=... python tools/rotation_probe.py \
      --datasets convex_polygons_partial convex_polygons_partial_oriented \
      [--n_train=4096] [--steps=400] [--out=/tmp/probe.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_rotation_task(images: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All 4 rot90 copies of every image, labeled by k (balanced 4-way)."""
    xs = np.concatenate([np.rot90(images, k, axes=(1, 2)) for k in range(4)])
    ys = np.repeat(np.arange(4), images.shape[0])
    return xs.astype(np.float32) / 255.0, ys.astype(np.int32)


def _init_cnn(rng: np.random.RandomState, channels: int):
    def glorot(*shape):
        fan_in = int(np.prod(shape[:-1]))
        fan_out = int(shape[-1])
        lim = np.sqrt(6.0 / (fan_in + fan_out))
        return rng.uniform(-lim, lim, size=shape).astype(np.float32)

    return {
        "conv1": glorot(3, 3, channels, 16), "b1": np.zeros(16, np.float32),
        "conv2": glorot(3, 3, 16, 32), "b2": np.zeros(32, np.float32),
        "fc": glorot(32, 4), "bfc": np.zeros(4, np.float32),
    }


def probe_dataset(dataset: str, n_train: int = 4096, n_test: int = 1024,
                  steps: int = 400, batch_size: int = 256, seed: int = 0):
    """Train the probe CNN on `dataset`'s train split; eval on its test split."""
    import jax
    import jax.numpy as jnp
    import optax

    data_dir = os.environ["COMPARE_GAN_DATA_DIR"]
    with np.load(os.path.join(data_dir, dataset, "train.npz")) as z:
        train_images = z["images"][:n_train]
    with np.load(os.path.join(data_dir, dataset, "test.npz")) as z:
        test_images = z["images"][:n_test]

    rng = np.random.RandomState(seed)
    train_x, train_y = make_rotation_task(train_images)
    test_x, test_y = make_rotation_task(test_images)
    perm = rng.permutation(train_x.shape[0])
    train_x, train_y = train_x[perm], train_y[perm]

    params = {k: jnp.asarray(v)
              for k, v in _init_cnn(rng, train_x.shape[-1]).items()}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def logits_fn(params, x):
        h = jax.lax.conv_general_dilated(
            x, params["conv1"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + params["b1"]
        h = jax.nn.relu(h)
        h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        h = jax.lax.conv_general_dilated(
            h, params["conv2"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + params["b2"]
        h = jax.nn.relu(h)
        h = jnp.mean(h, axis=(1, 2))
        return h @ params["fc"] + params["bfc"]

    @jax.jit
    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            logits = logits_fn(p, x)
            return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                logits, y))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def accuracy(params, x, y):
        return jnp.mean(jnp.argmax(logits_fn(params, x), -1) == y)

    n = train_x.shape[0]
    # A probe dataset smaller than the batch would make the sliding-
    # window divisor non-positive (negative `lo`, mis-sized slices) —
    # train on full-dataset batches instead.
    batch_size = min(batch_size, n)
    for step in range(steps):
        lo = (step * batch_size) % (n - batch_size + 1)
        params, opt_state, _ = train_step(
            params, opt_state, train_x[lo:lo + batch_size],
            train_y[lo:lo + batch_size])

    def batched_acc(x, y):
        accs = [float(accuracy(params, x[i:i + 512], y[i:i + 512]))
                for i in range(0, x.shape[0], 512)]
        return float(np.mean(accs))

    return {
        "dataset": dataset,
        "n_train_images": int(train_images.shape[0]),
        "steps": steps,
        "train_accuracy": batched_acc(train_x[:4096], train_y[:4096]),
        "test_accuracy": batched_acc(test_x, test_y),
        "chance": 0.25,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--datasets", nargs="+", required=True)
    parser.add_argument("--n_train", type=int, default=4096)
    parser.add_argument("--n_test", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=400)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    results = [probe_dataset(d, args.n_train, args.n_test, args.steps)
               for d in args.datasets]
    line = json.dumps(results)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
