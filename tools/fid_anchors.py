"""Scale anchors for the FID proxy on an npz polygon dataset.

Computes, with the SAME feature extractor the convergence-proof evals
use ($COMPARE_GAN_INCEPTION_NPZ, eval_utils.get_inception_fn):
  * real-vs-real  — FID between the disjoint test and holdout splits
    (the noise floor of the metric at this sample size), and
  * real-vs-noise — FID between the test split and uniform [0,255]
    noise of the same shape (the "maximally wrong" scale anchor).
Every trained-model FID proxy in docs/convergence_*/ is read against
these two numbers (reference protocol: eval_utils.py:178-206 features,
fid_score FID; see README "Does it train?").

Usage:
  COMPARE_GAN_DATA_DIR=... COMPARE_GAN_INCEPTION_NPZ=... \
    python tools/fid_anchors.py --dataset=convex_polygons_multiclass_128 \
      [--max_per_split=4000] [--out=/tmp/anchors.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _load_split(data_dir, dataset, split, max_n):
    with np.load(os.path.join(data_dir, dataset, f"{split}.npz")) as z:
        images = z["images"][:max_n]
    images = images.astype(np.float32)  # uint8 storage -> [0,255] floats
    if images.shape[-1] == 1:
        images = np.tile(images, (1, 1, 1, 3))
    return images


def compute_anchors(dataset, max_per_split=4000, seed=0):
    from compare_gan_tpu import eval_utils
    from compare_gan_tpu.metrics import fid_score

    data_dir = os.environ["COMPARE_GAN_DATA_DIR"]
    test = _load_split(data_dir, dataset, "test", max_per_split)
    holdout = _load_split(data_dir, dataset, "holdout", max_per_split)
    noise = np.random.RandomState(seed).uniform(
        0.0, 255.0, size=test.shape).astype(np.float32)

    acts = {}
    for name, images in (("test", test), ("holdout", holdout),
                         ("noise", noise)):
        pools, _ = eval_utils.inception_transform_np(images)
        acts[name] = pools

    return {
        "dataset": dataset,
        "num_per_split": int(test.shape[0]),
        "real_vs_real": float(fid_score.compute_fid_from_activations(
            acts["test"], acts["holdout"])),
        "real_vs_noise": float(fid_score.compute_fid_from_activations(
            acts["noise"], acts["test"])),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--max_per_split", type=int, default=4000)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()
    anchors = compute_anchors(args.dataset, args.max_per_split)
    line = json.dumps(anchors)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
