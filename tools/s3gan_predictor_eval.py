"""Held-out predictor accuracy for S3GAN checkpoints.

The S3GAN convergence predicate (reference gans/s3gan.py:137-158,
"High-Fidelity Image Generation With Fewer Labels") is that D's label
PREDICTOR head — trained only on the labeled fraction of train examples
— learns to impute labels. Training summaries only show
`class_loss_real` on that labeled fraction; this tool measures the
head's accuracy on a fully-labeled HELD-OUT split per checkpoint, the
direct evidence that imputation generalizes rather than memorizes.

Usage (after an s3gan32_polygons_partial.gin run):
    python tools/s3gan_predictor_eval.py \
        --model_dir /tmp/s3gan_poly \
        --gin_config example_configs/s3gan32_polygons_partial.gin \
        --out_csv docs/convergence_s3gan/predictor_accuracy.csv
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from compare_gan_tpu import checkpoint as ckpt_lib  # noqa: E402
from compare_gan_tpu import config as gin  # noqa: E402
from compare_gan_tpu import core  # noqa: E402
from compare_gan_tpu import datasets  # noqa: E402
from compare_gan_tpu import runner_lib  # noqa: E402
import compare_gan_tpu.gans  # noqa: F401,E402


def load_labeled_split(dataset, split, num_examples):
    """(images [N,H,W,C] in [0,1], labels [N] int) from an eval split,
    unshuffled — every example in the partial dataset's test/holdout
    splits carries its true label."""
    images, labels = [], []
    it = dataset._iter_examples(split, shuffle=False, repeat=False,
                                transform=dataset._eval_transform,
                                seed=dataset._seed, shard_by_host=False)
    for image, label in it:
        images.append(image)
        labels.append(int(label))
        if len(images) >= num_examples:
            it.close()
            break
    return np.stack(images).astype(np.float32), np.asarray(labels, np.int64)


def predictor_accuracy(gan, ts, images, labels, batch_size=64):
    """Accuracy of argmax over D's predictor head (aux_logits) against the
    true labels. y enters as all-zero rows — the "no label" contract — so
    the head sees held-out examples exactly as it sees unlabeled train
    examples."""
    num_classes = gan.dataset.num_classes

    # Params as jit ARGUMENTS, never closed over (axon >50 MB HLO limit).
    @jax.jit
    def _aux(params, state, x):
        def fwd():
            y = np.zeros((x.shape[0], num_classes), np.float32)
            outs = gan.discriminator_with_additonal_heads(
                x=x, y=y, is_training=False)
            return outs[3]
        out, _ = core.apply(fwd, params, state)
        return out

    correct = total = 0
    n_batches = len(images) // batch_size
    for i in range(n_batches):
        sl = slice(i * batch_size, (i + 1) * batch_size)
        aux = np.asarray(_aux(ts.params, ts.state, images[sl]))
        pred = np.argmax(aux, axis=1)
        correct += int((pred == labels[sl]).sum())
        total += batch_size
    return correct / max(total, 1)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_dir", required=True)
    p.add_argument("--gin_config", required=True, nargs="+")
    p.add_argument("--split", default="test")
    p.add_argument("--num_examples", type=int, default=2048)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--out_csv", default=None)
    args = p.parse_args(argv)

    gin.parse_config_files_and_bindings(args.gin_config, [])
    options = runner_lib.get_options_dict()
    dataset = datasets.get_dataset()
    gan = options["gan_class"](dataset=dataset, parameters=options,
                               model_dir=args.model_dir)
    if not hasattr(gan, "discriminator_with_additonal_heads") or \
            not getattr(gan, "_use_predictor", False):
        raise SystemExit("Model has no predictor head "
                         "(need S3GAN.use_predictor=True).")

    images, labels = load_labeled_split(dataset, args.split,
                                        args.num_examples)
    if (labels < 0).any():
        raise SystemExit(f"Split {args.split} has unlabeled examples; "
                         "held-out accuracy needs true labels.")
    template = gan.init_state(jax.random.PRNGKey(0), args.batch_size)

    rows = []
    for path in ckpt_lib.all_checkpoints(args.model_dir):
        ts = ckpt_lib.restore_checkpoint(path, template)
        acc = predictor_accuracy(gan, ts, images, labels, args.batch_size)
        step = ckpt_lib.step_of(path)
        rows.append({"step": step, "predictor_accuracy": f"{acc:.4f}",
                     "split": args.split, "num_examples": len(labels),
                     "chance": f"{1.0 / dataset.num_classes:.4f}"})
        print(f"step {step}: held-out predictor accuracy {acc:.4f} "
              f"(chance {1.0 / dataset.num_classes:.3f})")

    out_csv = args.out_csv or os.path.join(args.model_dir,
                                           "predictor_accuracy.csv")
    os.makedirs(os.path.dirname(os.path.abspath(out_csv)), exist_ok=True)
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()) if rows
                           else ["step", "predictor_accuracy"])
        w.writeheader()
        w.writerows(rows)
    print(f"Wrote {out_csv}")


if __name__ == "__main__":
    main()
