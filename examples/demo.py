"""Sampling / interpolation / discriminator demo on an exported module.

The TPU-native equivalent of the reference's TF-Hub demo notebooks
(colabs/ssgan_demo.ipynb, colabs/s3gan_demo.ipynb): load an export
directory written by the runner (`<model_dir>/tfhub/<step>`) or by
`export.export_module`, then

  1. sample an image grid,
  2. interpolate between two latent vectors,
  3. run the discriminator on a batch of images.

Usage:
  python examples/demo.py --export_dir /tmp/gan/tfhub/10000 \
      --out_dir /tmp/demo [--num_rows 3] [--num_cols 4] [--noise_seed 23]

Writes samples.png and interpolation.png to --out_dir and prints the
discriminator's predictions.
"""

import os
import sys

from absl import app, flags
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from compare_gan_tpu import export  # noqa: E402
from compare_gan_tpu.utils import misc  # noqa: E402

FLAGS = flags.FLAGS
flags.DEFINE_string("export_dir", None, "Module export directory.")
flags.DEFINE_string("out_dir", "/tmp/compare_gan_demo", "Output directory.")
flags.DEFINE_integer("num_rows", 3, "Sample grid rows.")
flags.DEFINE_integer("num_cols", 4, "Sample grid columns.")
flags.DEFINE_integer("noise_seed", 23, "Latent sampling seed.")
flags.DEFINE_integer("category", None,
                     "Class id for conditional models (default: random).")
flags.DEFINE_boolean("per_class_grid", False,
                     "Conditional models: sample grid uses one row per "
                     "class (num_rows is ignored) so conditioning is "
                     "visually checkable row by row.")
flags.DEFINE_integer("num_interps", 8, "Interpolation steps.")
flags.mark_flag_as_required("export_dir")


def _sample_z(spec, n, seed):
    """Sample z per the export's gin snapshot. The BigGAN recipes bind
    z.distribution_fn = @tf.random.normal — sampling the default
    U(-1, 1) for such a model would be off-distribution. Resolution
    happens inside the snapshot's config scope (export.sample_z), so a
    fresh demo process honors the export rather than its own (empty)
    live gin config."""
    return export.sample_z(spec, n, seed=seed)


def _sample_labels(rng, n, spec):
    if not spec["conditional"]:
        return None
    if FLAGS.category is not None:
        return np.full((n,), FLAGS.category, dtype=np.int32)
    return rng.randint(0, spec["num_classes"], size=(n,)).astype(np.int32)


def main(argv):
    del argv
    misc.enable_persistent_compile_cache()
    misc.check_folder(FLAGS.out_dir)
    rng = np.random.RandomState(FLAGS.noise_seed)

    # load_generator/load_discriminator jit internally with params as
    # arguments — do NOT wrap them in jax.jit here (that would bake the
    # weights into the HLO; see CLAUDE.md's axon >50 MB program gotcha).
    generate, spec = export.load_generator(FLAGS.export_dir)
    print(f"Loaded {spec['architecture']} (step {spec['step']}, "
          f"dataset {spec['dataset']}, conditional={spec['conditional']})")

    # 1. Sample grid (colab "Sampling" cell).
    num_rows = FLAGS.num_rows
    if FLAGS.per_class_grid:
        if not spec["conditional"]:
            raise ValueError("--per_class_grid needs a conditional model.")
        num_rows = spec["num_classes"]
    n = num_rows * FLAGS.num_cols
    z = _sample_z(spec, n, FLAGS.noise_seed)
    if FLAGS.per_class_grid:
        labels = np.repeat(np.arange(num_rows, dtype=np.int32),
                           FLAGS.num_cols)
    else:
        labels = _sample_labels(rng, n, spec)
    images = np.asarray(generate(z) if labels is None else generate(z, labels))
    path = os.path.join(FLAGS.out_dir, "samples.png")
    misc.save_images(misc.image_grid(images, (num_rows, FLAGS.num_cols)),
                     path)
    print(f"Wrote {num_rows}x{FLAGS.num_cols} sample grid to {path}")

    # 2. Interpolation (colab "Interpolation" cell: linear in z, one
    # category held fixed).
    z_ab = _sample_z(spec, 2, FLAGS.noise_seed + 1)
    t = np.linspace(0.0, 1.0, FLAGS.num_interps,
                    dtype=np.float32)[:, None]
    z_interp = (1.0 - t) * z_ab[:1] + t * z_ab[1:]
    labels_interp = None
    if spec["conditional"]:
        label = _sample_labels(rng, 1, spec)
        labels_interp = np.repeat(label, FLAGS.num_interps, axis=0)
    interp = np.asarray(generate(z_interp) if labels_interp is None
                        else generate(z_interp, labels_interp))
    # One row: concatenate along width.
    row = np.concatenate(list(interp), axis=1)
    path = os.path.join(FLAGS.out_dir, "interpolation.png")
    misc.save_images(row, path)
    print(f"Wrote {FLAGS.num_interps}-step interpolation to {path}")

    # 3. Discriminator predictions (colab "Discriminator" cell).
    discriminate, _ = export.load_discriminator(FLAGS.export_dir)
    batch = rng.random_sample((4,) + tuple(spec["image_shape"])).astype(
        np.float32)
    d_labels = _sample_labels(rng, 4, spec)
    preds = discriminate(batch) if d_labels is None else discriminate(
        batch, d_labels)
    # D returns (prediction, logits, features) like the reference's
    # discriminator hub signature.
    print("Discriminator prediction on random images:",
          np.asarray(preds[0]).ravel())


if __name__ == "__main__":
    app.run(main)
