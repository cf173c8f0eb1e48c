"""Import a reference (google/compare_gan) TF checkpoint into this
framework and save it as a native npz checkpoint ready for eval.

Usage:
    python tools/import_tf_checkpoint.py \
        --checkpoint /path/to/model.ckpt-250000 \
        --model_dir /tmp/imported \
        --gin_config example_configs/biggan_imagenet128.gin \
        [--gin_bindings "..."] [--batch_size 8]

`--checkpoint` accepts a TF Saver prefix, a reference model_dir (latest
checkpoint is used), or a TF-Hub module export directory. The gin config
must describe the model the checkpoint was trained with (same
architecture/options the reference run used — reference checkpoints ship
with an operative_config-<step>.gin that translates directly).

Afterwards, evaluate with the standard CLI:
    python -m compare_gan_tpu.main --model_dir /tmp/imported \
        --schedule continuous_eval --gin_config <same config>
"""

import os
import sys

from absl import app, flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from compare_gan_tpu import config as gin  # noqa: E402
from compare_gan_tpu import checkpoint as ckpt_lib  # noqa: E402
from compare_gan_tpu import datasets, export, runner_lib  # noqa: E402
from compare_gan_tpu import gans  # noqa: F401,E402 (registers configurables)

FLAGS = flags.FLAGS
flags.DEFINE_string("checkpoint", None, "TF Saver prefix / reference "
                    "model_dir / TF-Hub module dir to import.")
flags.DEFINE_string("model_dir", None, "Output model dir for the npz "
                    "checkpoint.")
flags.DEFINE_multi_string("gin_config", [], "Gin config files describing "
                          "the trained model.")
flags.DEFINE_multi_string("gin_bindings", [], "Extra gin bindings.")
flags.DEFINE_integer("batch_size", 8, "Template batch size (any value; "
                     "variables are batch-independent).")


def main(unused_argv):
    gin.parse_config_files_and_bindings(FLAGS.gin_config, FLAGS.gin_bindings)
    options = runner_lib.get_options_dict()
    dataset = datasets.get_dataset(seed=547)
    gan = options["gan_class"](dataset=dataset, parameters=options,
                               model_dir=FLAGS.model_dir)
    ts = export.import_reference_checkpoint(
        gan, FLAGS.checkpoint, batch_size=FLAGS.batch_size)
    step = int(ts.step)
    os.makedirs(FLAGS.model_dir, exist_ok=True)
    path = ckpt_lib.save_checkpoint(FLAGS.model_dir, ts, step)
    # Operative config snapshot, like training writes, so eval schedules
    # and export loaders rebuild the same architecture.
    with open(os.path.join(FLAGS.model_dir,
                           f"operative_config-{step}.gin"), "w") as f:
        f.write(gin.config_str())
    print(f"Imported {FLAGS.checkpoint} (step {step}) -> {path}")


if __name__ == "__main__":
    flags.mark_flag_as_required("checkpoint")
    flags.mark_flag_as_required("model_dir")
    app.run(main)
