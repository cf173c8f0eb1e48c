"""Evaluate exactly ONE checkpoint, then exit.

The child half of `--eval_subprocess_per_checkpoint` (runner_lib
._eval_checkpoint_in_subprocess): on the tunneled TPU backend the native
client retains ~6 GB of host memory per evaluated BigGAN-32 checkpoint
— python heap and jax.live_arrays() stay flat while RSS grows, so the
retention sits below JAX where the repo cannot release it. Running each
checkpoint's eval in a throwaway process caps the parent loop at flat
RSS; the persistent compile cache keeps the per-process recompile cheap.

Standalone use:
    python -m compare_gan_tpu.eval_single --model_dir /tmp/run \
        --checkpoint /tmp/run/model.ckpt-5000.npz \
        --gin_config /tmp/run/result/eval_child_config.gin
"""

import os

# Must run before any jax backend init: the parent pins its own backend
# here so the child matches it even where the environment pins another
# (the axon sitecustomize pins JAX_PLATFORMS=axon; CI tests run
# forced-CPU).
_platform = os.environ.get("COMPARE_GAN_EVAL_CHILD_PLATFORM")
if _platform:
    import jax

    jax.config.update("jax_platforms", _platform)

from absl import app, flags  # noqa: E402

from compare_gan_tpu import config as gin  # noqa: E402
from compare_gan_tpu import datasets, runner_lib  # noqa: E402
import compare_gan_tpu.gans  # noqa: F401,E402 (registers configurables)

FLAGS = flags.FLAGS
flags.DEFINE_string("model_dir", None, "Model directory (scores.csv and "
                    "tfhub exports land here).")
flags.DEFINE_string("checkpoint", None, "Path of the ONE checkpoint to "
                    "evaluate.")
flags.DEFINE_multi_string("gin_config", [], "Gin config files (the parent "
                          "passes its live-config snapshot).")
flags.DEFINE_multi_string("gin_bindings", [], "Extra gin bindings.")
flags.DEFINE_integer("batch_size", 64, "Eval batch size.")
flags.DEFINE_integer("num_eval_averaging_runs", 1,
                     "How many times to average FID and IS.")
flags.DEFINE_bool("data_fake_dataset", False,
                  "Replace real data with the fake dataset.")
flags.DEFINE_string("score_file", None,
                    "Full path of the results CSV (the parent forwards "
                    "its task manager's resolved --score_filename so "
                    "results land where the parent reads them); default "
                    "<model_dir>/scores.csv.")


def main(unused_argv):
    from compare_gan_tpu.utils import misc

    misc.enable_persistent_compile_cache()
    datasets.set_fake_dataset(FLAGS.data_fake_dataset)
    gin.parse_config_files_and_bindings(FLAGS.gin_config, FLAGS.gin_bindings)
    options = runner_lib.get_options_dict()
    seed = gin.query("run_config.tf_random_seed", default=None)
    dataset = datasets.get_dataset(seed=547 if seed is None else seed)
    gan = options["gan_class"](dataset=dataset, parameters=options,
                               model_dir=FLAGS.model_dir)
    task_manager = runner_lib.TaskManagerWithCsvResults(
        model_dir=FLAGS.model_dir, score_file=FLAGS.score_file)
    runner_lib.evaluate_and_record_checkpoint(
        gan, FLAGS.checkpoint, task_manager, FLAGS.model_dir,
        batch_size=FLAGS.batch_size,
        num_averaging_runs=FLAGS.num_eval_averaging_runs)


if __name__ == "__main__":
    flags.mark_flag_as_required("model_dir")
    flags.mark_flag_as_required("checkpoint")
    app.run(main)
