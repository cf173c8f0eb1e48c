"""Binary to train and evaluate GANs (rebuild of compare_gan/main.py).

Same flag surface (main.py:45-66): --model_dir, --schedule, --gin_config,
--gin_bindings, --score_filename, --num_eval_averaging_runs,
--eval_every_steps, --data_fake_dataset. TPU selection flags become
JAX-native: devices are discovered by the runtime; --num_devices restricts
the mesh.

Example:
  python -m compare_gan_tpu.main --model_dir=/tmp/gan \
      --gin_config=example_configs/resnet_cifar10.gin
"""

from __future__ import annotations

import os

# Must run before any jax backend init: a parent driving this binary as
# a training-chunk child (runner_lib._train_in_subprocess_chunks) pins
# its own platform selector here so the child matches it even where the
# environment pins another (the axon sitecustomize pins
# JAX_PLATFORMS=axon; CI tests run forced-CPU). Same contract as
# eval_single's COMPARE_GAN_EVAL_CHILD_PLATFORM.
_platform = os.environ.get("COMPARE_GAN_CHILD_PLATFORM")
if _platform:
    import jax

    jax.config.update("jax_platforms", _platform)

from absl import app, flags, logging  # noqa: E402

from compare_gan_tpu import config as gin
from compare_gan_tpu import datasets, runner_lib
# Importing registers all configurables (architectures, losses, gans).
from compare_gan_tpu import gans  # noqa: F401

FLAGS = flags.FLAGS

flags.DEFINE_string("model_dir", None, "Where to store files.")
flags.DEFINE_string(
    "schedule", "train",
    "Schedule to run: train, continuous_eval, eval_after_train.")
flags.DEFINE_multi_string(
    "gin_config", [], "List of paths to the config files.")
flags.DEFINE_multi_string(
    "gin_bindings", [], "Newline separated list of Gin parameter bindings.")
flags.DEFINE_string(
    "score_filename", "scores.csv",
    "Name of the CSV file with evaluation results model_dir.")
flags.DEFINE_integer(
    "num_eval_averaging_runs", 3,
    "How many times to average FID and IS.")
flags.DEFINE_integer(
    "eval_every_steps", 5000, "Evaluate only checkpoints whose step is "
    "divisible by this integer.")
flags.DEFINE_bool(
    "data_fake_dataset", False,
    "If True, the real data is replaced by a fake dataset.")
flags.DEFINE_bool(
    "eval_subprocess_per_checkpoint", None,
    "Evaluate each checkpoint in a fresh subprocess. Mitigates the "
    "tunneled-TPU client's per-eval host-memory retention (~6 GB per "
    "BigGAN-32 checkpoint, below JAX and unreachable from this repo) so "
    "long continuous_eval loops run at flat RSS; costs process startup "
    "plus a compile-cache-warm recompile per checkpoint. Default "
    "(unset): AUTO — enabled on the leaking tunneled-TPU backend, "
    "disabled elsewhere.")
flags.DEFINE_integer(
    "train_subprocess_steps", 0,
    "When > 0, run the training phase as a sequence of child processes "
    "advancing at most this many steps each (each child resumes from "
    "the latest checkpoint, trains to its bound, checkpoints and "
    "exits). Mitigates the tunneled-TPU client's host-memory retention "
    "on the TRAINING path (~38 GB parent RSS after a 7 h BigGAN-128 "
    "run; below JAX, unreachable from this repo) the same way "
    "--eval_subprocess_per_checkpoint does for eval. Bitwise-resume "
    "determinism makes the chunked run equal to an unbroken one. Costs "
    "per chunk: process startup + a compile-cache-warm recompile + the "
    "input fast-forward, so pick chunks of thousands of steps (e.g. "
    "5000, one checkpoint interval). 0 (default) trains in-process.")
flags.DEFINE_integer("num_devices", None,
                     "Devices in the mesh (default: all local).")
flags.DEFINE_bool(
    "use_tpu", None,
    "Accepted for reference-CLI compatibility (main.py:62-63); device "
    "selection is automatic under JAX.")
flags.DEFINE_bool(
    "multihost", False,
    "Form a multi-host mesh via jax.distributed.initialize() before any "
    "device use. Coordinator/process identity come from --coordinator_"
    "address/--num_processes/--process_id, or are auto-detected on Cloud "
    "TPU pods when those are unset. The TPUEstimator equivalent: every "
    "host then runs its own input shard and the chief (process 0) writes "
    "checkpoints/summaries.")
flags.DEFINE_string(
    "coordinator_address", None,
    "host:port of process 0 for --multihost (unset: auto-detect).")
flags.DEFINE_integer(
    "num_processes", None, "Process count for --multihost.")
flags.DEFINE_integer(
    "process_id", None, "This process's index for --multihost.")


def _get_run_config(iterations_per_loop=100, save_checkpoints_steps=5000,
                    keep_checkpoint_max=1000, tf_random_seed=None,
                    profile=False):
    """Gin-configurable run config (reference `_get_run_config`,
    main.py:79-95; same binding names)."""
    return runner_lib.RunConfig(
        model_dir=FLAGS.model_dir,
        tf_random_seed=tf_random_seed,
        iterations_per_loop=iterations_per_loop,
        save_checkpoints_steps=save_checkpoints_steps,
        keep_checkpoint_max=keep_checkpoint_max,
        num_devices=FLAGS.num_devices,
        profile=profile)


_get_run_config = gin.configurable("run_config")(_get_run_config)


def _get_task_manager():
    score_file = None
    if FLAGS.score_filename:
        import os
        score_file = os.path.join(FLAGS.model_dir, FLAGS.score_filename)
    return runner_lib.TaskManagerWithCsvResults(
        model_dir=FLAGS.model_dir, score_file=score_file)


def main(unused_argv):
    from compare_gan_tpu.utils import misc
    misc.enable_persistent_compile_cache()
    if FLAGS.multihost:
        # Must run before anything touches jax devices; afterwards
        # jax.process_index()/process_count() drive chief-only writes
        # (runner_lib) and per-host input sharding (datasets).
        import jax
        jax.distributed.initialize(
            coordinator_address=FLAGS.coordinator_address,
            num_processes=FLAGS.num_processes,
            process_id=FLAGS.process_id)
        logging.info("Multi-host mesh: process %d of %d.",
                     jax.process_index(), jax.process_count())
    logging.info("Gin config: %s\nGin bindings: %s",
                 FLAGS.gin_config, FLAGS.gin_bindings)
    datasets.set_fake_dataset(FLAGS.data_fake_dataset)
    gin.parse_config_files_and_bindings(FLAGS.gin_config, FLAGS.gin_bindings)

    run_config = _get_run_config()
    task_manager = _get_task_manager()
    options = runner_lib.get_options_dict()
    runner_lib.run_with_schedule(
        schedule=FLAGS.schedule,
        run_config=run_config,
        task_manager=task_manager,
        options=options,
        num_eval_averaging_runs=FLAGS.num_eval_averaging_runs,
        eval_every_steps=(FLAGS.eval_every_steps or None),
        eval_subprocess_per_checkpoint=FLAGS.eval_subprocess_per_checkpoint,
        train_subprocess_steps=FLAGS.train_subprocess_steps)
    logging.info("Finished schedule %s.", FLAGS.schedule)


if __name__ == "__main__":
    flags.mark_flag_as_required("model_dir")
    app.run(main)
