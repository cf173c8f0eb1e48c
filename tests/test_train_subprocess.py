"""--train_subprocess_steps: chunked subprocess training (flat parent
RSS on the tunneled-TPU backend, whose client retains host memory on the
training path — ~38 GB parent RSS after a 7 h BigGAN-128 run).

The contract under test: a run chunked into bounded-step child
processes (compare_gan_tpu.main, resume-from-latest-checkpoint per
chunk) produces the SAME final checkpoint, bitwise, as an unbroken
in-process run — the chunk boundary is exactly the (already proven)
bitwise-resume path of tests/test_resume_determinism.py, driven through
the real CLI.
"""

import os

import numpy as np
import pytest

from compare_gan_tpu import checkpoint as ckpt_lib
from compare_gan_tpu import config as gin
from compare_gan_tpu import datasets, runner_lib


@pytest.fixture(autouse=True)
def _fake_data():
    datasets.set_fake_dataset(True)
    yield
    datasets.set_fake_dataset(False)


def _options(training_steps):
    gin.parse_config(f"""
dataset.name = "cifar10"
options.architecture = "dummy_arch"
options.batch_size = 8
options.gan_class = @ModularGAN
options.training_steps = {training_steps}
options.z_dim = 8
""")
    return runner_lib.get_options_dict()


def _run_config(tmp_path):
    return runner_lib.RunConfig(
        model_dir=str(tmp_path), tf_random_seed=3, iterations_per_loop=2,
        save_checkpoints_steps=2, keep_checkpoint_max=10)


def _load(path):
    with np.load(path) as data:
        return {k: data[k] for k in data.files}


@pytest.mark.slow
def test_chunked_subprocess_train_matches_unbroken(tmp_path):
    """5 steps in 2-step chunks (3 children; the last chunk is the
    1-step tail) == one unbroken in-process run, bitwise."""
    chunked_dir = tmp_path / "chunked"
    unbroken_dir = tmp_path / "unbroken"

    tm = runner_lib.TaskManagerWithCsvResults(str(chunked_dir))
    runner_lib.run_with_schedule(
        "train", _run_config(chunked_dir), tm, _options(5),
        train_subprocess_steps=2)
    # The parent (not a chunk child) owns the TRAIN_DONE marker.
    assert tm.is_training_done()
    latest = ckpt_lib.latest_checkpoint(str(chunked_dir))
    assert ckpt_lib.step_of(latest) == 5
    # Each chunk bound left a checkpoint (resume points): 2, 4, 5.
    steps = sorted(ckpt_lib.step_of(p)
                   for p in ckpt_lib.all_checkpoints(str(chunked_dir)))
    assert {2, 4, 5} <= set(steps)

    gin.clear_config()
    tm2 = runner_lib.TaskManagerWithCsvResults(str(unbroken_dir))
    runner_lib.run_with_schedule(
        "train", _run_config(unbroken_dir), tm2, _options(5))
    unbroken = ckpt_lib.latest_checkpoint(str(unbroken_dir))
    assert ckpt_lib.step_of(unbroken) == 5

    a, b = _load(latest), _load(unbroken)
    assert sorted(a) == sorted(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k]), k


def test_chunked_train_rejects_zero_progress(tmp_path, monkeypatch):
    """A child that exits 0 without advancing the checkpoint must abort
    the loop, not respawn forever."""
    import subprocess

    class _Done:
        returncode = 0

    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: _Done())
    _options(4)
    with pytest.raises(RuntimeError, match="did not advance"):
        runner_lib._train_in_subprocess_chunks(
            _run_config(tmp_path), {"training_steps": 4}, 2)


def test_chunked_train_rejects_multihost(tmp_path, monkeypatch):
    import jax

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="multihost"):
        runner_lib.run_with_schedule(
            "train", _run_config(tmp_path),
            runner_lib.TaskManager(str(tmp_path)), _options(4),
            train_subprocess_steps=2)


def test_train_child_env_skips_done_marker(tmp_path, monkeypatch):
    """With COMPARE_GAN_TRAIN_CHILD set (as the chunk launcher does), a
    train schedule must NOT write TRAIN_DONE — interim chunk bounds are
    not end-of-run for continuous_eval pollers."""
    monkeypatch.setenv("COMPARE_GAN_TRAIN_CHILD", "1")
    tm = runner_lib.TaskManager(str(tmp_path))
    runner_lib.run_with_schedule(
        "train", _run_config(tmp_path), tm, _options(2))
    assert not tm.is_training_done()
    assert ckpt_lib.step_of(
        ckpt_lib.latest_checkpoint(str(tmp_path))) == 2


def test_chunked_train_rejects_non_gin_options(tmp_path):
    """Children are rebuilt from the gin snapshot: programmatically
    mutated options (diverging from gin) must be rejected, not silently
    ignored."""
    opts = dict(_options(4))
    opts["batch_size"] = opts["batch_size"] * 2
    with pytest.raises(ValueError, match="differ from the gin-resolved"):
        runner_lib._train_in_subprocess_chunks(
            _run_config(tmp_path), opts, 2)
