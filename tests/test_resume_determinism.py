"""Bitwise resume determinism: train N steps continuously vs train k,
checkpoint, restore, train N-k — identical parameters. Requires the
input stream to fast-forward on resume (skip_batches), which the
index-keyed transform RNG makes exact."""

import numpy as np
import pytest

from compare_gan_tpu import checkpoint as ckpt_lib
from compare_gan_tpu import config as gin
from compare_gan_tpu import datasets, runner_lib
import compare_gan_tpu.gans  # noqa: F401


@pytest.fixture(autouse=True)
def _fake_data():
    datasets.set_fake_dataset(True)
    yield
    datasets.set_fake_dataset(False)


def _options(steps):
    gin.clear_config()
    gin.parse_config(f"""
dataset.name = "cifar10"
options.architecture = "dummy_arch"
options.batch_size = 8
options.gan_class = @ModularGAN
options.training_steps = {steps}
options.z_dim = 8
""")
    return runner_lib.get_options_dict()


def _run(tmp_path, steps_list):
    model_dir = str(tmp_path)
    for steps in steps_list:
        rc = runner_lib.RunConfig(model_dir=model_dir, tf_random_seed=11,
                                  iterations_per_loop=1,
                                  save_checkpoints_steps=2)
        tm = runner_lib.TaskManager(model_dir)
        runner_lib.run_with_schedule("train", rc, tm, _options(steps))
    path = ckpt_lib.latest_checkpoint(model_dir)
    with np.load(path) as data:
        return {k: np.array(data[k]) for k in data.files}, path


def test_resume_is_bitwise_identical(tmp_path):
    cont, path_a = _run(tmp_path / "a", [4])
    resumed, path_b = _run(tmp_path / "b", [2, 4])
    assert ckpt_lib.step_of(path_a) == ckpt_lib.step_of(path_b) == 4
    for k in cont:
        np.testing.assert_array_equal(cont[k], resumed[k]), k


def test_skip_batches_aligns_stream():
    ds = datasets.get_dataset("cifar10", seed=5)
    full = ds.train_input_fn(4)
    skipped = ds.train_input_fn(4, skip_batches=3)
    for _ in range(3):
        next(full)
    a, b = next(full), next(skipped)
    np.testing.assert_array_equal(a["images"], b["images"])
    np.testing.assert_array_equal(a["labels"], b["labels"])
