"""tools/eval_ema_vs_raw.py: the EMA-vs-raw per-checkpoint FID sweep
(the late-training-degradation diagnostic — does the raw G or only its
EMA copy get worse?)."""

import csv
import os

import pytest

from compare_gan_tpu import config as gin
from compare_gan_tpu import datasets, eval_utils, runner_lib
import compare_gan_tpu.gans  # noqa: F401  (registers configurables)
from tests.helpers import fake_inception
from tools import eval_ema_vs_raw


@pytest.fixture(autouse=True)
def _fake_data():
    datasets.set_fake_dataset(True)
    eval_utils.set_inception_fn(fake_inception)
    yield
    datasets.set_fake_dataset(False)
    eval_utils.set_inception_fn(None)


def _train(tmp_path, use_ema):
    gin.parse_config(f"""
dataset.name = "cifar10"
options.architecture = "dummy_arch"
options.batch_size = 8
options.gan_class = @ModularGAN
options.training_steps = 4
options.z_dim = 8
ModularGAN.g_use_ema = {use_ema}
ModularGAN.ema_start_step = 0
""")
    options = runner_lib.get_options_dict()
    rc = runner_lib.RunConfig(model_dir=str(tmp_path), tf_random_seed=3,
                              iterations_per_loop=2,
                              save_checkpoints_steps=2,
                              keep_checkpoint_max=10)
    tm = runner_lib.TaskManagerWithCsvResults(str(tmp_path))
    return runner_lib.run_with_schedule("train", rc, tm, options)


def test_ema_vs_raw_sweep(tmp_path):
    gan = _train(tmp_path, use_ema=True)
    out = os.path.join(tmp_path, "ema_vs_raw.csv")
    rows = eval_ema_vs_raw.evaluate_model_dir(
        gan, str(tmp_path), batch_size=16, out_path=out,
        num_accu_examples=64)
    # Checkpoints at steps 2 and 4 (step 0 skipped), both param sets
    # finite and genuinely different (EMA from step 0 lags the raw G).
    assert [r["step"] for r in rows] == [2, 4]
    for r in rows:
        assert r["fid_ema"] > 0 and r["fid_raw"] > 0
        assert r["fid_ema"] != r["fid_raw"]
    with open(out) as f:
        got = list(csv.DictReader(f))
    assert [int(r["step"]) for r in got] == [2, 4]
    assert float(got[0]["fid_raw"]) == rows[0]["fid_raw"]


def test_rejects_non_ema_run(tmp_path):
    gan = _train(tmp_path, use_ema=False)
    with pytest.raises(ValueError, match="without g_use_ema"):
        eval_ema_vs_raw.evaluate_model_dir(gan, str(tmp_path))
