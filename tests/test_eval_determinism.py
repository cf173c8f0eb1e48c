"""Eval protocol determinism: evaluating the same checkpoint twice gives
identical metrics (fixed seeds 42 — reference eval_gan_lib.py:112-118),
and different checkpoints give different metrics."""

import jax
import numpy as np
import pytest

from compare_gan_tpu import checkpoint as ckpt_lib
from compare_gan_tpu import datasets, eval_gan_lib, eval_utils
from compare_gan_tpu.gans.modular_gan import ModularGAN
from compare_gan_tpu.metrics import fid_score, inception_score


@pytest.fixture(autouse=True)
def _setup():
    datasets.set_fake_dataset(True)

    from tests.helpers import fake_inception
    eval_utils.set_inception_fn(fake_inception)
    yield
    datasets.set_fake_dataset(False)
    eval_utils.set_inception_fn(None)


def _make_ckpt(tmp_path, seed, step=1):
    ds = datasets.get_dataset("cifar10")
    gan = ModularGAN(dataset=ds, model_dir=str(tmp_path),
                     parameters={"architecture": "dummy_arch", "z_dim": 8,
                                 "lambda": 1})
    ts = gan.init_state(jax.random.PRNGKey(seed), 8)
    ts = type(ts)(**{**ts.__dict__,
                     "step": ts.step + step})
    path = ckpt_lib.save_checkpoint(str(tmp_path), ts, step)
    return gan, path


TASKS = [inception_score.InceptionScoreTask(), fid_score.FIDScoreTask()]


def test_same_checkpoint_same_metrics(tmp_path):
    gan, path = _make_ckpt(tmp_path, seed=1)
    a = eval_gan_lib.evaluate_checkpoint(gan, path, TASKS, batch_size=16)
    b = eval_gan_lib.evaluate_checkpoint(gan, path, TASKS, batch_size=16)
    assert a == b


def test_different_checkpoints_differ(tmp_path):
    gan1, path1 = _make_ckpt(tmp_path / "a", seed=1)
    gan2, path2 = _make_ckpt(tmp_path / "b", seed=2)
    a = eval_gan_lib.evaluate_checkpoint(gan1, path1, TASKS, batch_size=16)
    b = eval_gan_lib.evaluate_checkpoint(gan2, path2, TASKS, batch_size=16)
    assert a["fid_score_mean"] != b["fid_score_mean"]


def test_real_stats_cached_across_checkpoints(tmp_path, monkeypatch):
    """continuous_eval evaluates many checkpoints with one gan; the real
    split's images/Inception stats are checkpoint-invariant and must be
    loaded once, not per checkpoint."""
    gan, path = _make_ckpt(tmp_path, seed=1)
    calls = []
    orig = gan.dataset.load_eval_images

    def spy(*args, **kwargs):
        calls.append((args, kwargs))
        return orig(*args, **kwargs)

    monkeypatch.setattr(gan.dataset, "load_eval_images", spy)
    tasks = [fid_score.FIDScoreTask()]
    a = eval_gan_lib.evaluate_checkpoint(gan, path, tasks, batch_size=16,
                                         num_averaging_runs=1,
                                         export_accu_checkpoint=False)
    n_first = len(calls)
    b = eval_gan_lib.evaluate_checkpoint(gan, path, tasks, batch_size=16,
                                         num_averaging_runs=1,
                                         export_accu_checkpoint=False)
    assert len(calls) == n_first, "real split reloaded on second eval"
    assert a["fid_score_mean"] == b["fid_score_mean"]
