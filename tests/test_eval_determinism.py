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


def test_real_stats_cache_is_batch_size_invariant(tmp_path, monkeypatch):
    """Inception stats don't depend on batch_size (it only chunks the
    transform), so evaluating the same gan at two batch sizes must not
    reload the eval split or re-extract features (round-3 review: the
    cache key included batch_size and kept one full copy per size)."""
    gan, path = _make_ckpt(tmp_path, seed=1)
    calls = []
    orig = gan.dataset.load_eval_images

    def spy(*args, **kwargs):
        calls.append((args, kwargs))
        return orig(*args, **kwargs)

    monkeypatch.setattr(gan.dataset, "load_eval_images", spy)
    tasks = [fid_score.FIDScoreTask()]
    eval_gan_lib.evaluate_checkpoint(gan, path, tasks, batch_size=16,
                                     num_averaging_runs=1,
                                     export_accu_checkpoint=False)
    n_first = len(calls)
    eval_gan_lib.evaluate_checkpoint(gan, path, tasks, batch_size=8,
                                     num_averaging_runs=1,
                                     export_accu_checkpoint=False)
    assert len(calls) == n_first, "real split reloaded for a new batch size"


def test_real_images_dropped_unless_a_gan_task_wants_them(tmp_path):
    """FID/IS/KID/PRD read only activations/logits; the raw [0,255] eval
    split (~GBs at ImageNet sizes) must not stay pinned in the per-gan
    cache for such evals — and must be reloadable when a later eval adds
    a task that does want images (round-3 review)."""
    gan, path = _make_ckpt(tmp_path, seed=1)
    eval_gan_lib.evaluate_checkpoint(gan, path, [fid_score.FIDScoreTask()],
                                     batch_size=16, num_averaging_runs=1,
                                     export_accu_checkpoint=False)
    cache = eval_gan_lib._jit_cache(gan)
    reals = [v for k, v in cache.items()
             if isinstance(k, tuple) and k[0] == "real_dset"]
    assert len(reals) == 1
    assert len(reals[0].images) == 0, "raw eval images pinned by FID-only eval"
    assert reals[0].activations is not None

    class _NeedsImages:
        def metric_list(self):
            return frozenset(["n_eval"])

        def run_with_gan(self, gan, ts, eval_images=None):
            return {"n_eval": float(len(eval_images))}

    out = eval_gan_lib.evaluate_checkpoint(gan, path, [_NeedsImages()],
                                           batch_size=16,
                                           num_averaging_runs=1,
                                           export_accu_checkpoint=False)
    assert out["n_eval_mean"] > 0, "images not reloaded for the gan task"


def test_var_keyword_gan_task_receives_image_kwargs(tmp_path):
    """call_with_accepted_args forwards ALL kwargs to a **kwargs
    signature, so the image-kwarg materialization gate must treat
    VAR_KEYWORD as accepting every image kwarg too — otherwise the two
    dispatch layers disagree and the task silently gets no images
    (round-3 review)."""
    gan, path = _make_ckpt(tmp_path, seed=1)
    seen = {}

    class _KwargsOnly:
        def metric_list(self):
            return frozenset(["kw"])

        def run_with_gan(self, **kwargs):
            seen.update(kwargs)
            return {"kw": 1.0}

    eval_gan_lib.evaluate_checkpoint(gan, path, [_KwargsOnly()],
                                     batch_size=16, num_averaging_runs=1,
                                     export_accu_checkpoint=False)
    for name in ("train_images", "eval_images", "test_images"):
        assert name in seen and len(seen[name]) > 0, name
