"""Runner/schedule tests (reference runner_lib_test.py:46-255 coverage:
file layout, TRAIN_DONE, resume, eval_after_train with mocked Inception,
BN-accumulator export)."""

import os

import numpy as np
import pytest

from compare_gan_tpu import checkpoint as ckpt_lib
from compare_gan_tpu import config as gin
from compare_gan_tpu import datasets, eval_utils, runner_lib
import compare_gan_tpu.gans  # noqa: F401  (registers configurables)


@pytest.fixture(autouse=True)
def _fake_data():
    datasets.set_fake_dataset(True)
    yield
    datasets.set_fake_dataset(False)
    eval_utils.set_inception_fn(None)


from tests.helpers import fake_inception as _fake_inception


def _options(training_steps=4):
    gin.parse_config(f"""
dataset.name = "cifar10"
options.architecture = "dummy_arch"
options.batch_size = 8
options.gan_class = @ModularGAN
options.training_steps = {training_steps}
options.z_dim = 8
""")
    return runner_lib.get_options_dict()


def _run_config(tmp_path, **kw):
    defaults = dict(model_dir=str(tmp_path), tf_random_seed=3,
                    iterations_per_loop=2, save_checkpoints_steps=2,
                    keep_checkpoint_max=10)
    defaults.update(kw)
    return runner_lib.RunConfig(**defaults)


def test_train_schedule_file_layout(tmp_path):
    rc = _run_config(tmp_path)
    tm = runner_lib.TaskManagerWithCsvResults(str(tmp_path))
    runner_lib.run_with_schedule("train", rc, tm, _options())
    files = os.listdir(tmp_path)
    assert "TRAIN_DONE" in files
    assert "checkpoint" in files
    assert "operative_config-0.gin" in files
    steps = [ckpt_lib.step_of(p)
             for p in ckpt_lib.all_checkpoints(str(tmp_path))]
    assert steps == [0, 2, 4]
    assert tm.is_training_done()


def test_train_resumes_from_checkpoint(tmp_path):
    rc = _run_config(tmp_path)
    tm = runner_lib.TaskManager(str(tmp_path))
    runner_lib.run_with_schedule("train", rc, tm, _options(2))
    assert ckpt_lib.step_of(
        ckpt_lib.latest_checkpoint(str(tmp_path))) == 2
    # Continue to 4: must not restart from 0.
    runner_lib.run_with_schedule("train", rc, tm, _options(4))
    steps = [ckpt_lib.step_of(p)
             for p in ckpt_lib.all_checkpoints(str(tmp_path))]
    assert 4 in steps


def test_eval_after_train_writes_scores_csv(tmp_path):
    eval_utils.set_inception_fn(_fake_inception)
    rc = _run_config(tmp_path)
    tm = runner_lib.TaskManagerWithCsvResults(str(tmp_path))
    runner_lib.run_with_schedule("eval_after_train", rc, tm, _options(2),
                                 num_eval_averaging_runs=2,
                                 eval_every_steps=None, eval_batch_size=16)
    score_file = os.path.join(tmp_path, "scores.csv")
    assert os.path.exists(score_file)
    import csv
    with open(score_file) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1  # step-2 checkpoint (step 0 skipped)
    for key in ["fid_score_mean", "fid_score_std", "fid_score_list",
                "inception_score_mean"]:
        assert key in rows[0], sorted(rows[0])
    # Operative config columns are joined in.
    assert any(k.startswith("options.") for k in rows[0])


def test_unevaluated_checkpoints_divisibility(tmp_path):
    tm = runner_lib.TaskManager(str(tmp_path))
    for s in [0, 2, 4, 5]:
        ckpt_lib.save_checkpoint(str(tmp_path), {"x": np.zeros(1)}, s)
    tm.mark_training_done()
    got = list(tm.unevaluated_checkpoints(eval_every_steps=2))
    assert [ckpt_lib.step_of(p) for p in got] == [2, 4]


def test_options_requires_batch_size():
    gin.parse_config("""
options.gan_class = @ModularGAN
options.architecture = "dummy_arch"
options.training_steps = 1
""")
    with pytest.raises(gin.ConfigError):
        runner_lib.get_options_dict()


def test_nan_sentinel_written_to_csv(tmp_path):
    """NaN during sampling ⇒ 31337.0 in every metric column of the CSV ROW
    (improves on the reference, whose add_eval_result drops default_value —
    reference runner_lib.py:207-224; asserted on file contents, not a spy)."""
    def nan_inception(images):
        raise eval_utils.NanFoundError("boom")

    eval_utils.set_inception_fn(nan_inception)
    rc = _run_config(tmp_path)
    tm = runner_lib.TaskManagerWithCsvResults(str(tmp_path))
    runner_lib.run_with_schedule("eval_after_train", rc, tm, _options(2),
                                 eval_every_steps=None)
    import csv
    with open(os.path.join(tmp_path, "scores.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1
    for key in ["fid_score_mean", "fid_score_std", "fid_score_list",
                "inception_score_mean", "inception_score_std"]:
        assert float(rows[0][key]) == 31337.0, (key, rows[0])


def test_image_summary_failure_logs_once(caplog):
    """A broken sample path must not kill training, but the FIRST failure
    must be logged loudly (round-2 review: the bare except silently
    produced runs with no image summaries)."""
    class _BrokenGan:
        num_sub_steps = 1
        z_dim = 4
        conditional = False

        def sample(self, *a, **k):
            raise RuntimeError("broken sample path")

    runner_lib._image_summary_failure_logged = False
    try:
        with caplog.at_level("ERROR"):
            runner_lib._write_image_summaries(None, _BrokenGan(), None, 2, 7)
            runner_lib._write_image_summaries(None, _BrokenGan(), None, 2, 8)
        errors = [r for r in caplog.records
                  if "image summary" in r.getMessage().lower()]
        assert len(errors) == 1 and "step 7" in errors[0].getMessage()
    finally:
        runner_lib._image_summary_failure_logged = False


def test_image_summary_z_honors_configured_distribution(tmp_path):
    """Image-summary latents must come from the gan's z sampler
    (z.distribution_fn gin scope) — a hardcoded U(-1,1) grid for a
    normal-z BigGAN recipe shows off-distribution samples (round-3
    review). Normal draws exceed |1| with certainty over 512 samples."""
    gin.parse_config("z.distribution_fn = @tf.random.normal")
    from compare_gan_tpu.gans.modular_gan import ModularGAN
    gan = ModularGAN(dataset=datasets.get_dataset("cifar10"),
                     model_dir=str(tmp_path),
                     parameters={"architecture": "dummy_arch", "z_dim": 64,
                                 "lambda": 1})
    seen = {}

    def spy_sample(ts, z, labels=None, **kw):
        seen["z"] = np.asarray(z)
        return np.zeros((z.shape[0], 32, 32, 3), np.float32), None

    gan.sample = spy_sample

    class _SpyWriter:
        def image_grid(self, tag, images, step):
            seen["tag"] = tag

    runner_lib._write_image_summaries(_SpyWriter(), gan, None, 8, 1)
    assert seen["tag"] == "fake_images"
    assert np.abs(seen["z"]).max() > 1.0
    assert abs(float(seen["z"].std()) - 1.0) < 0.2


def test_scores_csv_header_is_stable_union(tmp_path):
    """Late-appearing metric keys must not misalign rows: the file is
    rewritten with the union header (fixes the reference's per-row
    DictWriter header drift, runner_lib.py:207-224)."""
    import csv
    tm = runner_lib.TaskManagerWithCsvResults(str(tmp_path))
    ckpt_a = os.path.join(tmp_path, "model.ckpt-2.npz")
    ckpt_b = os.path.join(tmp_path, "model.ckpt-4.npz")
    tm.add_eval_result(ckpt_a, {"fid_score_mean": 10.0}, -1.0)
    tm.add_eval_result(ckpt_b, {"fid_score_mean": 9.0,
                                "kid_score_mean": 0.1}, -1.0)
    with open(os.path.join(tmp_path, "scores.csv")) as f:
        rows = list(csv.DictReader(f))
    assert rows[0]["fid_score_mean"] == "10.000"
    assert rows[0]["kid_score_mean"] == ""  # restval, not misaligned
    assert rows[1]["kid_score_mean"] == "0.100"
    assert {r["checkpoint_path"] for r in rows} == {ckpt_a, ckpt_b}


def test_training_steps_not_multiple_of_loop(tmp_path):
    """training_steps % iterations_per_loop != 0 must stop exactly at
    max_steps via a shorter tail chunk (r1 ADVICE runner_lib.py:257)."""
    rc = _run_config(tmp_path, iterations_per_loop=3,
                     save_checkpoints_steps=100)
    tm = runner_lib.TaskManager(str(tmp_path))
    runner_lib.run_with_schedule("train", rc, tm, _options(5))
    latest = ckpt_lib.latest_checkpoint(str(tmp_path))
    assert ckpt_lib.step_of(latest) == 5
    # The checkpoint's internal counter must also be exactly 5: a resume
    # must see start_step == max_steps and exit without training more.
    with np.load(latest) as arrays:
        step_keys = [k for k in arrays.files
                     if k.endswith("step") and "disc" not in k]
        assert step_keys, arrays.files[:20]
        assert int(arrays[step_keys[0]]) == 5


@pytest.mark.slow
def test_eval_subprocess_per_checkpoint(tmp_path):
    """--eval_subprocess_per_checkpoint: each checkpoint is evaluated by
    a FRESH compare_gan_tpu.eval_single process (the tunneled-TPU-client
    RSS-retention mitigation) and the parent's scores.csv and tfhub
    exports come out exactly as the in-process path writes them."""
    import subprocess
    import sys

    import jax

    # The child can't use the in-process set_inception_fn hook: give it
    # the fixed random-init Inception npz through the environment.
    npz = tmp_path / "inception_random_init.npz"
    from compare_gan_tpu.metrics import inception_net
    np.savez(npz, **{k: np.asarray(v) for k, v in
                     inception_net.init_random(jax.random.PRNGKey(42))
                     .items()})
    old_env = os.environ.get(eval_utils.INCEPTION_NPZ_ENV)
    os.environ[eval_utils.INCEPTION_NPZ_ENV] = str(npz)
    try:
        rc = _run_config(tmp_path)
        # Non-default score file: the child must write where the parent
        # reads (round-4 advisor: a child defaulting to scores.csv
        # stranded every result and re-evaluated on restart).
        tm = runner_lib.TaskManagerWithCsvResults(
            str(tmp_path), score_file=str(tmp_path / "custom_scores.csv"))
        runner_lib.run_with_schedule(
            "eval_after_train", rc, tm, _options(2),
            num_eval_averaging_runs=1, eval_every_steps=None,
            eval_batch_size=16, eval_subprocess_per_checkpoint=True)
    finally:
        if old_env is None:
            os.environ.pop(eval_utils.INCEPTION_NPZ_ENV, None)
        else:
            os.environ[eval_utils.INCEPTION_NPZ_ENV] = old_env

    import csv
    assert not (tmp_path / "scores.csv").exists()
    with open(tmp_path / "custom_scores.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1
    assert rows[0]["step"] == "2"
    fid = float(rows[0]["fid_score_mean"])
    assert np.isfinite(fid) and fid != 31337.0
    # The child produced the per-checkpoint module export too.
    assert (tmp_path / "tfhub" / "2" / "module_spec.json").exists()
    # The config snapshot handed to children is persisted for reruns.
    assert (tmp_path / "result" / "eval_child_config.gin").exists()

    # A failing child surfaces as a raised error, not a silent skip.
    bad = runner_lib.RunConfig(model_dir=str(tmp_path / "missing_dir"))
    with pytest.raises(RuntimeError, match="subprocess failed"):
        runner_lib._eval_checkpoint_in_subprocess(
            str(tmp_path / "model.ckpt-999.npz"), bad, 16, 1)


def test_gin_configured_eval_tasks(tmp_path):
    """`evaluation.eval_tasks` makes the implemented-but-non-default
    metrics CLI-selectable (improves on the reference, which hardcodes
    FID+IS — reference runner_lib.py:249-255): KID and MS-SSIM columns
    land in scores.csv under the union header; the accu-fill count knob
    is consumed from the same scope."""
    eval_utils.set_inception_fn(_fake_inception)
    gin.parse_config("""
evaluation.eval_tasks = [@InceptionScoreTask(), @FIDScoreTask(),
                         @KIDScoreTask(), @MultiscaleSSIMTask]
evaluation.num_accu_examples = 64
""")
    rc = _run_config(tmp_path)
    tm = runner_lib.TaskManagerWithCsvResults(str(tmp_path))
    runner_lib.run_with_schedule("eval_after_train", rc, tm, _options(2),
                                 num_eval_averaging_runs=1,
                                 eval_every_steps=None, eval_batch_size=16)
    import csv
    with open(os.path.join(tmp_path, "scores.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1
    for key in ["fid_score_mean", "inception_score_mean",
                "kid_score_mean", "kid_score_std", "ms_ssim_mean"]:
        assert key in rows[0], sorted(rows[0])
        assert np.isfinite(float(rows[0][key]))
    # The accu-count knob was consumed from the same scope.
    assert runner_lib._resolved_eval_settings()[1] == 64


def test_eval_subprocess_auto_default():
    """None (the CLI default) auto-enables subprocess eval exactly on the
    leaking tunneled-TPU backend selector."""
    assert runner_lib._is_leaking_backend("axon")
    assert runner_lib._is_leaking_backend("axon,cpu")
    assert not runner_lib._is_leaking_backend("cpu")
    assert not runner_lib._is_leaking_backend("tpu")
    assert not runner_lib._is_leaking_backend("")
    # Tests force-CPU the whole process, so the live auto policy is off.
    assert runner_lib._eval_subprocess_default() is False


def test_run_eval_rejects_in_memory_tasks_with_subprocess(tmp_path):
    """Python task objects cannot cross the subprocess boundary; passing
    both is a hard error, not a silent FID/IS fallback (round-4
    advisor)."""
    rc = _run_config(tmp_path)
    tm = runner_lib.TaskManagerWithCsvResults(str(tmp_path))
    with pytest.raises(ValueError, match="evaluation.eval_tasks"):
        runner_lib._run_eval(
            gan=None, checkpoints=[], task_manager=tm, run_config=rc,
            batch_size=16, num_averaging_runs=1,
            eval_tasks=[object()], subprocess_per_checkpoint=True)
