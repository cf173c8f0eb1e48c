"""evaluate_tfhub_module from an export dir + conditional export loaders
(the reference's hub-module eval surface, eval_gan_lib.py:95)."""

import numpy as np
import pytest

import jax

from compare_gan_tpu import datasets, eval_gan_lib, eval_utils, export
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


def _export(tmp_path, conditional=False):
    ds = datasets.get_dataset("cifar10")
    gan = ModularGAN(dataset=ds, model_dir=str(tmp_path),
                     parameters={"architecture": "dummy_arch", "z_dim": 8,
                                 "lambda": 1}, conditional=conditional)
    ts = gan.init_state(jax.random.PRNGKey(0), 8)
    d = str(tmp_path / "tfhub" / "1")
    export.export_module(gan, ts, d)
    return d


def test_evaluate_export_dir(tmp_path):
    d = _export(tmp_path)
    out = eval_gan_lib.evaluate_tfhub_module(
        d, [inception_score.InceptionScoreTask(),
            fid_score.FIDScoreTask()], batch_size=16,
        num_averaging_runs=1)
    assert "fid_score_mean" in out and "inception_score_mean" in out


def test_conditional_export_loaders(tmp_path):
    d = _export(tmp_path, conditional=True)
    generate, spec = export.load_generator(d)
    assert spec["conditional"]
    with pytest.raises(ValueError):
        generate(np.zeros((2, 8), np.float32))  # labels required
    imgs = generate(np.zeros((2, 8), np.float32),
                    labels=np.array([1, 2]))
    assert imgs.shape == (2, 32, 32, 3)
    discriminate, _ = export.load_discriminator(d)
    pred, logits, _ = discriminate(imgs, labels=np.array([1, 2]))
    assert logits.shape == (2, 1)


def test_evaluate_export_dir_uses_config_snapshot(tmp_path):
    """evaluate_tfhub_module must trace the generator inside the export's
    gin snapshot (round-3 review: it built the arch outside
    _export_config_scope, so in a fresh process the lazy forward rebuilt
    with DEFAULT bindings and metrics came from a silently wrong
    network). Oracle: the metrics must be identical whether the process
    still has the training config or none at all."""
    from compare_gan_tpu import config as gin

    # batch_norm in G changes the inference forward once moving stats
    # move off their init (identity) values — hence the train step. A
    # defaults rebuild (no BN) would skip the normalization entirely.
    # eval_z = normal covers the SAMPLER path: z draws happen at trace
    # time in _make_sampler, outside any generator forward, so the whole
    # evaluation must run inside the export's config scope (a defaults
    # rebuild would sample uniform z — round-3 review).
    gin.parse_config("G.batch_norm_fn = @batch_norm\n"
                     "eval_z.distribution_fn = @tf.random.normal")
    ds = datasets.get_dataset("cifar10")
    gan = ModularGAN(dataset=ds, model_dir=str(tmp_path),
                     parameters={"architecture": "sndcgan_arch",
                                 "z_dim": 8, "lambda": 1, "disc_iters": 1})
    bs = 2
    ts = gan.init_state(jax.random.PRNGKey(0), bs)
    rng = np.random.RandomState(0)
    total = bs * gan.num_sub_steps
    ts, _ = jax.jit(gan.make_train_step(bs))(
        ts, {"images": rng.rand(total, 32, 32, 3).astype(np.float32),
             "labels": rng.randint(0, 10, total).astype(np.int32)})
    d = str(tmp_path / "export")
    export.export_module(gan, ts, d)

    task = [fid_score.FIDScoreTask()]
    with_cfg = eval_gan_lib.evaluate_tfhub_module(
        d, task, batch_size=8, num_averaging_runs=1)
    gin.clear_config()  # Fresh-process simulation.
    without_cfg = eval_gan_lib.evaluate_tfhub_module(
        d, task, batch_size=8, num_averaging_runs=1)
    assert with_cfg["fid_score_mean"] == pytest.approx(
        without_cfg["fid_score_mean"], rel=1e-6)


def test_export_restores_gin_configured_architecture(tmp_path):
    """The export must be self-contained: a model trained with gin knobs
    (spectral norm here) must reload identically in a process with NO gin
    config — export_config.gin is re-applied at load. Without it the
    architecture silently rebuilds with defaults (no SN) and produces
    different images from the same weights."""
    from compare_gan_tpu import config as gin
    from compare_gan_tpu import datasets
    from compare_gan_tpu.gans.modular_gan import ModularGAN
    import jax

    gin.parse_config("G.spectral_norm = True\nD.spectral_norm = True")
    datasets.set_fake_dataset(True)
    ds = datasets.get_dataset("cifar10")
    gan = ModularGAN(dataset=ds, model_dir=str(tmp_path),
                     parameters={"architecture": "sndcgan_arch",
                                 "z_dim": 8, "lambda": 1, "disc_iters": 1})
    bs = 2
    ts = gan.init_state(jax.random.PRNGKey(0), bs)
    step = jax.jit(gan.make_train_step(bs))
    rng = np.random.RandomState(0)
    total = bs * gan.num_sub_steps
    ts, _ = step(ts, {"images": rng.rand(total, 32, 32, 3).astype(np.float32),
                      "labels": rng.randint(0, 10, total).astype(np.int32)})
    z = rng.uniform(-1, 1, size=(2, 8)).astype(np.float32)
    want, _ = gan.sample(ts, z)
    d = str(tmp_path / "export")
    export.export_module(gan, ts, d)

    gin.clear_config()  # Fresh process simulation: no training config.
    generate, _ = export.load_generator(d)
    got = generate(z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # Loading must not leak the export's bindings into the live config
    # (round-2 advisor: the old loader re-applied export_config.gin
    # globally, clobbering process state).
    assert gin.query("G.spectral_norm", default=None) is None


def test_two_exports_with_different_configs_coexist(tmp_path):
    """Two loaded exports with conflicting gin configs must each rebuild
    with their OWN bindings (round-2 advisor: lazy architecture gin
    injection made 'last load wins' for both modules)."""
    from compare_gan_tpu import config as gin
    from compare_gan_tpu.gans.modular_gan import ModularGAN
    import jax

    rng = np.random.RandomState(0)
    z = rng.uniform(-1, 1, size=(2, 8)).astype(np.float32)
    dirs, want = [], []
    for i, bn in enumerate(("@batch_norm", "@no_batch_norm")):
        gin.clear_config()
        gin.parse_config(f"G.batch_norm_fn = {bn}")
        ds = datasets.get_dataset("cifar10")
        gan = ModularGAN(dataset=ds, model_dir=str(tmp_path / f"m{i}"),
                         parameters={"architecture": "sndcgan_arch",
                                     "z_dim": 8, "lambda": 1,
                                     "disc_iters": 1})
        ts = gan.init_state(jax.random.PRNGKey(3), 2)
        d = str(tmp_path / f"export{i}")
        export.export_module(gan, ts, d)
        imgs, _ = gan.sample(ts, z)
        dirs.append(d)
        want.append(np.asarray(imgs))
    gin.clear_config()

    # Same weights, SN on vs off: outputs must differ, proving the knob
    # matters for this assertion to be meaningful.
    assert not np.allclose(want[0], want[1])

    gen_sn, _ = export.load_generator(dirs[0])
    gen_plain, _ = export.load_generator(dirs[1])
    # Interleave: each call must use its own export's bindings.
    np.testing.assert_allclose(np.asarray(gen_plain(z)), want[1],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gen_sn(z)), want[0],
                               rtol=1e-5, atol=1e-5)


def test_evaluate_export_dir_runs_gan_tasks(tmp_path):
    """Generator/discriminator-access tasks (GILBO, accuracy, Jacobian
    conditioning) work through the tfhub-module path: exports carry both
    G and D params, so the shim exposes sample/z_generator/discriminator
    (round-3 review: these previously died with AttributeError)."""
    from compare_gan_tpu.metrics import accuracy, gilbo, \
        jacobian_conditioning
    d = _export(tmp_path)
    out = eval_gan_lib.evaluate_tfhub_module(
        d, [jacobian_conditioning.GeneratorConditionNumberTask(),
            gilbo.GILBOTask(train_steps=2, eval_batches=1),
            accuracy.AccuracyTask()],
        batch_size=8, num_averaging_runs=1)
    for key in ("log_condition_number_mean_mean", "gilbo_mean",
                "fake_accuracy_mean"):
        assert key in out and np.isfinite(float(out[key])), (key, out)


def test_export_shim_sample_reads_traced_params(tmp_path):
    """The shim's _inference_params must pass through the (possibly
    traced) ts.params: gan tasks jit with ts as an ARGUMENT (that is why
    _ShimState is a registered pytree), and returning the closed-over
    concrete dict bakes the full weight set into the HLO as constants —
    rejected by the axon tunnel for BigGAN-size programs (round-3 review
    verified the traced params were dead: zeroing ts.params did not
    change the jitted output)."""
    d = _export(tmp_path)
    cap = {}

    class _Capture:
        def metric_list(self):
            return frozenset(["cap"])

        def run_with_gan(self, gan, ts):
            cap["gan"], cap["ts"] = gan, ts
            return {"cap": 0.0}

    eval_gan_lib.evaluate_tfhub_module(d, [_Capture()], batch_size=8,
                                       num_averaging_runs=1)
    gan, ts = cap["gan"], cap["ts"]
    z = np.asarray(np.random.RandomState(0).randn(4, 8), np.float32)
    f = jax.jit(lambda t: gan.sample(t, z)[0])
    out_real = np.asarray(f(ts))
    zeroed = type(ts)(params=jax.tree_util.tree_map(np.zeros_like,
                                                    ts.params),
                      state=ts.state)
    out_zero = np.asarray(f(zeroed))
    assert not np.allclose(out_real, out_zero), \
        "zeroing the traced params did not change the jitted sample: " \
        "the shim is reading closure weights, not ts.params"


def test_gan_tasks_rejected_on_conditional_models(tmp_path):
    """The legacy generator/discriminator-access tasks are label-free;
    on a conditional export they would die mid-eval with an obscure
    one_hot(None) error (round-3 review repro) — reject up front with an
    actionable message instead."""
    from compare_gan_tpu.metrics import jacobian_conditioning
    d = _export(tmp_path, conditional=True)
    with pytest.raises(ValueError, match="unconditional"):
        eval_gan_lib.evaluate_tfhub_module(
            d, [jacobian_conditioning.GeneratorConditionNumberTask()],
            batch_size=8, num_averaging_runs=1)
