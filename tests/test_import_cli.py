"""The advertised import workflow, end-to-end: the
`tools/import_tf_checkpoint.py` CLI as a subprocess on a
reference-shaped checkpoint, followed by a `--schedule=continuous_eval`
pass over the imported model_dir (README's documented flow), plus a
flagship-size BigGAN-128 import smoke that pins the full name map at
128px shapes (reference gans/modular_gan.py:266-306,
runner_lib.py:258-264)."""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax

from compare_gan_tpu import config as gin
from compare_gan_tpu import datasets, export, runner_lib
from compare_gan_tpu.gans.modular_gan import ModularGAN

tf = pytest.importorskip("tensorflow")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CIFAR_GIN = textwrap.dedent("""
    dataset.name = "cifar10"
    options.gan_class = @ModularGAN
    options.architecture = "resnet_cifar_arch"
    options.batch_size = 8
    options.training_steps = 4
    options.disc_iters = 1
    options.z_dim = 16
    options.lamba = 1
    loss.fn = @non_saturating
    penalty.fn = @no_penalty
    G.batch_norm_fn = @batch_norm
    D.spectral_norm = True
    run_config.iterations_per_loop = 2
    run_config.save_checkpoints_steps = 2
""")

# Subprocesses must force CPU through jax.config (the axon sitecustomize
# pins JAX_PLATFORMS; exporting it does nothing), so the CLIs are driven
# through thin launchers that set the backend then hand over to the
# real entry point with the original argv contract.
_IMPORT_LAUNCHER = textwrap.dedent("""
    import runpy
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    tool = sys.argv[1]
    sys.argv = ["import_tf_checkpoint"] + sys.argv[2:]
    runpy.run_path(tool, run_name="__main__")
""")

_EVAL_LAUNCHER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.argv = ["main"] + sys.argv[1:]
    from absl import app
    from compare_gan_tpu import main
    app.run(main.main)
""")


def _write_tf_checkpoint(prefix, float_vars, int_vars=()):
    graph = tf.Graph()
    with graph.as_default():
        for name, value in dict(float_vars).items():
            tf.compat.v1.get_variable(
                name, initializer=np.asarray(value, np.float32))
        for name, (value, dtype) in dict(int_vars).items():
            tf.compat.v1.get_variable(
                name, initializer=np.asarray(value, dtype), dtype=dtype)
        saver = tf.compat.v1.train.Saver()
        with tf.compat.v1.Session(graph=graph) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            saver.save(sess, prefix)
    return prefix


def _reference_vars(template, seed=0):
    """Random reference-shaped variables for a TrainState template:
    params + state (positive variance/counters) + EMA shadows."""
    rng = np.random.default_rng(seed)

    def rand(v, name=""):
        arr = rng.standard_normal(np.shape(v)).astype(np.float32) * 0.05
        if name.endswith(("variance", "counter")):
            arr = np.abs(arr) + 0.5
        return arr

    float_vars = {k: rand(v) for k, v in template.params.items()}
    for k, v in template.state.items():
        float_vars[k] = rand(v, name=k)
    for k in template.ema_params:
        float_vars[k + "/ExponentialMovingAverage"] = rand(
            template.params[k])
    return float_vars


@pytest.mark.slow
def test_import_cli_then_continuous_eval(tmp_path):
    """Drives the README flow exactly: reference-shaped resnet_cifar
    Saver checkpoint -> import CLI -> one continuous_eval pass writing a
    finite scores.csv row for the imported step."""
    datasets.set_fake_dataset(True)
    try:
        gin.parse_config(_CIFAR_GIN)
        options = runner_lib.get_options_dict()
        gan = ModularGAN(dataset=datasets.get_dataset("cifar10"),
                         parameters=options, model_dir=str(tmp_path),
                         g_use_ema=False)
        template = gan.init_state(jax.random.PRNGKey(0), 2)
    finally:
        datasets.set_fake_dataset(False)
        gin.clear_config()
    float_vars = _reference_vars(template)
    int_vars = {"global_step": (77, np.int64),
                "global_step_disc": (77, np.int32)}
    ref_dir = tmp_path / "reference_run"
    ref_dir.mkdir()
    _write_tf_checkpoint(str(ref_dir / "model.ckpt-77"), float_vars,
                         int_vars)

    gin_file = tmp_path / "model.gin"
    gin_file.write_text(_CIFAR_GIN)
    model_dir = tmp_path / "imported"
    launcher = tmp_path / "import_launcher.py"
    launcher.write_text(_IMPORT_LAUNCHER)
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("XLA_FLAGS", None)

    out = subprocess.run(
        [sys.executable, str(launcher),
         os.path.join(REPO, "tools", "import_tf_checkpoint.py"),
         f"--checkpoint={ref_dir / 'model.ckpt-77'}",
         f"--model_dir={model_dir}", f"--gin_config={gin_file}",
         "--batch_size=2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]

    # The tool produced the native checkpoint + the operative snapshot,
    # and the imported values are the reference's bitwise.
    ckpt = np.load(model_dir / "model.ckpt-77.npz")
    assert int(ckpt[".step"]) == 77
    assert (model_dir / "operative_config-77.gin").exists()
    for k, v in template.params.items():
        np.testing.assert_array_equal(ckpt[f".params['{k}']"],
                                      float_vars[k], err_msg=k)

    # The documented follow-up: continuous_eval over the imported dir.
    # TRAIN_DONE makes the poll loop evaluate what exists and exit; the
    # fixed random-init Inception npz stands in for the real weights.
    (model_dir / "TRAIN_DONE").write_text("")
    inception_npz = tmp_path / "inception_random_init.npz"
    from compare_gan_tpu.metrics import inception_net
    np.savez(inception_npz,
             **{k: np.asarray(v) for k, v in
                inception_net.init_random(jax.random.PRNGKey(42)).items()})
    eval_launcher = tmp_path / "eval_launcher.py"
    eval_launcher.write_text(_EVAL_LAUNCHER)
    env["COMPARE_GAN_INCEPTION_NPZ"] = str(inception_npz)
    out = subprocess.run(
        [sys.executable, str(eval_launcher),
         f"--model_dir={model_dir}", "--schedule=continuous_eval",
         f"--gin_config={gin_file}", "--data_fake_dataset",
         "--num_eval_averaging_runs=1", "--eval_every_steps=77"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]

    scores = (model_dir / "scores.csv").read_text().splitlines()
    header = scores[0].split(",")
    rows = [dict(zip(header, line.split(","))) for line in scores[1:]]
    row = [r for r in rows if r["step"] == "77"]
    assert row, scores
    fid = float(row[0]["fid_score_mean"])
    assert np.isfinite(fid) and fid != 31337.0  # Not the NaN sentinel.


# Flagship-size golden names that only exist at 128px with the full
# BigGAN recipe: the 64px attention block, accumulator cBN state in G,
# EMA shadows, the projection-D embedding. Hardcoded, not derived.
_BIGGAN128_GOLDEN = [
    "generator/embed_y/kernel",
    "generator/fc_noise/kernel",
    "generator/B1/up_conv_shortcut/kernel",
    "generator/B5/bn1/condition/gamma/kernel",
    "generator/non_local_block/conv2d_g/kernel",
    "generator/non_local_block/sigma",
    "generator/final_norm/gamma",
    "discriminator/B1/down_conv_shortcut/kernel",
    "discriminator/non_local_block/conv2d_theta/kernel",
    "discriminator/final_fc/kernel",
    "discriminator/embedding_fc/kernel",
]
_BIGGAN128_GOLDEN_STATE = [
    "generator/B1/bn1/accu/accu_mean",
    "generator/B5/bn2/accu/accu_counter",
    "generator/final_norm/accu/accu_variance",
    "discriminator/B1/down_conv_shortcut/kernel/u_var",
    "generator/non_local_block/conv2d_g/kernel/u_var",
]


@pytest.mark.slow
def test_import_biggan128_flagship_smoke(tmp_path):
    """Golden-named BigGAN-128 import at the advertised flagship size
    (158M-param G with EMA + accu-BN): the name map holds at 128px
    shapes, values round-trip, and a tiny-batch EMA forward through the
    imported accumulator stats stays finite."""
    datasets.set_fake_dataset(True)
    try:
        gin.parse_config_files_and_bindings(
            [os.path.join(REPO, "example_configs",
                          "biggan_imagenet128.gin")], [])
        options = runner_lib.get_options_dict()
        gan = ModularGAN(dataset=datasets.get_dataset("imagenet_128"),
                         parameters=options, model_dir=str(tmp_path),
                         conditional=True, g_use_ema=True)
        template = gan.init_state(jax.random.PRNGKey(1), 2)

        for name in _BIGGAN128_GOLDEN:
            assert name in template.params, name
        for name in _BIGGAN128_GOLDEN_STATE:
            assert name in template.state, name

        float_vars = _reference_vars(template, seed=7)
        # Make accumulated stats a valid single-batch fill so the EMA
        # forward normalizes with sane moments.
        for k in template.state:
            if k.endswith("accu_counter"):
                float_vars[k] = np.ones((), np.float32)
            elif k.endswith("update_accus"):
                continue
        int_vars = {"global_step": (250000, np.int64),
                    "global_step_disc": (500000, np.int32)}
        prefix = _write_tf_checkpoint(
            str(tmp_path / "model.ckpt-250000"), float_vars, int_vars)

        ts = export.import_reference_checkpoint(gan, prefix, batch_size=2)
        assert int(ts.step) == 250000
        # Spot-check values across every variable class at 128px shapes.
        for k in _BIGGAN128_GOLDEN:
            np.testing.assert_array_equal(np.asarray(ts.params[k]),
                                          float_vars[k], err_msg=k)
        for k in _BIGGAN128_GOLDEN_STATE:
            np.testing.assert_array_equal(np.asarray(ts.state[k]),
                                          float_vars[k], err_msg=k)
        ema_key = "generator/fc_noise/kernel"
        np.testing.assert_array_equal(
            np.asarray(ts.ema_params[ema_key]),
            float_vars[ema_key + "/ExponentialMovingAverage"])
        assert np.shape(ts.params["generator/fc_noise/kernel"]) == (20, 24576)

        # Tiny-batch EMA forward (the eval path: EMA weights + accu BN).
        z = np.random.default_rng(2).standard_normal((2, 120)).astype(
            np.float32)
        y = np.eye(1000, dtype=np.float32)[[3, 977]]
        imgs, _ = gan.sample(ts, z, labels=y)
        imgs = np.asarray(imgs)
        assert imgs.shape == (2, 128, 128, 3)
        assert np.isfinite(imgs).all()
    finally:
        datasets.set_fake_dataset(False)
        gin.clear_config()
