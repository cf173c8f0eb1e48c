"""TF->JAX checkpoint importer: reference-shaped TF Saver checkpoints
load into a TrainState (export.import_reference_checkpoint; reference
Saver checkpoints runner_lib.py:258-264, EMA/custom-getter semantics
modular_gan.py:266-306)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from compare_gan_tpu import config as gin
from compare_gan_tpu import datasets, export
from compare_gan_tpu.gans.modular_gan import ModularGAN

tf = pytest.importorskip("tensorflow")


@pytest.fixture(autouse=True)
def _fake_data():
    datasets.set_fake_dataset(True)
    yield
    datasets.set_fake_dataset(False)


def _write_tf_checkpoint(prefix, float_vars, int_vars=()):
    """Write a genuine TF1 Saver checkpoint with exact variable names."""
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


def _rand_like(rng, v, name=""):
    """Random float32 array of v's shape (handles scalar state like
    accu_counter). Variance/counter state is kept positive so a forward
    through the imported stats stays finite."""
    arr = np.asarray(rng.standard_normal(np.shape(v)), np.float32)
    if name.endswith(("variance", "counter")):
        arr = np.abs(arr) + 0.5
    return arr


def _make_gan(arch, conditional=False, g_use_ema=False, z_dim=128):
    ds = datasets.get_dataset("cifar10")
    return ModularGAN(
        dataset=ds, model_dir="/tmp/tf_import_test",
        parameters={"architecture": arch, "z_dim": z_dim, "lambda": 1,
                    "disc_iters": 1},
        conditional=conditional, g_use_ema=g_use_ema)


# The reference's golden variable names for the default resnet_cifar G/D
# (reference architectures/resnet_norm_test.py:41-110) — hardcoded, NOT
# derived from our trees, so this test breaks if our naming drifts.
_CIFAR_G_GOLDEN = ["generator/fc_noise/kernel", "generator/fc_noise/bias"]
for _b in ("B1", "B2", "B3"):
    _CIFAR_G_GOLDEN += [
        f"generator/{_b}/up_conv_shortcut/kernel",
        f"generator/{_b}/up_conv_shortcut/bias",
        f"generator/{_b}/up_conv1/kernel",
        f"generator/{_b}/up_conv1/bias",
        f"generator/{_b}/same_conv2/kernel",
        f"generator/{_b}/same_conv2/bias",
    ]
_CIFAR_G_GOLDEN += ["generator/final_conv/kernel",
                    "generator/final_conv/bias"]

_CIFAR_D_GOLDEN = []
for _b, _pre in (("B1", "down"), ("B2", "down"), ("B3", "same"),
                 ("B4", "same")):
    _CIFAR_D_GOLDEN += [
        f"discriminator/{_b}/{_pre}_conv_shortcut/kernel",
        f"discriminator/{_b}/{_pre}_conv_shortcut/bias",
        f"discriminator/{_b}/same_conv1/kernel",
        f"discriminator/{_b}/same_conv1/bias",
        f"discriminator/{_b}/{'down' if _pre == 'down' else 'same'}_conv2/kernel",
        f"discriminator/{_b}/{'down' if _pre == 'down' else 'same'}_conv2/bias",
    ]
_CIFAR_D_GOLDEN += ["discriminator/disc_final_fc/kernel",
                    "discriminator/disc_final_fc/bias"]


def test_import_resnet_cifar_reference_checkpoint(tmp_path):
    """A reference-shaped checkpoint for resnet_cifar (golden variable
    names, SN u_var in D, BN moving stats in G, EMA shadows, both step
    counters, Adam slots to skip) imports exactly."""
    gin.parse_config("G.batch_norm_fn = @batch_norm\n"
                     "D.spectral_norm = True")
    gan = _make_gan("resnet_cifar_arch", g_use_ema=True)
    template = gan.init_state(jax.random.PRNGKey(0), 2)

    # Golden names must cover the template's params exactly.
    golden = set(_CIFAR_G_GOLDEN + _CIFAR_D_GOLDEN)
    bn_params = {k for k in template.params
                 if k.endswith(("gamma", "beta"))}
    assert golden == set(template.params) - bn_params, (
        sorted(golden ^ (set(template.params) - bn_params))[:6])

    rng = np.random.RandomState(7)
    float_vars = {k: _rand_like(rng, v) for k, v in template.params.items()}
    # State: u_var for every D kernel, moving stats for G BN.
    for k, v in template.state.items():
        float_vars[k] = _rand_like(rng, v, name=k)
    # EMA shadows for every G param.
    for k in template.ema_params:
        float_vars[k + "/ExponentialMovingAverage"] = _rand_like(
            rng, template.params[k])
    # Optimizer slots that must be skipped.
    float_vars["generator/fc_noise/kernel/Adam"] = np.zeros(
        np.shape(template.params["generator/fc_noise/kernel"]), np.float32)
    float_vars["generator/fc_noise/kernel/Adam_1"] = np.zeros(
        np.shape(template.params["generator/fc_noise/kernel"]), np.float32)
    int_vars = {"global_step": (1234, np.int64),
                "global_step_disc": (2468, np.int32),
                "beta1_power": (0, np.int32)}

    prefix = _write_tf_checkpoint(str(tmp_path / "model.ckpt-1234"),
                                  float_vars, int_vars)
    ts = export.import_reference_checkpoint(gan, prefix, batch_size=2)

    assert int(ts.step) == 1234 and int(ts.disc_step) == 2468
    for k, v in ts.params.items():
        np.testing.assert_array_equal(np.asarray(v), float_vars[k])
    for k, v in ts.state.items():
        np.testing.assert_array_equal(np.asarray(v), float_vars[k])
    for k, v in ts.ema_params.items():
        np.testing.assert_array_equal(
            np.asarray(v), float_vars[k + "/ExponentialMovingAverage"])
    # And the imported state is usable: one G forward, finite, in [0,1].
    imgs, _ = gan.sample(ts, np.zeros((2, 128), np.float32))
    assert np.isfinite(np.asarray(imgs)).all()


def test_import_missing_variable_raises(tmp_path):
    gan = _make_gan("dummy_arch", z_dim=8)
    template = gan.init_state(jax.random.PRNGKey(0), 2)
    float_vars = {k: np.asarray(v) for k, v in template.params.items()}
    dropped = sorted(float_vars)[0]
    del float_vars[dropped]
    prefix = _write_tf_checkpoint(str(tmp_path / "model.ckpt-1"),
                                  float_vars)
    with pytest.raises(ValueError, match="Missing"):
        export.import_reference_checkpoint(gan, prefix, batch_size=2)


def test_import_dummy_arch_numpy_forward(tmp_path):
    """End-to-end value check against an independent NumPy
    re-implementation of the loaded weights (dummy_arch G is a single
    sigmoid linear layer)."""
    gan = _make_gan("dummy_arch", z_dim=8)
    template = gan.init_state(jax.random.PRNGKey(0), 2)
    rng = np.random.RandomState(3)
    float_vars = {k: rng.randn(*np.shape(v)).astype(np.float32) * 0.1
                  for k, v in template.params.items()}
    prefix = _write_tf_checkpoint(str(tmp_path / "model.ckpt-7"),
                                  float_vars)
    ts = export.import_reference_checkpoint(gan, prefix, batch_size=2)

    z = rng.randn(4, 8).astype(np.float32)
    got, _ = gan.sample(ts, z)
    kernel_name = [k for k in float_vars if k.endswith("kernel")
                   and k.startswith("generator/")][0]
    bias_name = kernel_name.rsplit("/", 1)[0] + "/bias"
    pre = z @ float_vars[kernel_name] + float_vars[bias_name]
    want = (1.0 / (1.0 + np.exp(-pre))).reshape(4, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                               atol=1e-5)


def test_import_biggan32_conditional(tmp_path):
    """Conditional BigGAN-32 (SN everywhere, conditional BN, embed_y,
    attention) round-trips through a reference-shaped checkpoint."""
    gin.parse_config("G.spectral_norm = True\n"
                     "D.spectral_norm = True\n"
                     "G.batch_norm_fn = @conditional_batch_norm")
    gan = _make_gan("resnet_biggan_arch", conditional=True, z_dim=120,
                    g_use_ema=True)
    template = gan.init_state(jax.random.PRNGKey(1), 2)
    # Spot-check reference-style scopes exist (non-circular anchors).
    for anchor in ["generator/embed_y/kernel",
                   "generator/fc_noise/kernel",
                   "discriminator/final_fc/kernel"]:
        assert anchor in template.params, sorted(template.params)[:12]

    rng = np.random.RandomState(11)
    float_vars = {}
    for tree in (template.params, template.state):
        for k, v in tree.items():
            float_vars[k] = _rand_like(rng, v)
    for k in template.ema_params:
        float_vars[k + "/ExponentialMovingAverage"] = _rand_like(
            rng, template.params[k])
    int_vars = {"global_step": (9, np.int64),
                "global_step_disc": (18, np.int32)}
    prefix = _write_tf_checkpoint(str(tmp_path / "model.ckpt-9"),
                                  float_vars, int_vars)
    ts = export.import_reference_checkpoint(gan, prefix, batch_size=2)
    assert int(ts.step) == 9
    for k, v in ts.ema_params.items():
        np.testing.assert_array_equal(
            np.asarray(v), float_vars[k + "/ExponentialMovingAverage"])
    for k, v in ts.state.items():
        np.testing.assert_array_equal(np.asarray(v), float_vars[k])


def test_export_then_import_roundtrip_bitwise(tmp_path):
    """export_reference_checkpoint -> import_reference_checkpoint is
    bitwise: our trained TrainStates are consumable by the reference
    (same Saver layout) and re-importable without loss."""
    gin.parse_config("G.batch_norm_fn = @batch_norm\n"
                     "D.spectral_norm = True")
    gan = _make_gan("resnet_cifar_arch", g_use_ema=True)
    ts = gan.init_state(jax.random.PRNGKey(5), 2)
    # One train step so moving stats / u_var / EMA diverge from init.
    step = jax.jit(gan.make_train_step(2))
    rng = np.random.RandomState(0)
    total = 2 * gan.num_sub_steps
    ts, _ = step(ts, {
        "images": rng.rand(total, 32, 32, 3).astype(np.float32),
        "labels": rng.randint(0, 10, total).astype(np.int32)})

    prefix = export.export_reference_checkpoint(
        gan, ts, str(tmp_path / "model.ckpt-1"))
    ts2 = export.import_reference_checkpoint(gan, prefix, batch_size=2)
    assert int(ts2.step) == int(ts.step)
    assert int(ts2.disc_step) == int(ts.disc_step)
    for tree, tree2 in [(ts.params, ts2.params), (ts.state, ts2.state),
                        (ts.ema_params, ts2.ema_params)]:
        assert set(tree) == set(tree2)
        for k in tree:
            np.testing.assert_array_equal(np.asarray(tree[k]),
                                          np.asarray(tree2[k]))
