"""Module export round-trip + BN-accumulator eval protocol
(reference modular_gan.py:225-306 hub export; eval_gan_lib.py:65-92
accumulator filling; runner_lib_test.py:217-255)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compare_gan_tpu import config as gin
from compare_gan_tpu import datasets, eval_gan_lib, export
from compare_gan_tpu.gans.modular_gan import ModularGAN


@pytest.fixture(autouse=True)
def _fake_data():
    datasets.set_fake_dataset(True)
    yield
    datasets.set_fake_dataset(False)


def _gan(arch="dummy_arch", **kwargs):
    ds = datasets.get_dataset("cifar10")
    return ModularGAN(dataset=ds, model_dir="/tmp/export_test",
                      parameters={"architecture": arch, "z_dim": 8,
                                  "lambda": 1, "disc_iters": 1}, **kwargs)


def test_export_roundtrip_generator_and_discriminator(tmp_path):
    gan = _gan(g_use_ema=True)
    ts = gan.init_state(jax.random.PRNGKey(0), 4)
    d = str(tmp_path / "mod")
    export.export_module(gan, ts, d)
    assert os.path.exists(os.path.join(d, "module.npz"))

    generate, spec = export.load_generator(d)
    assert spec["z_dim"] == 8 and spec["tags"] == ["gen", "disc"]
    z = np.random.RandomState(0).uniform(-1, 1, (5, 8)).astype(np.float32)
    imgs = generate(jnp.asarray(z))
    assert imgs.shape == (5, 32, 32, 3)
    # Export uses EMA params: must match gan.sample with EMA.
    expected, _ = gan.sample(ts, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(imgs), np.asarray(expected),
                               atol=1e-6)

    discriminate, _ = export.load_discriminator(d)
    pred, logits, feats = discriminate(imgs)
    assert pred.shape == (5, 1) and logits.shape == (5, 1)


def test_bn_accumulator_protocol():
    """With accumulator BN (use_moving_averages=False), the eval fill pass
    increments accu counters and resets the update switch to 0."""
    gin.parse_config("""
G.batch_norm_fn = @batch_norm
standardize_batch.use_moving_averages = False
""")
    gan = _gan(arch="resnet_cifar_arch")
    gan._parameters["z_dim"] = 128
    gan._z_dim = 128
    ts = gan.init_state(jax.random.PRNGKey(0), 4)
    switches = [k for k in ts.state if "accu/update_accus" in k]
    counters = [k for k in ts.state if "accu_counter" in k]
    assert switches and counters

    state, had = eval_gan_lib._update_bn_accumulators(
        gan, ts, batch_size=4, num_accu_examples=16)
    assert had
    for k in switches:
        assert int(state[k]) == 0
    for k in counters:
        # 16 examples / 4 per batch = 4 accumulation steps.
        np.testing.assert_allclose(np.asarray(state[k]), 4.0, atol=1e-3)


def test_no_accumulators_is_noop():
    gan = _gan()
    ts = gan.init_state(jax.random.PRNGKey(0), 4)
    state, had = eval_gan_lib._update_bn_accumulators(
        gan, ts, batch_size=4, num_accu_examples=16)
    assert not had
