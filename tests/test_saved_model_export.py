"""jax2tf SavedModel export (serving parity with the reference's TF-Hub
modules and their per-batch-size signatures, modular_gan.py:289-306)."""

import numpy as np
import pytest

import jax

from compare_gan_tpu import datasets, export
from compare_gan_tpu.gans.modular_gan import ModularGAN

tf = pytest.importorskip("tensorflow")


@pytest.fixture(autouse=True)
def _fake_data():
    datasets.set_fake_dataset(True)
    yield
    datasets.set_fake_dataset(False)


def test_saved_model_matches_jax(tmp_path):
    ds = datasets.get_dataset("cifar10")
    gan = ModularGAN(dataset=ds, model_dir=str(tmp_path),
                     parameters={"architecture": "dummy_arch", "z_dim": 8,
                                 "lambda": 1}, conditional=True)
    ts = gan.init_state(jax.random.PRNGKey(0), 8)
    d = str(tmp_path / "saved_model")
    export.export_saved_model(gan, ts, d, batch_sizes=(8, 16))

    loaded = tf.saved_model.load(d)
    assert set(loaded.signatures) == {"gen_bs8", "gen_bs16"}
    z = np.random.RandomState(0).uniform(-1, 1, (8, 8)).astype(np.float32)
    labels = (np.arange(8) % 10).astype(np.int32)
    out = loaded.signatures["gen_bs8"](z=tf.constant(z),
                                       labels=tf.constant(labels))
    tf_images = list(out.values())[0].numpy()
    jax_images, _ = gan.sample(ts, z, labels=labels)
    np.testing.assert_allclose(tf_images, np.asarray(jax_images),
                               atol=1e-5)
