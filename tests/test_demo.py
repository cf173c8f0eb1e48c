"""examples/demo.py — the reference's colab demo surface
(colabs/ssgan_demo.ipynb): sampling honors the export's z distribution,
and --per_class_grid lays out one row per class."""

import os
import sys

import numpy as np
import pytest

import jax

from compare_gan_tpu import config as gin
from compare_gan_tpu import datasets, export
from compare_gan_tpu.gans.modular_gan import ModularGAN

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples"))
import demo  # noqa: E402


@pytest.fixture(autouse=True)
def _fake_data():
    datasets.set_fake_dataset(True)
    yield
    datasets.set_fake_dataset(False)


def _export(tmp_path, bindings=""):
    if bindings:
        gin.parse_config(bindings)
    ds = datasets.get_dataset("cifar10")
    gan = ModularGAN(dataset=ds, model_dir=str(tmp_path),
                     parameters={"architecture": "dummy_arch", "z_dim": 8,
                                 "lambda": 1}, conditional=True)
    ts = gan.init_state(jax.random.PRNGKey(0), 8)
    d = str(tmp_path / "tfhub" / "1")
    export.export_module(gan, ts, d)
    return d


def test_sample_z_honors_export_normal_binding(tmp_path):
    """BigGAN recipes bind z.distribution_fn = @tf.random.normal; demo
    sampling U(-1,1) for such an export would be off-distribution. After
    load_generator re-applies the snapshot, _sample_z must draw normal
    (values beyond |1| are a certain signature over 512 draws)."""
    d = _export(tmp_path, "z.distribution_fn = @tf.random.normal")
    export.load_generator(d)
    z = demo._sample_z(np.random.RandomState(0), 64, 8)
    assert z.dtype == np.float32
    assert np.abs(z).max() > 1.0
    assert abs(float(z.std()) - 1.0) < 0.15


def test_sample_z_default_uniform(tmp_path):
    d = _export(tmp_path)
    export.load_generator(d)
    z = demo._sample_z(np.random.RandomState(0), 64, 8)
    assert np.abs(z).max() <= 1.0


def test_demo_main_per_class_grid(tmp_path):
    """Full CLI drive: per-class grid has num_classes rows of num_cols
    images (cifar10: 10 classes, 32px)."""
    d = _export(tmp_path)
    out = str(tmp_path / "out")
    demo.FLAGS.unparse_flags()
    demo.FLAGS(["demo", f"--export_dir={d}", f"--out_dir={out}",
                "--per_class_grid", "--num_cols=3", "--num_interps=2"])
    demo.main([])
    from PIL import Image
    grid = np.asarray(Image.open(os.path.join(out, "samples.png")))
    assert grid.shape[:2] == (10 * 32, 3 * 32)
    assert os.path.exists(os.path.join(out, "interpolation.png"))
