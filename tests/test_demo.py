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
    sampling U(-1,1) for such an export would be off-distribution. The
    snapshot's binding must win even in a FRESH process with empty live
    gin config (round-3 review: the old query-live-bindings version was
    a no-op in real CLI use), so clear the config before sampling."""
    d = _export(tmp_path, "z.distribution_fn = @tf.random.normal")
    gin.clear_config()
    _, spec = export.load_generator(d)
    z = demo._sample_z(spec, 64, seed=0)
    assert z.dtype == np.float32
    assert z.shape == (64, 8)
    assert np.abs(z).max() > 1.0
    assert abs(float(z.std()) - 1.0) < 0.15


def test_sample_z_partial_eval_scope_override(tmp_path):
    """A snapshot binding only eval_z.stddev (no eval_z.distribution_fn)
    still selects the eval_z scope — whose default distribution is
    uniform — so the stddev knob is inert but the draw stays U(-1,1)
    (reference eval_z semantics: no fallback merging with z.*)."""
    d = _export(tmp_path, "z.distribution_fn = @tf.random.normal\n"
                          "eval_z.stddev = 2.0")
    gin.clear_config()
    _, spec = export.load_generator(d)
    z = demo._sample_z(spec, 64, seed=0)
    assert np.abs(z).max() <= 1.0


def test_sample_z_default_uniform(tmp_path):
    d = _export(tmp_path)
    gin.clear_config()
    _, spec = export.load_generator(d)
    z = demo._sample_z(spec, 64, seed=0)
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
