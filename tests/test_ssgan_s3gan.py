"""SSGAN / S3GAN option-matrix tests (reference gans/ssgan_test.py and
gans/s3gan_test.py:37-73)."""

import jax
import numpy as np
import pytest

from compare_gan_tpu import datasets
from compare_gan_tpu.gans.s3gan import S3GAN
from compare_gan_tpu.gans.ssgan import SSGAN


@pytest.fixture(autouse=True)
def _fake_data():
    datasets.set_fake_dataset(True)
    yield
    datasets.set_fake_dataset(False)


def _batch(gan, batch_size, seed=0):
    rng = np.random.RandomState(seed)
    total = batch_size * gan.num_sub_steps
    return {"images": rng.rand(*(total,) + gan.dataset.image_shape
                               ).astype(np.float32),
            "labels": rng.randint(0, 10, total).astype(np.int32)}


def _train_one_step(gan, bs=8):
    ts = gan.init_state(jax.random.PRNGKey(0), bs)
    step = jax.jit(gan.make_train_step(bs))
    ts2, metrics = step(ts, _batch(gan, bs))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    return ts, ts2, metrics


@pytest.mark.parametrize("self_supervision",
                         ["rotation_gan", "rotation_only", "none"])
def test_ssgan_modes(self_supervision):
    ds = datasets.get_dataset("cifar10")
    gan = SSGAN(dataset=ds, model_dir="/tmp/ssgan_test",
                parameters={"architecture": "dummy_arch", "z_dim": 8,
                            "lambda": 1, "disc_iters": 1},
                self_supervision=self_supervision, rotated_batch_size=8)
    ts, ts2, _ = _train_one_step(gan)
    if "rotation" in self_supervision:
        # Rotation head exists and belongs to D's trainables.
        head = [k for k in ts.params
                if k.startswith("discriminator_rotation/")]
        assert head, sorted(ts.params)
        d_vars = gan.discriminator.trainable_variables(ts.params)
        assert all(h in d_vars for h in head)
        # And it trains on the D step.
        assert any(not np.allclose(ts.params[h], ts2.params[h])
                   for h in head)


def test_ssgan_rotation_only_freezes_gan_loss_weighting():
    ds = datasets.get_dataset("cifar10")
    gan = SSGAN(dataset=ds, model_dir="/tmp/ssgan_test2",
                parameters={"architecture": "dummy_arch", "z_dim": 8,
                            "lambda": 1, "disc_iters": 1},
                self_supervision="rotation_only", rotated_batch_size=8)
    _, _, metrics = _train_one_step(gan)
    assert np.isfinite(float(metrics["loss/g"]))


@pytest.mark.parametrize("project_y,use_predictor,use_soft_pred", [
    (False, False, False),
    (True, False, False),
    (True, True, False),
    (True, True, True),
])
def test_s3gan_head_matrix(project_y, use_predictor, use_soft_pred):
    ds = datasets.get_dataset("cifar10")
    gan = S3GAN(dataset=ds, model_dir="/tmp/s3gan_test",
                parameters={"architecture": "dummy_arch", "z_dim": 8,
                            "lambda": 1, "disc_iters": 1},
                conditional=True, self_supervision="rotation",
                rotated_batch_fraction=2, project_y=project_y,
                use_predictor=use_predictor, use_soft_pred=use_soft_pred)
    ts, ts2, _ = _train_one_step(gan)
    names = set(ts.params)
    assert any(k.startswith("discriminator_rotation/") for k in names)
    assert (any(k.startswith("discriminator_projection/") for k in names)
            == project_y)
    assert (any(k.startswith("discriminator_predictor/") for k in names)
            == use_predictor)


def test_s3gan_predictor_requires_projection():
    ds = datasets.get_dataset("cifar10")
    with pytest.raises(ValueError):
        S3GAN(dataset=ds, model_dir="/tmp/x",
              parameters={"architecture": "dummy_arch", "z_dim": 8,
                          "lambda": 1}, conditional=True,
              rotated_batch_fraction=2, project_y=False,
              use_predictor=True)


def test_fake_only_g_loss_rejected_by_subclasses():
    """SSGAN/S3GAN override create_loss without the fast path — the flag
    must be refused at construction, not silently dropped by the
    kwarg-filtered dispatch."""
    ds = datasets.get_dataset("cifar10")
    with pytest.raises(ValueError, match="g_step"):
        SSGAN(dataset=ds, model_dir="/tmp/ssgan_fake_only",
              parameters={"architecture": "dummy_arch", "z_dim": 8,
                          "lambda": 1, "disc_iters": 1},
              experimental_fake_only_g_loss=True)
