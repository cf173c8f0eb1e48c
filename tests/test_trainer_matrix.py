"""Trainer integration matrix (reference gans/modular_gan_test.py:56-95:
every architecture and every loss x penalty combination trains one step)."""

import jax
import numpy as np
import pytest

from compare_gan_tpu import config as gin
from compare_gan_tpu import datasets
from compare_gan_tpu.gans import consts
from compare_gan_tpu.gans.modular_gan import ModularGAN


@pytest.fixture(autouse=True)
def _fake_data():
    datasets.set_fake_dataset(True)
    yield
    datasets.set_fake_dataset(False)


def _one_step(arch, dataset_name, z_dim=16, bs=2, conditional=False):
    ds = datasets.get_dataset(dataset_name)
    gan = ModularGAN(
        dataset=ds, model_dir="/tmp/matrix_test",
        parameters={"architecture": arch, "z_dim": z_dim, "lambda": 1,
                    "disc_iters": 1}, conditional=conditional)
    ts = gan.init_state(jax.random.PRNGKey(0), bs)
    step = jax.jit(gan.make_train_step(bs))
    total = bs * gan.num_sub_steps
    rng = np.random.RandomState(0)
    batch = {"images": rng.rand(*(total,) + ds.image_shape
                                ).astype(np.float32),
             "labels": rng.randint(0, max(ds.num_classes or 1, 1),
                                   total).astype(np.int32)}
    ts, metrics = step(ts, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (arch, k, v)


# Architecture x dataset resolution (reference architectures_test.py +
# modular_gan_test matrix; biggan variants covered in other tests).
ARCH_CASES = [
    (consts.DCGAN_ARCH, "cifar10"),
    (consts.SNDCGAN_ARCH, "cifar10"),
    (consts.RESNET_CIFAR_ARCH, "cifar10"),
    (consts.INFOGAN_ARCH, "mnist"),
    (consts.RESNET_STL_ARCH, "cifar10"),
]


@pytest.mark.parametrize("arch,dataset_name", ARCH_CASES)
def test_arch_trains_one_step(arch, dataset_name):
    if arch == consts.RESNET_STL_ARCH:
        pytest.skip("STL needs 48px data; covered by build tests.")
    _one_step(arch, dataset_name)


LOSSES = ["non_saturating", "wasserstein", "least_squares", "hinge"]
PENALTIES = ["no_penalty", "wgangp_penalty", "dragan_penalty", "l2_penalty"]


@pytest.mark.parametrize("loss", LOSSES)
@pytest.mark.parametrize("penalty", PENALTIES)
def test_loss_penalty_matrix(loss, penalty):
    gin.parse_config(f"loss.fn = @{loss}\npenalty.fn = @{penalty}")
    _one_step("dummy_arch", "cifar10", z_dim=8, bs=4)


@pytest.mark.parametrize("arch,extra_gin", [
    # SN conv D: second-order gradient flows through the spectral-norm
    # power iteration (sigma is differentiable in w).
    (consts.SNDCGAN_ARCH, "D.spectral_norm = True"),
    # BN D: second-order gradient through training-mode batch moments
    # (the grad-of-grad-through-state path dummy_arch can't exercise;
    # reference modular_gan_test.py:56-95 runs penalties on real archs).
    (consts.DCGAN_ARCH, "D.batch_norm_fn = @batch_norm"),
])
@pytest.mark.parametrize("penalty", ["wgangp_penalty", "dragan_penalty"])
def test_penalty_on_real_architectures(arch, extra_gin, penalty):
    gin.parse_config(f"penalty.fn = @{penalty}\n{extra_gin}")
    _one_step(arch, "cifar10", z_dim=8, bs=2)


def test_fit_label_distribution_uses_real_labels():
    """fit_label_distribution=True: sampled labels == data labels
    (modular_gan.py:402-405)."""
    ds = datasets.get_dataset("cifar10")
    gan = ModularGAN(
        dataset=ds, model_dir="/tmp/matrix_fld",
        parameters={"architecture": "dummy_arch", "z_dim": 8, "lambda": 1},
        conditional=True, fit_label_distribution=True)
    from compare_gan_tpu.ops import rng as random
    labels = np.arange(4, dtype=np.int32) % 10
    with random.rng_context(jax.random.PRNGKey(0)):
        features = gan._draw_sub_step_inputs(4, labels)
    np.testing.assert_array_equal(np.asarray(features["sampled_labels"]),
                                  labels)


def test_soft_labels_pass_through():
    ds = datasets.get_dataset("cifar10")
    gan = ModularGAN(
        dataset=ds, model_dir="/tmp/matrix_soft",
        parameters={"architecture": "dummy_arch", "z_dim": 8, "lambda": 1},
        conditional=True)
    soft = np.full((4, 10), 0.1, np.float32)
    out = gan._get_one_hot_labels(jax.numpy.asarray(soft))
    np.testing.assert_allclose(np.asarray(out), soft)
