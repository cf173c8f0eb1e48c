"""Every shipped example config parses and constructs its GAN
(the reference's configs work unchanged — the compatibility contract)."""

import glob
import os

import pytest

from compare_gan_tpu import config as gin
from compare_gan_tpu import datasets, runner_lib
import compare_gan_tpu.gans  # noqa: F401

CONFIGS = sorted(glob.glob(
    os.path.join(os.path.dirname(__file__), "..", "example_configs",
                 "*.gin")))


@pytest.fixture(autouse=True)
def _fake_data():
    datasets.set_fake_dataset(True)
    yield
    datasets.set_fake_dataset(False)


@pytest.mark.parametrize("path", CONFIGS, ids=os.path.basename)
def test_config_constructs_gan(path):
    gin.parse_config_files_and_bindings([path], [])
    options = runner_lib.get_options_dict()
    dataset = datasets.get_dataset()
    gan = options["gan_class"](dataset=dataset, parameters=options,
                               model_dir="/tmp/cfg_test")
    assert gan.generator is not None
    assert gan.discriminator is not None
    assert options["batch_size"] > 0


def test_expected_configs_shipped():
    names = {os.path.basename(p) for p in CONFIGS}
    assert names == {"biggan_imagenet128.gin", "dcgan_celeba64.gin",
                     "resnet_cifar10.gin", "resnet_lsun-bedroom128.gin",
                     "sndcgan_celebahq128.gin"}
