"""GAN trainers. Importing this package registers every configurable the
reference exposes through gin (losses, penalties, optimizers, GAN classes,
z sampler) so `.gin` configs resolve their @references."""

from compare_gan_tpu.gans import consts  # noqa: F401
from compare_gan_tpu.gans import loss_lib  # noqa: F401
from compare_gan_tpu.gans import optimizers  # noqa: F401
from compare_gan_tpu.gans import penalty_lib  # noqa: F401
from compare_gan_tpu.gans.modular_gan import ModularGAN  # noqa: F401
from compare_gan_tpu.gans.s3gan import S3GAN  # noqa: F401
from compare_gan_tpu.gans.ssgan import SSGAN  # noqa: F401
