"""compare_gan_tpu: a TPU-native (JAX/XLA/pjit/Pallas) GAN framework with the
capabilities of google/compare_gan.

The compute path is pure JAX: one jitted train step per experiment, global-
batch math sharded over a `jax.sharding.Mesh`, XLA-inserted ICI collectives
for gradient all-reduce and cross-replica batch norm, Pallas kernels for the
hot ops. Public surface mirrors the reference: gin-style configs, the
train / continuous_eval / eval_after_train schedules, the gin-selected GAN
zoo (DCGAN, SN-DCGAN, ResNet variants, BigGAN, BigGAN-deep), and the full
metric stack (FID, IS, KID, MS-SSIM, PRD, fractal dimension, ...) — with
evaluation running *on TPU*, lifting the reference's "evaluation on TPUs is
not supported" limitation (reference README.md:113-115).
"""

__version__ = "0.1.0"
