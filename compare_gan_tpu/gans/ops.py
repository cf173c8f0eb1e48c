"""RNG aliases for GAN code (rebuild of compare_gan/gans/ops.py:24-25):
`random_uniform`/`random_normal` route to the deterministic TPU-native
stream in ops/rng.py."""

from compare_gan_tpu.ops.rng import (  # noqa: F401
    normal as random_normal,
    uniform as random_uniform,
)
