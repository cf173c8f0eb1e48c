"""Single-linear-layer G/D for fast trainer-logic tests (rebuild of
compare_gan/test_utils.py:58-84's DUMMY_ARCH). Records call args so tests
can spy on sub-step batching like modular_gan_tpu_test.py:42-127."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from compare_gan_tpu.architectures import abstract_arch
from compare_gan_tpu.ops import arch_ops as ops


class Generator(abstract_arch.AbstractGenerator):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.call_arg_list = []

    def apply(self, z, y, is_training):
        self.call_arg_list.append(dict(z=z, y=y, is_training=is_training))
        batch_size = z.shape[0]
        out = ops.linear(z, int(np.prod(self._image_shape)),
                         scope="fc_noise")
        out = jax.nn.sigmoid(out)
        return out.reshape((batch_size,) + tuple(self._image_shape))


class Discriminator(abstract_arch.AbstractDiscriminator):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.call_arg_list = []

    def apply(self, x, y, is_training):
        self.call_arg_list.append(dict(x=x, y=y, is_training=is_training))
        h = jnp.mean(x, axis=(1, 2))
        out = ops.linear(h, 1)
        return jax.nn.sigmoid(out), out, h
