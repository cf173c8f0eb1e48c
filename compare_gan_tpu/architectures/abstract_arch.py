"""Generator/discriminator interfaces.

Rebuild of compare_gan/architectures/abstract_arch.py:29-146. Architectures
are stateless Python objects; `__call__` opens the named core scope
("generator"/"discriminator") so parameters get the same name prefixes as
the reference's variable_scope, and variable partition (G ∩ D = ∅,
modular_gan.py:345-357) falls out of `core.filter_prefix`.
"""

from __future__ import annotations

import abc

from compare_gan_tpu import config as gin
from compare_gan_tpu import core
from compare_gan_tpu import utils


class _Module(abc.ABC):
    def __init__(self, name):
        self._name = name

    @property
    def name(self):
        return self._name

    def trainable_variables(self, params):
        """Sub-pytree of `params` owned by this module. Bare string-prefix
        matching like the reference (abstract_arch.py:40-45): auxiliary
        scopes such as `discriminator_rotation` (ssgan.py:98) belong to
        the discriminator."""
        return {k: v for k, v in params.items()
                if k.startswith(self._name)}


@gin.configurable("G", denylist=["name", "image_shape"])
class AbstractGenerator(_Module):
    """Interface for generator architectures (abstract_arch.py:48-98)."""

    def __init__(self, name="generator", image_shape=None,
                 batch_norm_fn=None, spectral_norm=False):
        super().__init__(name=name)
        self._image_shape = tuple(image_shape) if image_shape else None
        self._batch_norm_fn = batch_norm_fn
        self._spectral_norm = spectral_norm

    def __call__(self, z, y, is_training):
        with core.scope(self.name):
            return self.apply(z=z, y=y, is_training=is_training)

    def batch_norm(self, inputs, **kwargs):
        if self._batch_norm_fn is None:
            return inputs
        args = dict(kwargs)
        args["x"] = inputs
        args.setdefault("use_sn", self._spectral_norm)
        return utils.call_with_accepted_args(self._batch_norm_fn, **args)

    @abc.abstractmethod
    def apply(self, z, y, is_training):
        """z: [B, z_dim]; y: [B, num_classes] one-hot or None.
        Returns images [B, H, W, C] in [0, 1]."""


@gin.configurable("D", denylist=["name"])
class AbstractDiscriminator(_Module):
    """Interface for discriminator architectures (abstract_arch.py:101-146)."""

    def __init__(self, name="discriminator", batch_norm_fn=None,
                 layer_norm=False, spectral_norm=False):
        super().__init__(name=name)
        self._batch_norm_fn = batch_norm_fn
        self._layer_norm = layer_norm
        self._spectral_norm = spectral_norm

    def __call__(self, x, y, is_training):
        with core.scope(self.name):
            return self.apply(x=x, y=y, is_training=is_training)

    def batch_norm(self, inputs, **kwargs):
        if self._batch_norm_fn is None:
            return inputs
        args = dict(kwargs)
        args["x"] = inputs
        args.setdefault("use_sn", self._spectral_norm)
        return utils.call_with_accepted_args(self._batch_norm_fn, **args)

    @abc.abstractmethod
    def apply(self, x, y, is_training):
        """Returns (prediction, logits, penultimate-layer features)."""
