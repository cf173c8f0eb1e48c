"""Weight-initializer gin selection (reference resnet_init_test.py:
initializer op regexes → here distribution checks on created params)."""

import jax
import numpy as np
import pytest

from compare_gan_tpu import config as gin
from compare_gan_tpu import core
from compare_gan_tpu.ops import arch_ops as ops


def _linear_kernel(seed=0, shape_in=256, shape_out=256):
    def fwd():
        x = np.zeros((2, shape_in), np.float32)
        return ops.linear(x, shape_out, scope="fc")

    _, params, _ = core.init(fwd, jax.random.PRNGKey(seed))
    return np.asarray(params["fc/kernel"])


def test_default_normal_init():
    k = _linear_kernel()
    assert abs(k.std() - 0.02) < 0.002
    # Normal has tails beyond 2 sigma.
    assert (np.abs(k) > 0.04).any()


def test_truncated_init():
    gin.parse_config('weights.initializer = "truncated"')
    k = _linear_kernel()
    assert abs(k.std() - 0.02 * 0.88) < 0.003  # Truncation shrinks std.
    assert (np.abs(k) <= 0.04 + 1e-6).all()  # Hard 2-sigma cut.


def test_orthogonal_init():
    gin.parse_config('weights.initializer = "orthogonal"')
    k = _linear_kernel()
    # Orthogonal: K^T K == I.
    np.testing.assert_allclose(k.T @ k, np.eye(k.shape[1]), atol=1e-4)


def test_unknown_initializer_raises():
    gin.parse_config('weights.initializer = "bogus"')
    with pytest.raises(ValueError):
        _linear_kernel()


def test_operative_config_snapshot_records_used_bindings():
    gin.parse_config('weights.initializer = "orthogonal"\n'
                     'weights.stddev = 0.05\n'
                     'spectral_norm.epsilon = 1e-10')
    _linear_kernel()
    snapshot = gin.operative_config_str()
    assert "weights.initializer = 'orthogonal'" in snapshot
    # spectral_norm never ran -> not operative.
    assert "spectral_norm.epsilon" not in snapshot
