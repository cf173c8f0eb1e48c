"""Golden structural tests: exact variable names + shapes per
normalization scheme (rebuild of reference
architectures/resnet_norm_test.py:31-370). Names must match the
reference's variable_scope layout so checkpoints and configs stay
mentally mappable."""

import jax
import numpy as np
import pytest

from compare_gan_tpu import config as gin
from compare_gan_tpu import core
from compare_gan_tpu.architectures import resnet_cifar


def _build_discriminator():
    disc = resnet_cifar.Discriminator()
    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)

    def fwd():
        return disc(x, None, True)

    _, params, state = core.init(fwd, jax.random.PRNGKey(0))
    return params, state


def _build_generator():
    gen = resnet_cifar.Generator(image_shape=(32, 32, 3))
    z = np.random.RandomState(0).rand(2, 128).astype(np.float32)

    def fwd():
        return gen(z, None, True)

    _, params, state = core.init(fwd, jax.random.PRNGKey(0))
    return params, state


def test_discriminator_default_no_extra_state():
    params, state = _build_discriminator()
    # Default D: plain convs, no BN, no SN => no state at all.
    assert state == {}
    # Conv scopes are "<scale>_<suffix>" like the reference resnet_ops
    # (same_conv1 / down_conv2 / conv_shortcut).
    assert "discriminator/B1/same_conv1/kernel" in params
    assert "discriminator/B1/down_conv2/kernel" in params
    assert "discriminator/B1/same_conv1/bias" in params


def test_discriminator_spectral_norm_u_vars():
    gin.parse_config("D.spectral_norm = True")
    params, state = _build_discriminator()
    # Every conv/linear kernel gets a persisted u_var next to it
    # (reference arch_ops.py:453-535 'u_var'; resnet_norm_test asserts
    # names like discriminator/B1/conv1/kernel/u_var).
    kernels = [k for k in params if k.endswith("/kernel")]
    for k in kernels:
        assert f"{k}/u_var" in state, (k, sorted(state)[:8])
    assert len(state) == len(kernels)


def test_discriminator_layer_norm_variables():
    gin.parse_config("D.layer_norm = True")
    params, state = _build_discriminator()
    assert state == {}
    ln = [k for k in params if "/ln1/" in k or "/ln2/" in k]
    assert any(k.endswith("gamma") for k in ln)
    assert any(k.endswith("beta") for k in ln)


def test_generator_batch_norm_moving_stats():
    gin.parse_config("G.batch_norm_fn = @batch_norm")
    params, state = _build_generator()
    # bn1/bn2 per block + final_norm, each with gamma/beta params and
    # moving_mean/moving_variance state.
    for scope in ["generator/B1/bn1", "generator/B1/bn2",
                  "generator/final_norm"]:
        assert f"{scope}/gamma" in params, sorted(params)[:10]
        assert f"{scope}/beta" in params
        assert f"{scope}/moving_mean" in state
        assert f"{scope}/moving_variance" in state
    # Channel-shaped.
    assert state["generator/B1/bn1/moving_mean"].shape == (256,)


def test_generator_accumulated_bn_variables():
    gin.parse_config("G.batch_norm_fn = @batch_norm\n"
                     "standardize_batch.use_moving_averages = False")
    params, state = _build_generator()
    # Accumulator naming (reference arch_ops.py:122-191):
    # accu/accu_mean, accu/accu_variance, accu/accu_counter,
    # accu/update_accus.
    scope = "generator/B1/bn1/accu"
    for name in ["accu_mean", "accu_variance", "accu_counter",
                 "update_accus"]:
        assert f"{scope}/{name}" in state, sorted(state)[:10]
    assert state[f"{scope}/update_accus"].dtype == np.int32


def test_generator_self_modulation_mlp():
    gin.parse_config("G.batch_norm_fn = @self_modulated_batch_norm")
    params, state = _build_generator()
    # sbn MLP per BN site (reference arch_ops.py:370-420 'sbn' scope).
    assert "generator/B1/bn1/sbn/hidden/kernel" in params
    assert "generator/B1/bn1/sbn/gamma/kernel" in params
    assert "generator/B1/bn1/sbn/beta/kernel" in params


def test_generator_conditional_bn_requires_y():
    gin.parse_config("G.batch_norm_fn = @conditional_batch_norm")
    with pytest.raises(ValueError):
        _build_generator()  # y=None must fail (arch_ops.py:423-445).


def test_spectral_norm_and_bn_compose():
    gin.parse_config("G.batch_norm_fn = @batch_norm\n"
                     "G.spectral_norm = True")
    params, state = _build_generator()
    assert "generator/B1/up_conv1/kernel/u_var" in state
    assert "generator/B1/bn1/moving_mean" in state
