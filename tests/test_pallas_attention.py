"""Pallas fused attention vs the einsum reference: forward and gradients
(interpret mode on the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compare_gan_tpu.ops import pallas_attention


@pytest.fixture(autouse=True)
def _interpret():
    pallas_attention._INTERPRET = True
    yield
    pallas_attention._INTERPRET = False


def _inputs(b=2, n=64, m=16, c=8, cg=12, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    theta = jnp.asarray(rng.randn(b, n, c), dtype)
    phi = jnp.asarray(rng.randn(b, m, c), dtype)
    g = jnp.asarray(rng.randn(b, m, cg), dtype)
    return theta, phi, g


def test_forward_matches_reference():
    theta, phi, g = _inputs()
    out = pallas_attention.fused_attention(theta, phi, g)
    ref = pallas_attention.reference_attention(theta, phi, g)
    assert out.shape == ref.shape == (2, 64, 12)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_odd_row_tiles():
    # n=96 -> tile 32: exercises multi-tile accumulation paths.
    theta, phi, g = _inputs(n=96, m=24)
    out = pallas_attention.fused_attention(theta, phi, g)
    ref = pallas_attention.reference_attention(theta, phi, g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    theta, phi, g = _inputs(n=32, m=8)

    def loss_fused(t, p, gg):
        return jnp.sum(jnp.sin(pallas_attention.fused_attention(t, p, gg)))

    def loss_ref(t, p, gg):
        return jnp.sum(jnp.sin(
            pallas_attention.reference_attention(t, p, gg)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(theta, phi, g)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(theta, phi, g)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_gradient_accumulation_across_tiles():
    """dphi/dg accumulate over multiple row tiles."""
    theta, phi, g = _inputs(n=128, m=16, seed=3)

    def loss(fn):
        return jax.grad(
            lambda p: jnp.sum(fn(theta, p, g) ** 2))(phi)

    np.testing.assert_allclose(
        np.asarray(loss(pallas_attention.fused_attention)),
        np.asarray(loss(pallas_attention.reference_attention)),
        rtol=1e-4, atol=1e-5)


def test_bf16_inputs():
    theta, phi, g = _inputs(dtype=jnp.bfloat16)
    out = pallas_attention.fused_attention(theta, phi, g)
    ref = pallas_attention.reference_attention(theta, phi, g)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_non_local_block_uses_pallas_when_forced():
    from compare_gan_tpu import config as gin, core
    from compare_gan_tpu.ops import arch_ops as ops

    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 16),
                    jnp.float32)

    def block(xx):
        return ops.non_local_block(xx, "non_local_block", use_sn=False)

    out_ein, params, _ = core.init(
        lambda: block(x), jax.random.PRNGKey(0))
    gin.parse_config("attention.use_pallas = True")
    out_pl, _ = core.apply(lambda: block(x), params, {})
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ein),
                               rtol=1e-5, atol=1e-5)


def test_fused_attention_partitions_over_batch_mesh():
    """pallas_call is opaque to GSPMD/Shardy — the custom_partitioning
    rule must keep batch-sharded operands sharded (fwd AND vjp) instead
    of all-gathering and replicating the global-batch attention."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.array(jax.devices()), ("data",))
    sh = NamedSharding(mesh, P("data"))
    rng = np.random.RandomState(0)
    theta = jax.device_put(rng.randn(8, 64, 12).astype(np.float32), sh)
    phi = jax.device_put(rng.randn(8, 16, 12).astype(np.float32), sh)
    g = jax.device_put(rng.randn(8, 16, 48).astype(np.float32), sh)

    out = jax.jit(pallas_attention.fused_attention)(theta, phi, g)
    assert out.sharding.spec == P("data")
    ref = pallas_attention.reference_attention(
        np.asarray(theta), np.asarray(phi), np.asarray(g))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss(t, p, gg):
        return jnp.sum(pallas_attention.fused_attention(t, p, gg) ** 2)

    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(theta, phi, g)
    for gr in grads:
        assert gr.sharding.spec == P("data")
    ref_grads = jax.grad(
        lambda t, p, gg: jnp.sum(
            pallas_attention.reference_attention(t, p, gg) ** 2),
        argnums=(0, 1, 2))(np.asarray(theta), np.asarray(phi),
                           np.asarray(g))
    for got, want in zip(grads, ref_grads):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-3, atol=1e-3)
