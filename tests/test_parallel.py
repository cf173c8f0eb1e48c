"""Parallelism tests on the 8-device virtual CPU mesh (replaces the
reference's 2-core-TPU-chip trick, tpu/tpu_ops_test.py:31-42; SURVEY §4).

The crown-jewel check is mesh invariance: one training step on an
8-device data mesh must produce (numerically) the same new parameters as
the same step on a single device — proving that gradient all-reduce and
global-batch losses reproduce the reference's CrossShardOptimizer + DP
semantics without hand-written collectives.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from compare_gan_tpu import datasets
from compare_gan_tpu.gans.modular_gan import ModularGAN
from compare_gan_tpu.parallel import mesh_utils, tpu_ops

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def _shard_map(fn, mesh, in_specs, out_specs):
    from jax.experimental.shard_map import shard_map
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def test_make_mesh_shapes():
    mesh = mesh_utils.make_mesh()
    assert mesh.shape["data"] == jax.device_count()
    mesh2 = mesh_utils.make_mesh(extra_axes=(("model", 2),))
    assert mesh2.shape["data"] == jax.device_count() // 2
    assert mesh2.shape["model"] == 2


def test_cross_replica_concat():
    mesh = mesh_utils.make_mesh()
    x = np.arange(16, dtype=np.float32).reshape(16, 1)

    fn = _shard_map(
        functools.partial(tpu_ops.cross_replica_concat, axis_name="data"),
        mesh, in_specs=P("data"), out_specs=P("data"))
    out = np.asarray(jax.jit(fn)(x))
    # Every replica holds the full concat; globally it's the identity
    # ordering repeated per shard slot.
    assert out.shape[0] == 16 * 8
    np.testing.assert_array_equal(out[:16, 0], np.arange(16))


def test_cross_replica_mean_groups():
    mesh = mesh_utils.make_mesh()
    x = np.arange(8, dtype=np.float32).reshape(8, 1)

    full = _shard_map(
        functools.partial(tpu_ops.cross_replica_mean, axis_name="data"),
        mesh, in_specs=P("data"), out_specs=P("data"))
    out = np.asarray(jax.jit(full)(x))
    np.testing.assert_allclose(out, 3.5)

    grouped = _shard_map(
        functools.partial(tpu_ops.cross_replica_mean, axis_name="data",
                          group_size=4),
        mesh, in_specs=P("data"), out_specs=P("data"))
    out = np.asarray(jax.jit(grouped)(x))
    np.testing.assert_allclose(out[:4], 1.5)  # mean(0..3)
    np.testing.assert_allclose(out[4:], 5.5)  # mean(4..7)


def test_cross_replica_moments_match_numpy():
    mesh = mesh_utils.make_mesh()
    x = np.random.RandomState(0).randn(32, 3).astype(np.float32)

    fn = _shard_map(
        functools.partial(tpu_ops.cross_replica_moments, axes=(0,),
                          axis_name="data"),
        mesh, in_specs=P("data"), out_specs=(P(), P()))
    mean, var = jax.jit(fn)(x)
    np.testing.assert_allclose(np.asarray(mean), x.mean(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var), x.var(0), rtol=1e-4)


def _tiny_gan(disc_iters=2):
    datasets.set_fake_dataset(True)
    ds = datasets.get_dataset("cifar10")
    return ModularGAN(
        dataset=ds, model_dir="/tmp/par_test",
        parameters={"architecture": "dummy_arch", "z_dim": 8, "lambda": 1,
                    "disc_iters": disc_iters})


def test_mesh_invariance_of_train_step():
    """8-device DP step == single-device step (same global batch)."""
    gan = _tiny_gan()
    bs = 8
    ts_single = gan.init_state(jax.random.PRNGKey(0), bs)
    ts_mesh = jax.tree_util.tree_map(jnp.copy, ts_single)

    total = bs * gan.num_sub_steps
    rng = np.random.RandomState(0)
    batch = {"images": rng.rand(total, 32, 32, 3).astype(np.float32),
             "labels": rng.randint(0, 10, total).astype(np.int32)}

    step_single = jax.jit(gan.make_train_step(bs))
    new_single, m_single = step_single(ts_single, batch)

    mesh = mesh_utils.make_mesh()
    step_mesh, shard_batch, ts_mesh = mesh_utils.compile_train_step(
        gan, ts_mesh, mesh, bs)
    new_mesh, m_mesh = step_mesh(ts_mesh, shard_batch(batch))

    np.testing.assert_allclose(float(m_single["loss/g"]),
                               float(m_mesh["loss/g"]), rtol=1e-5)
    for k in new_single.params:
        np.testing.assert_allclose(
            np.asarray(new_single.params[k]),
            np.asarray(new_mesh.params[k]), rtol=1e-4, atol=1e-6), k


def test_spatial_sharding_matches_pure_dp():
    """data x model mesh with image-height sharding == pure DP numerics
    (XLA inserts the conv halo exchanges)."""
    gan = _tiny_gan(disc_iters=1)
    bs = 8
    ts_dp = gan.init_state(jax.random.PRNGKey(0), bs)
    ts_sp = jax.tree_util.tree_map(jnp.copy, ts_dp)

    total = bs * gan.num_sub_steps
    rng = np.random.RandomState(1)
    batch = {"images": rng.rand(total, 32, 32, 3).astype(np.float32),
             "labels": rng.randint(0, 10, total).astype(np.int32)}

    mesh_dp = mesh_utils.make_mesh()
    step_dp, shard_dp, ts_dp = mesh_utils.compile_train_step(
        gan, ts_dp, mesh_dp, bs)
    new_dp, _ = step_dp(ts_dp, shard_dp(batch))

    mesh_sp = mesh_utils.make_mesh(extra_axes=(("model", 2),))
    step_sp, shard_sp, ts_sp = mesh_utils.compile_train_step(
        gan, ts_sp, mesh_sp, bs, spatial=True)
    new_sp, _ = step_sp(ts_sp, shard_sp(batch))

    for k in new_dp.params:
        np.testing.assert_allclose(np.asarray(new_dp.params[k]),
                                   np.asarray(new_sp.params[k]),
                                   rtol=1e-4, atol=1e-6), k


def test_spatial_sharding_conv_arch():
    """Spatial sharding through real convolutions (halo exchanges):
    dcgan on a 4x2 data x model mesh runs and stays finite."""
    datasets.set_fake_dataset(True)
    ds = datasets.get_dataset("cifar10")
    gan = ModularGAN(
        dataset=ds, model_dir="/tmp/par_sp",
        parameters={"architecture": "dcgan_arch", "z_dim": 8, "lambda": 1,
                    "disc_iters": 1})
    bs = 8
    ts = gan.init_state(jax.random.PRNGKey(0), bs)
    mesh = mesh_utils.make_mesh(extra_axes=(("model", 2),))
    step, shard_batch, ts = mesh_utils.compile_train_step(
        gan, ts, mesh, bs, spatial=True)
    total = bs * gan.num_sub_steps
    rng = np.random.RandomState(0)
    batch = shard_batch(
        {"images": rng.rand(total, 32, 32, 3).astype(np.float32),
         "labels": rng.randint(0, 10, total).astype(np.int32)})
    new_ts, metrics = step(ts, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)


def test_batch_not_divisible_raises():
    gan = _tiny_gan(disc_iters=0)  # num_sub_steps == 1
    ts = gan.init_state(jax.random.PRNGKey(0), 3)
    mesh = mesh_utils.make_mesh()
    with pytest.raises(ValueError):
        mesh_utils.compile_train_loop(gan, ts, mesh, 3, 2)
