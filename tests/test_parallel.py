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


def test_default_compiler_options_off_tpu():
    # CPU/GPU XLA reject xla_tpu_* options: the production default must be
    # None here so compile_train_loop's lazy-jit path is untouched.
    assert mesh_utils.default_tpu_compiler_options() is None


def test_aot_on_first_call_compiles_once_and_delegates():
    calls = []

    class FakeCompiled:
        def __call__(self, *args):
            return ("ran", args)

    class FakeLowered:
        def compile(self, compiler_options=None):
            calls.append(dict(compiler_options))
            return FakeCompiled()

    class FakeJitted:
        def lower(self, *args):
            return FakeLowered()

    run = mesh_utils._aot_on_first_call(
        FakeJitted(), {"xla_tpu_copy_insertion_use_region_analysis": "true"})
    assert run(1, 2) == ("ran", (1, 2))
    assert run(3, 4) == ("ran", (3, 4))  # reuses the compiled executable
    assert calls == [
        {"xla_tpu_copy_insertion_use_region_analysis": "true"}]


# ---------------------------------------------------------------------------
# Mesh-invariance goldens for the HARD state (r1 VERDICT Next #2, #10):
# cross-replica BN moments, spectral-norm u_var updates, EMA — compared as
# full TrainState pytrees, not just params.
# ---------------------------------------------------------------------------


# On step 1 Adam's update is g/(|g|+eps)*lr: for near-zero gradient
# elements (|g| ~ eps) the update is violently sensitive to float
# reduction-order noise — 64% of a bias can differ by ~lr/2 between two
# bit-different but both-correct executions. Binding a large epsilon makes
# the update LINEAR in the gradient, so the comparison actually measures
# DP consistency (grads, BN moments, SN u_var) instead of noise
# amplification through rsqrt.
_LINEAR_ADAM = """
ModularGAN.g_optimizer_fn = @AdamOptimizer
ModularGAN.d_optimizer_fn = @AdamOptimizer
AdamOptimizer.epsilon = 1e-3
"""


def _assert_trees_close(a, b, rtol=1e-4, atol=1e-4):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert len(la) == len(lb)
    for (pa, va), (pb, vb) in zip(la, lb):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(pa))


def _mesh_vs_single(gan, bs, seed=0):
    """One train step on 1 device vs the 8-device data mesh, same global
    batch. Returns both new TrainStates."""
    ts_single = gan.init_state(jax.random.PRNGKey(0), bs)
    ts_mesh = jax.tree_util.tree_map(jnp.copy, ts_single)
    total = bs * gan.num_sub_steps
    rng = np.random.RandomState(seed)
    shape = (total,) + gan.dataset.image_shape
    nc = gan.dataset.num_classes or 10
    batch = {"images": rng.rand(*shape).astype(np.float32),
             "labels": rng.randint(0, nc, total).astype(np.int32)}
    new_single, _ = jax.jit(gan.make_train_step(bs))(ts_single, batch)
    mesh = mesh_utils.make_mesh()
    step_mesh, shard_batch, ts_mesh = mesh_utils.compile_train_step(
        gan, ts_mesh, mesh, bs)
    new_mesh, _ = step_mesh(ts_mesh, shard_batch(batch))
    return new_single, new_mesh


def test_mesh_invariance_bn_sn_resnet_cifar():
    """resnet_cifar with standardize_batch BN + spectral norm everywhere:
    params, BN moving_* and SN u_var must all be mesh-invariant (the
    reference's hardest DP semantics — cross-replica BN per sub-step,
    arch_ops.py:194-304 + CrossShardOptimizer)."""
    from compare_gan_tpu import config as gin
    gin.parse_config(_LINEAR_ADAM + """
G.batch_norm_fn = @standardize_batch
G.spectral_norm = True
D.spectral_norm = True
standardize_batch.decay = 0.9
""")
    datasets.set_fake_dataset(True)
    gan = ModularGAN(
        dataset=datasets.get_dataset("cifar10"), model_dir="/tmp/par_bnsn",
        parameters={"architecture": "resnet_cifar_arch", "z_dim": 8,
                    "lambda": 1, "disc_iters": 1})
    new_single, new_mesh = _mesh_vs_single(gan, 8)
    # The hard state must actually exist in this config.
    state_keys = "\n".join(str(k) for k, _ in
                           jax.tree_util.tree_leaves_with_path(
                               new_single.state))
    assert "u_var" in state_keys, state_keys
    assert "moving_mean" in state_keys, state_keys
    _assert_trees_close(new_single, new_mesh)
    gin.clear_config()


def test_mesh_invariance_conditional_biggan32():
    """One conditional BigGAN-32 step (cBN + SN + EMA + hinge, the recipe
    semantics) on 8 devices == 1 device, full TrainState."""
    from compare_gan_tpu import config as gin
    gin.parse_config(_LINEAR_ADAM + """
weights.initializer = "orthogonal"
G.batch_norm_fn = @conditional_batch_norm
G.spectral_norm = True
D.spectral_norm = True
loss.fn = @hinge
standardize_batch.decay = 0.9
""")
    datasets.set_fake_dataset(True)
    gan = ModularGAN(
        dataset=datasets.get_dataset("cifar10"), model_dir="/tmp/par_bg32",
        parameters={"architecture": "resnet_biggan_arch", "z_dim": 120,
                    "lambda": 1, "disc_iters": 1},
        conditional=True, g_use_ema=True)
    new_single, new_mesh = _mesh_vs_single(gan, 8)
    _assert_trees_close(new_single, new_mesh)
    gin.clear_config()


def test_group_bn_matches_reference_group_semantics():
    """num_batch_groups=2 under the mesh == single device == a NumPy
    oracle of the reference's group_assignment semantics (contiguous
    replica subgroups, tpu/tpu_ops.py:75-91)."""
    from jax.sharding import NamedSharding
    from compare_gan_tpu import core
    from compare_gan_tpu.ops import arch_ops

    x = np.random.RandomState(0).randn(8, 4, 4, 3).astype(np.float32)

    def f(x_):
        return arch_ops.standardize_batch(
            x_, is_training=True, num_batch_groups=2, decay=0.9)

    _, params, state = core.init(f, jax.random.PRNGKey(0), x)

    def apply_fn(x_):
        return core.apply(f, params, state, x_)

    out1, st1 = jax.jit(apply_fn)(x)
    mesh = mesh_utils.make_mesh()
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    out8, st8 = jax.jit(apply_fn)(xs)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out8),
                               rtol=1e-5, atol=1e-6)
    _assert_trees_close(st1, st8, rtol=1e-5, atol=1e-6)

    # Reference oracle: moments per contiguous half of the global batch
    # (= replica groups {0..3}, {4..7} under contiguous batch sharding).
    xg = x.reshape(2, 4, 4, 4, 3)
    mean_g = xg.mean(axis=(1, 2, 3), keepdims=True)
    var_g = (xg ** 2).mean(axis=(1, 2, 3), keepdims=True) - mean_g ** 2
    oracle = ((xg - mean_g) / np.sqrt(var_g + 1e-3)).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(out1), oracle, rtol=1e-4,
                               atol=1e-5)


def test_ssgan_mesh_invariance():
    """SSGAN concatenates rotated batches inside the step — exactly the
    batch-dim bookkeeping where DP breaks silently (reference
    ssgan.py:130-175). Full-state invariance, 8 devices vs 1."""
    from compare_gan_tpu.gans.ssgan import SSGAN
    datasets.set_fake_dataset(True)
    gan = SSGAN(
        dataset=datasets.get_dataset("cifar10"), model_dir="/tmp/par_ss",
        parameters={"architecture": "dummy_arch", "z_dim": 8, "lambda": 1,
                    "disc_iters": 1},
        self_supervision="rotation_gan", rotated_batch_size=8)
    new_single, new_mesh = _mesh_vs_single(gan, 8)
    _assert_trees_close(new_single, new_mesh)


def test_s3gan_mesh_invariance():
    """S3GAN's predictor/projection heads + soft-label paths under the
    mesh (reference s3gan.py:96-193)."""
    from compare_gan_tpu.gans.s3gan import S3GAN
    datasets.set_fake_dataset(True)
    gan = S3GAN(
        dataset=datasets.get_dataset("cifar10"), model_dir="/tmp/par_s3",
        parameters={"architecture": "dummy_arch", "z_dim": 8, "lambda": 1,
                    "disc_iters": 1},
        conditional=True, self_supervision="rotation",
        rotated_batch_fraction=2, project_y=True, use_predictor=True)
    new_single, new_mesh = _mesh_vs_single(gan, 8)
    _assert_trees_close(new_single, new_mesh)


@pytest.mark.slow
def test_spatial_sharding_biggan32_with_attention():
    """The advertised extension composed end-to-end (round-4 verdict #5):
    `compile_train_step(spatial=True)` on a BigGAN-class model WITH the
    non-local block, so the Pallas attention custom_partitioning rule
    runs INSIDE a spatially sharded train step (not just in isolation).
    The (data, model=2) mesh must match pure-DP numerics and stay
    finite. ch=16 keeps the CPU compile tractable; semantics (SN, cBN,
    hierarchical z, projection D, attention in G's B2 and D's default
    B1) are the full BigGAN-32 recipe."""
    from compare_gan_tpu import config as gin
    from compare_gan_tpu.ops import pallas_attention

    datasets.set_fake_dataset(True)
    gin.parse_config("""
G.batch_norm_fn = @conditional_batch_norm
G.spectral_norm = True
D.spectral_norm = True
resnet_biggan.Generator.hierarchical_z = True
resnet_biggan.Generator.embed_y = True
resnet_biggan.Generator.blocks_with_attention = "B2"
resnet_biggan.Generator.ch = 16
resnet_biggan.Discriminator.project_y = True
resnet_biggan.Discriminator.ch = 16
attention.use_pallas = True
""")
    ds = datasets.get_dataset("cifar10")
    gan = ModularGAN(
        dataset=ds, model_dir="/tmp/par_sp_biggan", conditional=True,
        parameters={"architecture": "resnet_biggan_arch", "z_dim": 120,
                    "lambda": 1, "disc_iters": 1})
    bs = 8
    old_interpret = pallas_attention._INTERPRET
    pallas_attention._INTERPRET = True  # Pallas on the CPU backend.
    try:
        ts_dp = gan.init_state(jax.random.PRNGKey(0), bs)
        ts_sp = jax.tree_util.tree_map(jnp.copy, ts_dp)
        total = bs * gan.num_sub_steps
        rng = np.random.RandomState(3)
        batch = {"images": rng.rand(total, 32, 32, 3).astype(np.float32),
                 "labels": rng.randint(0, 10, total).astype(np.int32)}

        mesh_dp = mesh_utils.make_mesh()
        step_dp, shard_dp, ts_dp = mesh_utils.compile_train_step(
            gan, ts_dp, mesh_dp, bs)
        new_dp, m_dp = step_dp(ts_dp, shard_dp(batch))

        mesh_sp = mesh_utils.make_mesh(extra_axes=(("model", 2),))
        step_sp, shard_sp, ts_sp = mesh_utils.compile_train_step(
            gan, ts_sp, mesh_sp, bs, spatial=True)
        new_sp, m_sp = step_sp(ts_sp, shard_sp(batch))

        for k, v in m_sp.items():
            assert np.isfinite(float(v)), (k, v)
        np.testing.assert_allclose(float(m_dp["loss/g"]),
                                   float(m_sp["loss/g"]), rtol=1e-5)
        # atol: G's conv biases feed straight into cBN, which subtracts
        # the batch mean — their TRUE gradient is exactly 0 and the
        # one-step values (~1e-6..4e-5, vs 1e-4+ for live params) are
        # Adam-amplified reduction-order roundoff that legitimately
        # differs between the two halo/collective schedules. Everything
        # with a real gradient matches to rtol 1e-4.
        for k in new_dp.params:
            np.testing.assert_allclose(
                np.asarray(new_dp.params[k]),
                np.asarray(new_sp.params[k]), rtol=1e-4, atol=5e-5), k
    finally:
        pallas_attention._INTERPRET = old_interpret
