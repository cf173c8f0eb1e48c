"""ModularGAN trainer-logic tests with the dummy architecture
(rebuild of reference gans/modular_gan_test.py and
gans/modular_gan_tpu_test.py:42-127 spy-based sub-step checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compare_gan_tpu import config as gin
from compare_gan_tpu import datasets
from compare_gan_tpu.gans.modular_gan import ModularGAN


@pytest.fixture(autouse=True)
def _fake_data():
    datasets.set_fake_dataset(True)
    yield
    datasets.set_fake_dataset(False)


def _make_gan(disc_iters=1, arch="dummy_arch", dataset="cifar10",
              batch=4, **kwargs):
    ds = datasets.get_dataset(dataset)
    gan = ModularGAN(
        dataset=ds, model_dir="/tmp/trainer_test",
        parameters={"architecture": arch, "z_dim": 8, "lambda": 1,
                    "disc_iters": disc_iters}, **kwargs)
    return gan, batch


def _batch(gan, batch_size, seed=0):
    rng = np.random.RandomState(seed)
    total = batch_size * gan.num_sub_steps
    shape = (total,) + gan.dataset.image_shape
    return {"images": rng.rand(*shape).astype(np.float32),
            "labels": rng.randint(0, 10, size=(total,)).astype(np.int32)}


def test_step_counters_interleaving():
    """G step +1, D step +disc_iters per train step (reference
    modular_gan_test.py:145-177 checkpoint-counter test)."""
    gan, bs = _make_gan(disc_iters=3)
    ts = gan.init_state(jax.random.PRNGKey(0), bs)
    step = jax.jit(gan.make_train_step(bs))
    for i in range(2):
        ts, _ = step(ts, _batch(gan, bs, seed=i))
    assert int(ts.step) == 2
    assert int(ts.disc_step) == 6


def test_substep_batch_shapes_spied():
    """Each sub-step sees batch_size inputs; D sees 2x (real‖fake)
    (reference modular_gan_tpu_test.py:60-68)."""
    gan, bs = _make_gan(disc_iters=2)
    ts = gan.init_state(jax.random.PRNGKey(0), bs)
    gan.generator.call_arg_list.clear()
    gan.discriminator.call_arg_list.clear()
    step = gan.make_train_step(bs)
    step(ts, _batch(gan, bs))  # Untraced: spy shapes are concrete.
    g_calls = gan.generator.call_arg_list
    d_calls = gan.discriminator.call_arg_list
    # 2 D sub-steps + 1 G sub-step each run G once.
    assert len(g_calls) == 3
    for call in g_calls:
        assert call["z"].shape == (bs, 8)
    # Main D forwards see concat(real, fake) = 2*bs; penalty off.
    assert len(d_calls) == 3
    for call in d_calls:
        assert call["x"].shape[0] == 2 * bs


def test_joint_gen_for_disc_batches():
    """Joint mode: one G call with disc_iters*bs, then one for G's step
    (reference modular_gan.py:444-463)."""
    gan, bs = _make_gan(disc_iters=2, experimental_joint_gen_for_disc=True)
    ts = gan.init_state(jax.random.PRNGKey(0), bs)
    gan.generator.call_arg_list.clear()
    step = gan.make_train_step(bs)
    step(ts, _batch(gan, bs))
    shapes = [c["z"].shape[0] for c in gan.generator.call_arg_list]
    assert shapes == [2 * bs, bs]


def test_deprecated_split_disc_calls():
    gan, bs = _make_gan(disc_iters=1, deprecated_split_disc_calls=True)
    ts = gan.init_state(jax.random.PRNGKey(0), bs)
    gan.discriminator.call_arg_list.clear()
    step = gan.make_train_step(bs)
    step(ts, _batch(gan, bs))
    # Split mode: separate real and fake D calls of bs each.
    assert all(c["x"].shape[0] == bs
               for c in gan.discriminator.call_arg_list)
    assert len(gan.discriminator.call_arg_list) == 4  # 2 sub-steps x 2


def test_training_updates_both_networks():
    gan, bs = _make_gan(disc_iters=1)
    ts = gan.init_state(jax.random.PRNGKey(0), bs)
    step = jax.jit(gan.make_train_step(bs))
    ts2, metrics = step(ts, _batch(gan, bs))
    g_changed = any(
        not np.allclose(ts.params[k], ts2.params[k])
        for k in ts.params if k.startswith("generator/"))
    d_changed = any(
        not np.allclose(ts.params[k], ts2.params[k])
        for k in ts.params if k.startswith("discriminator/"))
    assert g_changed and d_changed
    assert np.isfinite(float(metrics["loss/g"]))


def test_ema_tracks_before_start_and_lags_after():
    """decay = ema_decay * (step >= start): before start EMA == params,
    after it lags (reference modular_gan.py:498-510)."""
    gan, bs = _make_gan(disc_iters=1, g_use_ema=True, ema_decay=0.5,
                        ema_start_step=2)
    ts = gan.init_state(jax.random.PRNGKey(0), bs)
    step = jax.jit(gan.make_train_step(bs))
    ts, _ = step(ts, _batch(gan, bs, 0))  # step 0 -> decay 0
    g_params = {k: v for k, v in ts.params.items()
                if k.startswith("generator/")}
    for k in g_params:
        np.testing.assert_allclose(ts.ema_params[k], g_params[k])
    ts, _ = step(ts, _batch(gan, bs, 1))  # step 1 -> decay 0
    ts, _ = step(ts, _batch(gan, bs, 2))  # step 2 -> decay 0.5: lags now
    diffs = [float(np.max(np.abs(ts.ema_params[k] - ts.params[k])))
             for k in ts.ema_params]
    assert max(diffs) > 0


def test_determinism_same_seed_bitwise():
    """Same seed ⇒ identical params after training; different seed ⇒
    different (reference runner_lib_test.py:46-147)."""
    results = []
    for seed in [7, 7, 8]:
        gan, bs = _make_gan(disc_iters=2)
        ts = gan.init_state(jax.random.PRNGKey(seed), bs)
        step = jax.jit(gan.make_train_step(bs))
        for i in range(2):
            ts, _ = step(ts, _batch(gan, bs, seed=i))
        results.append(
            np.concatenate([np.ravel(ts.params[k])
                            for k in sorted(ts.params)]))
    np.testing.assert_array_equal(results[0], results[1])
    assert not np.array_equal(results[0], results[2])


def test_conditional_requires_labels():
    ds = datasets.get_dataset("cifar10")

    class NoLabels:
        name = "nolabel"
        num_classes = None
        image_shape = ds.image_shape

    with pytest.raises(ValueError):
        ModularGAN(dataset=NoLabels(), model_dir="/tmp/x",
                   parameters={"architecture": "dummy_arch", "z_dim": 8,
                               "lambda": 1}, conditional=True)


def test_conditional_training_runs():
    gan, bs = _make_gan(disc_iters=1, conditional=True)
    ts = gan.init_state(jax.random.PRNGKey(0), bs)
    step = jax.jit(gan.make_train_step(bs))
    ts, metrics = step(ts, _batch(gan, bs))
    assert np.isfinite(float(metrics["loss/d_0"]))


def test_train_loop_scan_matches_stepwise():
    """lax.scan chunk == repeated single steps (graph-unroll semantics)."""
    gan, bs = _make_gan(disc_iters=1)
    ts_a = gan.init_state(jax.random.PRNGKey(0), bs)
    ts_b = jax.tree_util.tree_map(jnp.copy, ts_a)
    batches = [_batch(gan, bs, seed=i) for i in range(3)]

    step = jax.jit(gan.make_train_step(bs))
    for b in batches:
        ts_a, _ = step(ts_a, b)

    loop = jax.jit(gan.make_train_loop(bs, 3))
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    ts_b, _ = loop(ts_b, stacked)

    for k in ts_a.params:
        np.testing.assert_allclose(ts_a.params[k], ts_b.params[k],
                                   rtol=2e-6, atol=2e-7)
    assert int(ts_b.step) == 3


def test_train_loop_metrics_are_chunk_means():
    """make_train_loop must reduce per-step metrics with mean over the
    chunk (TpuSummaries reduce_fn=mean, tpu_summaries.py:66-113), not
    keep only the last step."""
    gan, bs = _make_gan(disc_iters=1)
    ts = gan.init_state(jax.random.PRNGKey(0), bs)
    batches = [_batch(gan, bs, seed=i) for i in range(3)]

    step = jax.jit(gan.make_train_step(bs))
    per_step = []
    ts_s = jax.tree_util.tree_map(jnp.copy, ts)
    for b in batches:
        ts_s, m = step(ts_s, b)
        per_step.append(m)

    loop = jax.jit(gan.make_train_loop(bs, 3))
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    _, chunk_metrics = loop(ts, stacked)

    for k in per_step[0]:
        expect = np.mean([float(m[k]) for m in per_step])
        np.testing.assert_allclose(float(chunk_metrics[k]), expect,
                                   rtol=1e-5, atol=1e-6)


def test_z_generator_gin_distribution():
    gin.parse_config("z.distribution_fn = @tf.random.normal\n"
                     "z.stddev = 2.0")
    gan, bs = _make_gan()
    from compare_gan_tpu.ops import rng as random
    with random.rng_context(jax.random.PRNGKey(0)):
        z = gan.z_generator([512, 8], name="z")
    assert 1.5 < float(jnp.std(z)) < 2.5  # stddev 2 normal, not U(-1,1)


def test_sample_uses_ema_params():
    gan, bs = _make_gan(g_use_ema=True)
    ts = gan.init_state(jax.random.PRNGKey(0), bs)
    # Corrupt EMA: sample() must follow EMA, not raw params.
    ema = {k: jnp.zeros_like(v) for k, v in ts.ema_params.items()}
    ts = type(ts)(**{**ts.__dict__, "ema_params": ema})
    z = jnp.zeros((2, 8))
    imgs, _ = gan.sample(ts, z)
    # Zero weights + sigmoid -> exactly 0.5 everywhere.
    np.testing.assert_allclose(imgs, 0.5, atol=1e-6)


def test_fake_only_g_loss_rejects_batch_coupled_discriminator():
    """With batch norm in D the fake-only batch changes the normalization
    moments and the committed moving stats — must refuse at trace time,
    not silently diverge."""
    gin.parse_config("D.batch_norm_fn = @batch_norm")
    gan, bs = _make_gan(arch="dcgan_arch", batch=2,
                        experimental_fake_only_g_loss=True)
    ts = gan.init_state(jax.random.PRNGKey(0), bs)
    with pytest.raises(ValueError, match="batch-coupled"):
        gan.make_train_step(bs)(ts, _batch(gan, bs))


def test_fake_only_g_loss_rejects_accumulator_bn_discriminator():
    """Round-2 verdict hole: accumulator-mode BN
    (standardize_batch.use_moving_averages=False) normalizes by batch
    moments during training while writing NO state, so write-detection
    missed it. The structural 'batch_coupled' tag must still reject it."""
    gin.parse_config("D.batch_norm_fn = @batch_norm\n"
                     "standardize_batch.use_moving_averages = False")
    gan, bs = _make_gan(arch="dcgan_arch", batch=2,
                        experimental_fake_only_g_loss=True)
    ts = gan.init_state(jax.random.PRNGKey(0), bs)
    with pytest.raises(ValueError, match="batch-coupled"):
        gan.make_train_step(bs)(ts, _batch(gan, bs))


def test_fake_only_g_loss_rejects_coupled_d_despite_bn_in_g():
    """Round-3 review hole: with batch norm in G as well (every real
    config), G's forward tags batch coupling under the generator scope
    BEFORE the guard looks at D — a before/after set diff over bare tag
    names saw nothing new and let the coupled D through. Scope-qualified
    tags must still reject the D."""
    gin.parse_config("G.batch_norm_fn = @batch_norm\n"
                     "D.batch_norm_fn = @batch_norm")
    gan, bs = _make_gan(arch="dcgan_arch", batch=2,
                        experimental_fake_only_g_loss=True)
    ts = gan.init_state(jax.random.PRNGKey(0), bs)
    with pytest.raises(ValueError, match="batch-coupled"):
        gan.make_train_step(bs)(ts, _batch(gan, bs))


def test_fake_only_g_loss_allows_bn_in_g_only():
    """The symmetric positive case: batch norm in G alone is harmless (G's
    forward is identical on the fast and concat paths), so the guard must
    NOT fire — only D-side coupling breaks the equivalence."""
    gin.parse_config("G.batch_norm_fn = @batch_norm")
    gan, bs = _make_gan(arch="dcgan_arch", batch=2,
                        experimental_fake_only_g_loss=True)
    ts = gan.init_state(jax.random.PRNGKey(0), bs)
    out = gan.make_train_step(bs)(ts, _batch(gan, bs))
    assert out is not None


def test_fake_only_g_loss_with_joint_gen_spied():
    """bench.py's configuration: joint_gen_for_disc + fake_only_g_loss.
    The two graph optimizations touch disjoint sub-graphs (D-step G
    forwards vs the G-step D forward) — assert the combined call shapes:
    one joint G forward of disc_iters*bs, one G forward of bs, D sees
    2*bs on D sub-steps but only bs (fakes) on the G sub-step."""
    gan, bs = _make_gan(disc_iters=2,
                        experimental_joint_gen_for_disc=True,
                        experimental_fake_only_g_loss=True)
    ts = gan.init_state(jax.random.PRNGKey(0), bs)
    gan.generator.call_arg_list.clear()
    gan.discriminator.call_arg_list.clear()
    step = gan.make_train_step(bs)
    step(ts, _batch(gan, bs))  # Untraced: spy shapes are concrete.
    g_shapes = sorted(c["z"].shape[0] for c in gan.generator.call_arg_list)
    assert g_shapes == [bs, 2 * bs]
    d_shapes = sorted(c["x"].shape[0] for c in gan.discriminator.call_arg_list)
    assert d_shapes == [bs, 2 * bs, 2 * bs]


@pytest.mark.parametrize("arch,penalty", [
    ("dummy_arch", None),
    ("dummy_arch", "wgangp_penalty"),  # Penalty forwards commit no state
    # (core.no_state_updates in _penalty_loss) and only feed the G step's
    # unconsumed d_loss, so fake-only stays exact with penalties too.
    ("sndcgan_arch", None),
])
def test_fake_only_g_loss_matches_concat(arch, penalty):
    """experimental_fake_only_g_loss must be a pure graph optimization for
    batch-decoupled discriminators (no BN): identical g_loss, parameters,
    optimizer state, and op state after training steps (modular_gan
    reference consumes only loss/g from the G step, modular_gan.py:586-588).
    """
    from compare_gan_tpu.gans import optimizers
    if penalty:
        gin.parse_config(f"penalty.fn = @{penalty}")
    # SGD, not Adam: Adam normalizes away gradient magnitude, amplifying
    # benign fusion-reassociation noise (~1e-7) into visible parameter
    # differences; with SGD any surviving difference is semantic.
    kwargs = {"disc_iters": 2,
              "g_optimizer_fn": optimizers.sgd_optimizer,
              "d_optimizer_fn": optimizers.sgd_optimizer}
    results = []
    for fake_only in (False, True):
        gan, bs = _make_gan(arch=arch, batch=2,
                            experimental_fake_only_g_loss=fake_only,
                            **kwargs)
        ts = gan.init_state(jax.random.PRNGKey(0), bs)
        step = jax.jit(gan.make_train_step(bs))
        for i in range(2):
            ts, metrics = step(ts, _batch(gan, bs, seed=i))
        results.append((ts, metrics))

    (ts_a, m_a), (ts_b, m_b) = results
    # The two graphs compile different fusions (batch 2B vs B convs), so
    # spectral-norm u_var picks up ~1e-7 reassociation noise that Adam
    # amplifies over steps — tolerances cover that, not semantics.
    rtol, atol = (1e-4, 1e-6) if arch == "sndcgan_arch" else (1e-5, 1e-7)
    np.testing.assert_allclose(m_a["loss/g"], m_b["loss/g"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(m_a["loss/d_0"], m_b["loss/d_0"],
                               rtol=1e-4, atol=1e-5)
    for k in ts_a.params:
        np.testing.assert_allclose(ts_a.params[k], ts_b.params[k],
                                   rtol=rtol, atol=atol, err_msg=k)
    for k in ts_a.state:
        np.testing.assert_allclose(ts_a.state[k], ts_b.state[k],
                                   rtol=rtol, atol=atol, err_msg=k)


def test_adam_bf16_first_moment_optin():
    """`AdamOptimizer.moment_dtype = 'bfloat16'` (TPU extension: halves
    the bandwidth-bound m traffic) stores mu in bf16 and tracks the f32
    trajectory closely; default stays exact f32."""
    results = []
    for dtype in (None, "bfloat16"):
        gin.clear_config()
        if dtype:
            gin.parse_config(f"AdamOptimizer.moment_dtype = '{dtype}'")
        gan, bs = _make_gan()
        ts = gan.init_state(jax.random.PRNGKey(0), bs)
        step = jax.jit(gan.make_train_step(bs))
        for i in range(3):
            ts, _ = step(ts, _batch(gan, bs, seed=i))
        results.append(ts)
    f32_ts, bf16_ts = results
    mu_dtypes = {leaf.dtype for leaf in jax.tree_util.tree_leaves(
        bf16_ts.g_opt) if hasattr(leaf, "dtype")}
    assert np.dtype(jnp.bfloat16) in mu_dtypes
    for k in f32_ts.params:
        np.testing.assert_allclose(f32_ts.params[k], bf16_ts.params[k],
                                   rtol=5e-2, atol=5e-3, err_msg=k)
