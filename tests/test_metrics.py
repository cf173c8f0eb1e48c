"""Numeric metric tests (reference metrics/*_test.py: FID on crafted
activations, PRD analytic cases, fractal dimension of line/square,
Jacobian vs numerical, MS-SSIM on known images)."""

import jax
import jax.numpy as jnp
import numpy as np

from compare_gan_tpu.metrics import (fid_score, fractal_dimension,
                                     image_similarity, inception_score,
                                     jacobian_conditioning, kid_score,
                                     ms_ssim_score, prd_score)


# -- FID --------------------------------------------------------------------

def test_fid_identical_is_zero():
    acts = np.random.RandomState(0).randn(500, 16)
    fid = fid_score.compute_fid_from_activations(acts, acts.copy())
    assert abs(fid) < 1e-6


def test_fid_mean_shift_analytic():
    """For equal covariance, FID = |m1 - m2|^2."""
    rng = np.random.RandomState(0)
    base = rng.randn(20000, 8)
    shift = np.zeros(8)
    shift[0] = 2.0
    fid = fid_score.compute_fid_from_activations(base + shift, base)
    np.testing.assert_allclose(fid, 4.0, atol=0.05)


def test_fid_scale_analytic():
    """1-D Gaussians N(0,1) vs N(0,4): FID = (σ1-σ2)² = 1."""
    rng = np.random.RandomState(1)
    a = rng.randn(200000, 1)
    fid = fid_score.compute_fid_from_activations(2.0 * a, a)
    np.testing.assert_allclose(fid, 1.0, atol=0.05)


def test_fid_on_device_matches_host():
    rng = np.random.RandomState(2)
    f = rng.randn(2000, 32) + 0.3
    r = rng.randn(2000, 32) @ (np.eye(32) * 1.2)
    host = fid_score.compute_fid_from_activations(f, r)
    dev = float(fid_score.fid_on_device(f, r))
    np.testing.assert_allclose(dev, host, rtol=0.01)


def test_fid_task_failure_sentinel():
    class FakeDset:
        images = np.empty(0)
        activations = np.full((10, 4), np.nan)
    task = fid_score.FIDScoreTask()
    out = task.run_after_session(FakeDset(), FakeDset())
    assert out["fid_score"] == fid_score.FAILED_FID or np.isnan(
        out["fid_score"]) or out["fid_score"] >= 0


# -- Inception score --------------------------------------------------------

def test_is_uniform_logits_is_one():
    logits = np.zeros((100, 10))
    np.testing.assert_allclose(
        inception_score.classifier_score_from_logits(logits), 1.0,
        rtol=1e-6)


def test_is_perfectly_classified_equals_num_classes():
    """One-hot-confident predictions over k balanced classes → IS = k."""
    k, n = 10, 1000
    logits = np.full((n, k), -1e3)
    for i in range(n):
        logits[i, i % k] = 1e3
    np.testing.assert_allclose(
        inception_score.classifier_score_from_logits(logits), k, rtol=1e-3)


# -- KID --------------------------------------------------------------------

def test_kid_identical_near_zero():
    # The unbiased estimator is slightly negative for identical sets (the
    # diagonal is excluded from within-set terms but not the cross term).
    acts = np.random.RandomState(0).randn(600, 8)
    val = kid_score.kid(acts, acts.copy())
    assert -0.1 < val < 1e-8


def test_kid_detects_shift():
    rng = np.random.RandomState(0)
    a = rng.randn(600, 8)
    b = rng.randn(600, 8) + 1.0
    assert kid_score.kid(b, a) > 0.1


def test_kid_stderr_output():
    rng = np.random.RandomState(0)
    mn, std = kid_score.kid(rng.randn(2100, 4), rng.randn(2100, 4),
                            max_block_size=512, output_stderr=True)
    assert std >= 0


# -- MS-SSIM ----------------------------------------------------------------

def test_msssim_identical_images_is_one():
    img = np.random.RandomState(0).rand(2, 64, 64, 3) * 255
    vals = np.asarray(image_similarity.multiscale_ssim(
        jnp.asarray(img), jnp.asarray(img)))
    np.testing.assert_allclose(vals, 1.0, atol=1e-4)


def test_msssim_noise_lower_than_blur():
    rng = np.random.RandomState(0)
    img = rng.rand(1, 64, 64, 3) * 255
    noisy = np.clip(img + rng.randn(*img.shape) * 80, 0, 255)
    v = float(np.asarray(image_similarity.multiscale_ssim(
        jnp.asarray(img), jnp.asarray(noisy)))[0])
    assert 0 <= v < 0.9


def test_msssim_score_diversity_probe():
    rng = np.random.RandomState(0)
    identical = np.tile(rng.rand(1, 64, 64, 3) * 255, (80, 1, 1, 1))
    diverse = rng.rand(80, 64, 64, 3) * 255
    s_same = ms_ssim_score.compute_msssim_score(identical, batch_size=8,
                                                num_batches=2)
    s_div = ms_ssim_score.compute_msssim_score(diverse, batch_size=8,
                                               num_batches=2)
    assert s_same > 0.99
    assert s_div < s_same


# -- PRD --------------------------------------------------------------------

def test_prd_identical_distributions():
    dist = np.array([0.25, 0.25, 0.5])
    precision, recall = prd_score.compute_prd(dist, dist)
    assert precision.max() > 0.99 and recall.max() > 0.99


def test_prd_disjoint_distributions():
    p, r = prd_score.compute_prd(np.array([1.0, 0.0]), np.array([0.0, 1.0]))
    assert p.max() < 1e-4 and r.max() < 1e-4


def test_prd_f_beta_analytic():
    f8, f1_8 = prd_score.prd_to_max_f_beta_pair(
        np.array([1.0, 0.5]), np.array([0.5, 1.0]), beta=8)
    assert 0.5 < f8 <= 1.0 and 0.5 < f1_8 <= 1.0


def test_prd_from_embedding_balance_check():
    rng = np.random.RandomState(0)
    try:
        prd_score.compute_prd_from_embedding(rng.randn(10, 2),
                                             rng.randn(20, 2))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_prd_embedding_identical_good_scores():
    rng = np.random.RandomState(0)
    data = rng.randn(400, 4)
    p, r = prd_score.compute_prd_from_embedding(
        data, data.copy(), num_clusters=5, num_runs=2)
    f8, f1_8 = prd_score.prd_to_max_f_beta_pair(p, r)
    assert f8 > 0.9 and f1_8 > 0.9


# -- Fractal dimension ------------------------------------------------------

def test_fractal_dimension_line_and_square():
    """Points on a line → ~1; uniform on a square → ~2 (reference
    fractal_dimension_test semantics)."""
    rng = np.random.RandomState(0)
    line = np.stack([np.linspace(0, 1, 2000), np.zeros(2000)], 1)
    square = rng.rand(2000, 2)
    d_line = fractal_dimension.compute_fractal_dimension(line)
    d_square = fractal_dimension.compute_fractal_dimension(square)
    assert abs(d_line - 1.0) < 0.3
    assert abs(d_square - 2.0) < 0.3


# -- Jacobian conditioning --------------------------------------------------

def test_jacobian_linear_map_exact():
    """For f(z) = Az, Jacobian == A for every sample."""
    A = np.random.RandomState(0).randn(6, 3).astype(np.float32)

    def gen(z):
        return (z @ A.T).reshape(z.shape[0], 2, 3, 1)

    z = jnp.asarray(np.random.RandomState(1).randn(4, 3), jnp.float32)
    jac = jacobian_conditioning.compute_jacobian(gen, z)
    assert jac.shape == (4, 6, 3)
    for i in range(4):
        np.testing.assert_allclose(jac[i], A, rtol=1e-5)


def test_jacobian_condition_number_identity():
    def gen(z):
        return z.reshape(z.shape[0], 1, 1, -1)

    z = jnp.asarray(np.random.RandomState(0).randn(3, 4), jnp.float32)
    jac = jacobian_conditioning.compute_jacobian(gen, z)
    out = jacobian_conditioning.analyze_jacobian(jac)
    np.testing.assert_allclose(
        out["metric_tensor"]["log_condition_number"], 0.0, atol=1e-4)


def test_jacobian_task_run_with_gan():
    """run_with_gan samples z from the gan's prior and reports the three
    condition-number keys (reference run_in_session,
    jacobian_conditioning.py:53-60)."""
    from compare_gan_tpu import datasets
    from compare_gan_tpu.gans.modular_gan import ModularGAN

    datasets.set_fake_dataset(True)
    try:
        gan = ModularGAN(dataset=datasets.get_dataset("cifar10"),
                         model_dir="/tmp/jac_task_test",
                         parameters={"architecture": "dummy_arch",
                                     "z_dim": 4, "lambda": 1})
        ts = gan.init_state(jax.random.PRNGKey(0), 4)
        task = jacobian_conditioning.GeneratorConditionNumberTask()
        out = task.run_with_gan(gan, ts, batch_size=4)
    finally:
        datasets.set_fake_dataset(False)
    assert set(out) == task.metric_list()
    assert out["log_condition_number_count"] == 4
    assert np.isfinite(out["log_condition_number_mean"])
