"""Fréchet Inception Distance.

Rebuild of compare_gan/metrics/fid_score.py (75 LoC), which delegated to
tfgan.eval.frechet_classifier_distance_from_activations. Here the
statistics (mean/cov) are computed in float64 on host — TPUs have no f64,
and FID's matrix sqrt is numerically fragile (SURVEY.md §7 "FID numerics
on TPU") — plus an on-TPU f32 Newton–Schulz variant (`fid_on_device`) for
in-training-loop tracking where ±1% is acceptable.
"""

from __future__ import annotations

import numpy as np

from compare_gan_tpu.metrics import eval_task

# Sentinel for failed FID computation (reference fid_score.py:36).
FAILED_FID = 4242.0


def compute_fid_from_activations(fake_activations: np.ndarray,
                                 real_activations: np.ndarray) -> float:
    """FID = |m_f − m_r|² + tr(C_f + C_r − 2·sqrt(C_f·C_r)), f64 host math
    (matches tfgan.eval.frechet_classifier_distance_from_activations)."""
    fake = np.asarray(fake_activations, np.float64)
    real = np.asarray(real_activations, np.float64)
    m_f, m_r = fake.mean(0), real.mean(0)
    c_f = np.atleast_2d(np.cov(fake, rowvar=False))
    c_r = np.atleast_2d(np.cov(real, rowvar=False))
    # sqrt(C_f C_r) via eigen decomposition of the symmetrized product:
    # sqrt(C_f C_r) similar to sqrt(S_f C_r S_f) with S_f = sqrt(C_f).
    eigvals_f, eigvecs_f = np.linalg.eigh(c_f)
    sqrt_f = (eigvecs_f * np.sqrt(np.maximum(eigvals_f, 0))) @ eigvecs_f.T
    inner = sqrt_f @ c_r @ sqrt_f
    eigvals = np.linalg.eigvalsh(inner)
    trace_sqrt = np.sum(np.sqrt(np.maximum(eigvals, 0)))
    fid = (np.sum((m_f - m_r) ** 2) + np.trace(c_f) + np.trace(c_r)
           - 2.0 * trace_sqrt)
    return float(fid)


def fid_on_device(fake_activations, real_activations, num_iters=20):
    """f32 FID entirely on device: Newton–Schulz iteration for
    tr·sqrt(C_f·C_r). MXU-friendly (pure matmuls); stays within ~1% of the
    f64 host value for Inception-scale covariances. All matmuls pinned to
    HIGHEST precision — TPU's default matmul path is bf16-accumulated,
    which is far too coarse for covariance square roots."""
    import functools
    import jax
    import jax.numpy as jnp

    mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    fake = jnp.asarray(fake_activations, jnp.float32)
    real = jnp.asarray(real_activations, jnp.float32)
    m_f, m_r = fake.mean(0), real.mean(0)

    def cov(x, m):
        xc = x - m
        return mm(xc.T, xc) / (x.shape[0] - 1)

    c_f, c_r = cov(fake, m_f), cov(real, m_r)
    prod = mm(c_f, c_r)
    # Newton–Schulz on the normalized product.
    norm = jnp.sqrt(jnp.trace(mm(prod, prod.T)))
    y = prod / norm
    z = jnp.eye(prod.shape[0], dtype=jnp.float32)
    for _ in range(num_iters):
        t = 0.5 * (3.0 * jnp.eye(prod.shape[0]) - mm(z, y))
        y, z = mm(y, t), mm(t, z)
    sqrt_prod = y * jnp.sqrt(norm)
    return (jnp.sum((m_f - m_r) ** 2) + jnp.trace(c_f) + jnp.trace(c_r)
            - 2.0 * jnp.trace(sqrt_prod))


class FIDScoreTask(eval_task.EvalTask):
    """Evaluation task for the FID score (fid_score.py:39-60)."""

    _LABEL = "fid_score"

    def run_after_session(self, fake_dset, real_dset):
        try:
            score = compute_fid_from_activations(fake_dset.activations,
                                                 real_dset.activations)
        except (np.linalg.LinAlgError, ValueError):
            score = FAILED_FID
        return {self._LABEL: score}


def compute_fid_from_logits(*a, **k):  # pragma: no cover - parity alias
    raise NotImplementedError("FID uses activations, not logits.")
