"""Kernel Inception Distance (rebuild of compare_gan/metrics/kid_score.py:
44-149): block estimator of the unbiased polynomial-kernel MMD², with
optional standard error across blocks."""

from __future__ import annotations

import numpy as np

from compare_gan_tpu.metrics import eval_task


def kid(fake_activations, real_activations, max_block_size=1024,
        output_stderr=False):
    """Unbiased MMD² with kernel (x·y/d + 1)³, block-averaged
    (kid_score.py:61-149). Blocks split both sets into ceil(n/max_block)
    near-equal chunks; per-block unbiased estimates are averaged."""
    fake = np.asarray(fake_activations, np.float64)
    real = np.asarray(real_activations, np.float64)
    n_r, dim = real.shape
    n_f = fake.shape[0]

    n_blocks = int(np.ceil(max(n_r, n_f) / max_block_size))

    def splits(n):
        sizes = np.full(n_blocks, n // n_blocks)
        sizes[:n % n_blocks] += 1
        ends = np.cumsum(sizes)
        return [slice(e - s, e) for s, e in zip(sizes, ends)]

    ests = []
    for sl_r, sl_f in zip(splits(n_r), splits(n_f)):
        r = real[sl_r]
        f = fake[sl_f]
        m, n = len(r), len(f)

        def k(a, b):
            return (a @ b.T / dim + 1.0) ** 3

        k_rr = k(r, r)
        k_ff = k(f, f)
        k_rf = k(r, f)
        # Unbiased: drop diagonals of the within-set terms.
        term_rr = (k_rr.sum() - np.trace(k_rr)) / (m * (m - 1))
        term_ff = (k_ff.sum() - np.trace(k_ff)) / (n * (n - 1))
        term_rf = 2.0 * k_rf.mean()
        ests.append(term_rr + term_ff - term_rf)

    mn = float(np.mean(ests))
    if output_stderr:
        std = float(np.std(ests) / np.sqrt(len(ests)))
        return mn, std
    return mn


class KIDScoreTask(eval_task.EvalTask):
    """Evaluation task for KID (kid_score.py:31-41)."""

    _LABEL = "kid_score"

    def run_after_session(self, fake_dset, real_dset):
        return {self._LABEL: kid(fake_dset.activations,
                                 real_dset.activations)}
