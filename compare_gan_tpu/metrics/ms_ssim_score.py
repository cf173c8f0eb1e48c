"""MS-SSIM diversity score (rebuild of compare_gan/metrics/
ms_ssim_score.py:38-111): mean pairwise MS-SSIM over 5 shuffled batches of
64 generated images — a mode-collapse probe (higher = less diverse;
following section 5.3 of arXiv:1710.08446)."""

from __future__ import annotations

import numpy as np

from compare_gan_tpu.metrics import eval_task, image_similarity


def compute_msssim_score(fake_images, batch_size=64, num_batches=5,
                         seed=0):
    """Average MS-SSIM over all ordered pairs (i≠j) within each batch."""
    fake_images = np.asarray(fake_images, np.float32)
    rng = np.random.default_rng(seed)
    scores = []
    for _ in range(num_batches):
        idx = rng.integers(0, len(fake_images), size=batch_size)
        batch = fake_images[idx]
        # All pairs: pair1 repeats the batch, pair2 tiles each image.
        pair1 = np.repeat(batch, batch_size, axis=0)
        pair2 = np.tile(batch, (batch_size, 1, 1, 1))
        vals = np.asarray(image_similarity.multiscale_ssim(pair2, pair1))
        total = vals.sum() - batch_size  # Drop identical pairs (score 1.0).
        scores.append(total / (batch_size * batch_size - batch_size))
    return float(np.mean(scores))


class MultiscaleSSIMTask(eval_task.EvalTask):
    """Task computing MS-SSIM among generated images
    (ms_ssim_score.py:38-47)."""

    _LABEL = "ms_ssim"

    def run_after_session(self, fake_dset, real_dset=None):
        del real_dset
        return {self._LABEL: compute_msssim_score(fake_dset.images)}
