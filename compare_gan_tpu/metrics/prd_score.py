"""Precision-Recall for Distributions (Sajjadi et al., arXiv:1806.00035).

Rebuild of compare_gan/metrics/prd_score.py (299 LoC): cluster the union of
fake/real Inception embeddings with minibatch k-means, compute the angular
PRD curve over the resulting histograms, compress to max-F_β pairs.
Pure NumPy + scikit-learn, host-side (cheap relative to sampling).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from compare_gan_tpu.metrics import eval_task


def compute_prd(eval_dist, ref_dist, num_angles=1001, epsilon=1e-10
                ) -> Tuple[np.ndarray, np.ndarray]:
    """PRD curve for two discrete distributions over the same states
    (prd_score.py:42-94): for slopes λ = tan(θ), θ ∈ (ε, π/2-ε),
    precision(λ) = Σ_s min(λ·ref(s), eval(s)), recall = precision / λ."""
    if not 0 < epsilon <= 0.1:
        raise ValueError(f"epsilon must be in (0, 0.1] but is {epsilon}.")
    if not 3 <= num_angles <= 1e6:
        raise ValueError(f"num_angles must be in [3, 1e6], got {num_angles}.")
    angles = np.linspace(epsilon, np.pi / 2 - epsilon, num=num_angles)
    slopes = np.tan(angles)[:, None]
    ref = np.asarray(ref_dist)[None, :]
    ev = np.asarray(eval_dist)[None, :]
    precision = np.minimum(ref * slopes, ev).sum(axis=1)
    recall = precision / slopes[:, 0]
    # Mathematically both are in [0, 1]; clip float-rounding excursions.
    return np.clip(precision, 0.0, 1.0), np.clip(recall, 0.0, 1.0)


def _cluster_into_bins(eval_data, ref_data, num_clusters):
    """Histogram both sets over shared k-means clusters
    (prd_score.py:97-122)."""
    import sklearn.cluster
    union = np.vstack([eval_data, ref_data])
    kmeans = sklearn.cluster.MiniBatchKMeans(n_clusters=num_clusters,
                                             n_init=10)
    labels = kmeans.fit(union).labels_
    eval_labels = labels[:len(eval_data)]
    ref_labels = labels[len(eval_data):]
    bins = dict(bins=num_clusters, range=[0, num_clusters], density=True)
    return (np.histogram(eval_labels, **bins)[0],
            np.histogram(ref_labels, **bins)[0])


def compute_prd_from_embedding(eval_data, ref_data, num_clusters=20,
                               num_angles=1001, num_runs=10,
                               enforce_balance=True):
    """PRD from embeddings, averaged over k-means runs
    (prd_score.py:126-178)."""
    if enforce_balance and len(eval_data) != len(ref_data):
        raise ValueError(
            f"The number of points in eval_data {len(eval_data)} is not "
            f"equal to the number of points in ref_data {len(ref_data)}. To "
            f"disable this exception, set enforce_balance to False (not "
            f"recommended).")
    eval_data = np.asarray(eval_data, np.float64)
    ref_data = np.asarray(ref_data, np.float64)
    curves = [compute_prd(*_cluster_into_bins(eval_data, ref_data,
                                              num_clusters), num_angles)
              for _ in range(num_runs)]
    precision = np.mean([c[0] for c in curves], axis=0)
    recall = np.mean([c[1] for c in curves], axis=0)
    return precision, recall


def _prd_to_f_beta(precision, recall, beta=1, epsilon=1e-10):
    """F_β for every point on the curve (prd_score.py:182-215)."""
    if not ((precision >= 0).all() and (precision <= 1).all()):
        raise ValueError("All values in precision must be in [0, 1].")
    if not ((recall >= 0).all() and (recall <= 1).all()):
        raise ValueError("All values in recall must be in [0, 1].")
    if beta <= 0:
        raise ValueError(f"Given parameter beta {beta} must be positive.")
    return ((1 + beta ** 2) * precision * recall
            / (beta ** 2 * precision + recall + epsilon))


def prd_to_max_f_beta_pair(precision, recall, beta=8):
    """(max F_β, max F_{1/β}) — the curve compressed to two scalars
    (prd_score.py:218-250)."""
    precision, recall = np.asarray(precision), np.asarray(recall)
    f_beta = float(np.max(_prd_to_f_beta(precision, recall, beta)))
    f_beta_inv = float(np.max(_prd_to_f_beta(precision, recall, 1.0 / beta)))
    return f_beta, f_beta_inv


def plot(precision_recall_pairs, labels: Optional[Sequence[str]] = None,
         out_path: Optional[str] = None, legend_loc="lower left", dpi=150):
    """PRD plot (prd_score.py:253-299); requires matplotlib."""
    import matplotlib.pyplot as plt
    if labels is not None and len(labels) != len(precision_recall_pairs):
        raise ValueError("labels must match precision_recall_pairs length.")
    fig = plt.figure(figsize=(3.5, 3.5), dpi=dpi)
    ax = fig.add_subplot(111)
    ax.tick_params(axis="both", which="major", labelsize=12)
    for i, (precision, recall) in enumerate(precision_recall_pairs):
        label = labels[i] if labels is not None else None
        plt.plot(recall, precision, label=label, alpha=0.5, linewidth=3)
    if labels is not None:
        plt.legend(loc=legend_loc)
    plt.xlim([0, 1])
    plt.ylim([0, 1])
    plt.xlabel("Recall", fontsize=12)
    plt.ylabel("Precision", fontsize=12)
    plt.tight_layout()
    if out_path is None:
        plt.show()
    else:
        plt.savefig(out_path, bbox_inches="tight", dpi=dpi)
        plt.close()


class PRDTask(eval_task.EvalTask):
    """Eval task: report (F_8, F_1/8) precision/recall proxies."""

    _LABEL = "prd"

    def metric_list(self):
        return frozenset({"prd_f8", "prd_f1_8"})

    def run_after_session(self, fake_dset, real_dset):
        n = min(len(fake_dset.activations), len(real_dset.activations))
        precision, recall = compute_prd_from_embedding(
            fake_dset.activations[:n], real_dset.activations[:n])
        f8, f1_8 = prd_to_max_f_beta_pair(precision, recall)
        return {"prd_f8": f8, "prd_f1_8": f1_8}
