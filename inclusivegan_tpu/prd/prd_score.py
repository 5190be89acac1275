"""PRD (precision-recall for distributions) — capability parity with
/root/reference/precision-recall-distributions/prd_score.py (Sajjadi et al.
2018, vendored there from Google's compare_gan; re-implemented here from the
paper's definitions).

PRD curve between two discrete distributions p (eval) and q (ref):
  α(λ) = Σ_i min(λ q_i, p_i)   (precision at slope λ)
  β(λ) = Σ_i min(q_i, p_i/λ)  = α(λ)/λ   (recall)
evaluated on a grid of angles in (0, π/2). Embedding-space distributions are
built by k-means binning of the joint sample set (:108-137)."""

from typing import List, Optional, Sequence, Tuple

import numpy as np


def compute_prd(eval_dist, ref_dist, num_angles: int = 1001,
                epsilon: float = 1e-10) -> Tuple[np.ndarray, np.ndarray]:
    if not (epsilon > 0 and epsilon < 0.1):
        raise ValueError("epsilon must be in (0, 0.1]")
    if not (num_angles >= 3 and num_angles <= 1e6):
        raise ValueError("num_angles must be in [3, 1e6]")
    eval_dist = np.asarray(eval_dist, np.float64)
    ref_dist = np.asarray(ref_dist, np.float64)

    angles = np.linspace(epsilon, np.pi / 2 - epsilon, num=num_angles)
    slopes = np.tan(angles)
    slopes_2d = slopes[:, None]
    precision = np.minimum(ref_dist[None] * slopes_2d, eval_dist[None]).sum(1)
    recall = precision / slopes
    return (np.clip(precision, 0, 1), np.clip(recall, 0, 1))


def _cluster_into_bins(eval_data, ref_data, num_clusters: int):
    from sklearn import cluster
    data = np.vstack([eval_data, ref_data])
    kmeans = cluster.MiniBatchKMeans(n_clusters=num_clusters, n_init=10)
    labels = kmeans.fit(data).labels_
    eval_labels = labels[:len(eval_data)]
    ref_labels = labels[len(eval_data):]
    eval_bins = np.histogram(eval_labels, bins=num_clusters,
                             range=[0, num_clusters], density=True)[0]
    ref_bins = np.histogram(ref_labels, bins=num_clusters,
                            range=[0, num_clusters], density=True)[0]
    return eval_bins, ref_bins


def compute_prd_from_embedding(eval_data, ref_data, num_clusters: int = 20,
                               num_angles: int = 1001, num_runs: int = 10,
                               enforce_balance: bool = True):
    eval_data = np.asarray(eval_data, np.float64)
    ref_data = np.asarray(ref_data, np.float64)
    if enforce_balance and len(eval_data) != len(ref_data):
        raise ValueError("eval and ref must have the same size "
                         "(pass enforce_balance=False to override)")
    precisions, recalls = [], []
    for _ in range(num_runs):
        eval_dist, ref_dist = _cluster_into_bins(eval_data, ref_data,
                                                 num_clusters)
        p, r = compute_prd(eval_dist, ref_dist, num_angles)
        precisions.append(p)
        recalls.append(r)
    return np.mean(precisions, 0), np.mean(recalls, 0)


def _prd_to_f_beta(precision, recall, beta: float = 1, epsilon: float = 1e-10):
    if beta <= 0:
        raise ValueError("beta must be positive")
    if np.any(precision < 0) or np.any(recall < 0):
        raise ValueError("precision and recall must be non-negative")
    return ((1 + beta ** 2) * (precision * recall) /
            (beta ** 2 * precision + recall + epsilon))


def prd_to_max_f_beta_pair(precision, recall, beta: float = 8):
    """(F_β, F_{1/β}) summary pair (reference :230-262)."""
    f_beta = np.max(_prd_to_f_beta(np.asarray(precision),
                                   np.asarray(recall), beta))
    f_beta_inv = np.max(_prd_to_f_beta(np.asarray(precision),
                                       np.asarray(recall), 1.0 / beta))
    return float(f_beta), float(f_beta_inv)


def plot(precision_recall_pairs, labels: Optional[Sequence[str]] = None,
         out_path: Optional[str] = None, legend_loc: str = "lower left",
         dpi: int = 300):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(3.5, 3.5), dpi=dpi)
    plot_handle = fig.add_subplot(111)
    plot_handle.tick_params(axis="both", which="major", labelsize=12)
    for i, (precision, recall) in enumerate(precision_recall_pairs):
        label = labels[i] if labels is not None else None
        plt.plot(recall, precision, label=label, alpha=0.5, linewidth=3)
    if labels is not None:
        plt.legend(loc=legend_loc, fontsize=12)
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
