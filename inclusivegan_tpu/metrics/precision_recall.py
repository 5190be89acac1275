"""kNN precision/recall — capability parity with
/root/reference/metrics/precision_recall.py (Kynkäänniemi et al. 2019):
blocked pairwise distances on the accelerator (:20-57), ManifoldEstimator
kth-NN radii (:61-134), knn_precision_recall_features (:138-167). Feature
embedder pluggable as in FID."""

import jax
import jax.numpy as jnp
import numpy as np

from ..models.feature_nets import VGGFeatureNet
from .metric_base import MetricBase


@jax.jit
def _pairwise_d2(a, b):
    """[M,F] × [N,F] → squared L2 [M,N] (one MXU matmul + rank-1 terms,
    mirroring the reference's fp16 GPU block kernel :20-44)."""
    aa = jnp.sum(jnp.square(a), axis=1, keepdims=True)
    bb = jnp.sum(jnp.square(b), axis=1, keepdims=True)
    ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    return jnp.maximum(aa - 2 * ab + bb.T, 0.0)


class ManifoldEstimator:
    def __init__(self, features: np.ndarray, nhood_size: int = 3,
                 row_batch: int = 2048, col_batch: int = 4096):
        self._features = jnp.asarray(features, jnp.float32)
        self.nhood_size = nhood_size
        self.row_batch = row_batch
        self.col_batch = col_batch
        n = features.shape[0]
        radii = np.zeros(n, np.float32)
        for r0 in range(0, n, row_batch):
            rows = self._features[r0:r0 + row_batch]
            d2 = np.zeros((rows.shape[0], n), np.float32)
            for c0 in range(0, n, col_batch):
                d2[:, c0:c0 + col_batch] = np.asarray(
                    _pairwise_d2(rows, self._features[c0:c0 + col_batch]))
            # kth-NN excluding self (distance 0 is the self column)
            part = np.partition(d2, nhood_size, axis=1)
            radii[r0:r0 + rows.shape[0]] = part[:, nhood_size]
        self.radii2 = radii

    def evaluate(self, eval_features: np.ndarray) -> np.ndarray:
        """fraction membership: 1 if the eval point falls inside any ref
        point's kth-NN ball."""
        ef = jnp.asarray(eval_features, jnp.float32)
        n = eval_features.shape[0]
        out = np.zeros(n, np.float32)
        radii = jnp.asarray(self.radii2)
        for r0 in range(0, n, self.row_batch):
            rows = ef[r0:r0 + self.row_batch]
            hit = np.zeros(rows.shape[0], bool)
            m = self._features.shape[0]
            for c0 in range(0, m, self.col_batch):
                d2 = np.asarray(_pairwise_d2(rows,
                                             self._features[c0:c0 + self.col_batch]))
                hit |= (d2 <= np.asarray(radii[c0:c0 + self.col_batch])[None, :]).any(1)
            out[r0:r0 + rows.shape[0]] = hit
        return out


def knn_precision_recall_features(ref_features, eval_features,
                                  nhood_size=3):
    """precision = eval points inside the real manifold; recall = real
    points inside the generated manifold (reference :138-167)."""
    ref_mfold = ManifoldEstimator(ref_features, nhood_size)
    eval_mfold = ManifoldEstimator(eval_features, nhood_size)
    precision = ref_mfold.evaluate(eval_features).mean()
    recall = eval_mfold.evaluate(ref_features).mean()
    return dict(precision=float(precision), recall=float(recall))


class PR(MetricBase):
    def __init__(self, name, num_images=50000, nhood_size=3,
                 minibatch_per_gpu=8, row_batch_size=2048,
                 col_batch_size=4096, feature_net_weights=None, **kwargs):
        super().__init__(name)
        self.num_images = num_images
        self.nhood_size = nhood_size
        self.minibatch = minibatch_per_gpu
        self.feature_net_weights = feature_net_weights

    def _evaluate(self, sampler, dataset_args, data_dir, **kwargs):
        feat_net = VGGFeatureNet(self.feature_net_weights)
        dataset = self._open_dataset(dataset_args, data_dir)
        n = min(self.num_images, dataset.num_images)

        ref = []
        done = 0
        while done < n:
            imgs, _ = self._reals_batch(dataset, min(self.minibatch, n - done))
            ref.append(feat_net(imgs.astype(np.float32)))
            done += imgs.shape[0]
        ref = np.concatenate(ref)

        from .metric_base import apply_in_batches
        gen = []
        for imgs in sampler.random_images(n):
            gen.append(apply_in_batches(feat_net, imgs, self.minibatch))
        gen = np.concatenate(gen)

        state = knn_precision_recall_features(ref, gen, self.nhood_size)
        self._report_result(state["precision"], suffix="_precision")
        self._report_result(state["recall"], suffix="_recall")
        if feat_net.mode != "pretrained":
            self._report_result(1.0, suffix="_random_features", fmt="-1.0f")
