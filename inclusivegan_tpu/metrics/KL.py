"""Stacked-MNIST KL divergence — parity with /root/reference/metrics/KL.py:
KL(fake-mode histogram ‖ uniform over 1000) on num_images samples (:49-52)."""

import numpy as np

from ..models.feature_nets import StackedMNISTClassifier
from .metric_base import MetricBase


def kl_to_uniform(modes: np.ndarray, num_modes: int = 1000) -> float:
    hist = np.bincount(modes, minlength=num_modes).astype(np.float64)
    p = hist / hist.sum()
    q = 1.0 / num_modes
    nz = p > 0
    return float(np.sum(p[nz] * np.log(p[nz] / q)))


class KL(MetricBase):
    def __init__(self, name, num_images=24576, minibatch_per_gpu=32,
                 classifier_weights=None, **kwargs):
        super().__init__(name)
        self.num_images = num_images
        self.minibatch = minibatch_per_gpu
        self.classifier_weights = classifier_weights

    def _evaluate(self, sampler, dataset_args, data_dir, **kwargs):
        clf = StackedMNISTClassifier(self.classifier_weights)
        modes = []
        for imgs in sampler.random_images(self.num_images):
            modes.append(clf.modes(imgs))
        modes = np.concatenate(modes)
        self._report_result(kl_to_uniform(modes))
        if clf.mode != "pretrained":
            self._report_result(1.0, suffix="_untrained_classifier", fmt="-1.0f")
