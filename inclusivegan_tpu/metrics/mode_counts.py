"""Stacked-MNIST mode coverage — parity with
/root/reference/metrics/mode_counts.py: count the distinct classifier modes
(max 1000) among num_images samples (:44-49)."""

import numpy as np

from ..models.feature_nets import StackedMNISTClassifier
from .metric_base import MetricBase


class ModeCounts(MetricBase):
    def __init__(self, name, num_images=24576, minibatch_per_gpu=32,
                 classifier_weights=None, **kwargs):
        super().__init__(name)
        self.num_images = num_images
        self.minibatch = minibatch_per_gpu
        self.classifier_weights = classifier_weights

    def _evaluate(self, sampler, dataset_args, data_dir, **kwargs):
        from .KL import kl_to_uniform
        clf = StackedMNISTClassifier(self.classifier_weights)
        modes = []
        for imgs in sampler.random_images(self.num_images):
            modes.append(clf.modes(imgs))
        modes = np.concatenate(modes)
        self._report_result(float(len(np.unique(modes))), fmt="-6.0f")
        # KL(modes ‖ uniform) from the SAME 24k sampling pass — the separate
        # KL24k metric re-samples (reference KL.py:44-52); on relay-attached
        # TPUs one pass costs ~2 min, so surface both numbers here too.
        self._report_result(kl_to_uniform(modes), suffix="_KL")
        if clf.mode != "pretrained":
            self._report_result(1.0, suffix="_untrained_classifier", fmt="-1.0f")


def count_modes(modes: np.ndarray) -> int:
    return int(len(np.unique(modes)))
