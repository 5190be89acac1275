"""Inception Score — machinery parity with
/root/reference/metrics/inception_score.py: split-KL of classifier softmax
(:49-56). The reference's frozen inception_v3_softmax.pkl is not shippable
(no egress); the classifier is pluggable — provide converted weights or any
callable images→probs. The default placeholder (VGG features → fixed random
projection → softmax) exercises the pipeline but is labeled as such."""

import numpy as np

from ..models.feature_nets import VGGFeatureNet
from .metric_base import MetricBase


class IS(MetricBase):
    def __init__(self, name, num_images=50000, num_splits=10,
                 minibatch_per_gpu=8, classifier=None, num_classes=1008,
                 **kwargs):
        super().__init__(name)
        self.num_images = num_images
        self.num_splits = num_splits
        self.minibatch = minibatch_per_gpu
        self.classifier = classifier
        self.num_classes = num_classes

    def _default_classifier(self):
        feat_net = VGGFeatureNet()
        proj = np.random.RandomState(0).randn(
            feat_net.feature_dim, self.num_classes).astype(np.float32)

        def classify(images_255):
            logits = feat_net(images_255) @ proj
            logits -= logits.max(1, keepdims=True)
            e = np.exp(logits)
            return e / e.sum(1, keepdims=True)

        classify.mode = "placeholder-random"
        return classify

    def _evaluate(self, sampler, dataset_args, data_dir, **kwargs):
        classify = self.classifier or self._default_classifier()
        probs = []
        for imgs in sampler.random_images(self.num_images):
            probs.append(classify(imgs))
        probs = np.concatenate(probs)

        # split KL (reference :49-56)
        scores = []
        for i in range(self.num_splits):
            part = probs[i * probs.shape[0] // self.num_splits:
                         (i + 1) * probs.shape[0] // self.num_splits]
            kl = part * (np.log(part + 1e-16) -
                         np.log(np.expand_dims(np.mean(part, 0) + 1e-16, 0)))
            scores.append(np.exp(np.mean(np.sum(kl, 1))))
        self._report_result(float(np.mean(scores)), suffix="_mean")
        self._report_result(float(np.std(scores)), suffix="_std")
        if getattr(classify, "mode", "pretrained") != "pretrained":
            self._report_result(1.0, suffix="_placeholder_classifier", fmt="-1.0f")
