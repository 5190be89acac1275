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
                 classifier_weights=None, **kwargs):
        super().__init__(name)
        self.num_images = num_images
        self.num_splits = num_splits
        self.minibatch = minibatch_per_gpu
        self.classifier = classifier
        self.num_classes = num_classes
        self.classifier_weights = classifier_weights

    def _default_classifier(self):
        from ..models.inception import InceptionV3
        net = InceptionV3(self.classifier_weights,
                          num_logits=self.num_classes)

        def classify(images_255):
            return net.softmax_probs(images_255)

        classify.mode = net.mode
        return classify

    def _evaluate(self, sampler, dataset_args, data_dir, **kwargs):
        classify = self.classifier or self._default_classifier()
        from .metric_base import apply_in_batches
        probs = []
        for imgs in sampler.random_images(self.num_images):
            probs.append(apply_in_batches(classify, imgs, self.minibatch))
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
            self._report_result(1.0, suffix="_random_classifier", fmt="-1.0f")
