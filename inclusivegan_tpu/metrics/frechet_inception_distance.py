"""FID — capability parity with
/root/reference/metrics/frechet_inception_distance.py.

Reference pipeline kept: embed N reals (μ/Σ cached keyed on dataset+count,
:32-45) and N fakes (:48-57), Fréchet distance via scipy sqrtm (:68-71).
The embedder is pluggable (see models/feature_nets.py): converted VGG/
Inception weights when available, deterministic random features otherwise —
the active mode is recorded in the result suffix."""

import os
import pickle

import numpy as np
import scipy.linalg

from ..models.feature_nets import VGGFeatureNet
from .metric_base import MetricBase


class FID(MetricBase):
    def __init__(self, name, num_images=10000, minibatch_per_gpu=8,
                 feature_net="inception_v3", feature_net_weights=None,
                 **kwargs):
        super().__init__(name)
        self.num_images = num_images
        self.minibatch = minibatch_per_gpu
        self.feature_net = feature_net
        self.feature_net_weights = feature_net_weights

    def _evaluate(self, sampler, dataset_args, data_dir, **kwargs):
        if self.feature_net == "inception_v3":
            from ..models.inception import InceptionV3
            feat_net = InceptionV3(self.feature_net_weights)
        else:
            feat_net = VGGFeatureNet(self.feature_net_weights)

        # reals (cached)
        cache = self._get_cache_file(dataset_args=repr(dataset_args),
                                     data_dir=data_dir,
                                     num_images=self.num_images,
                                     net=feat_net.checksum(),
                                     mirror_augment=self._mirror_augment)
        if os.path.isfile(cache):
            with open(cache, "rb") as f:
                mu_real, sigma_real = pickle.load(f)
        else:
            dataset = self._open_dataset(dataset_args, data_dir)
            feats = []
            done = 0
            while done < self.num_images and done < dataset.num_images:
                imgs, _ = self._reals_batch(
                    dataset, min(self.minibatch, self.num_images - done))
                feats.append(feat_net(imgs.astype(np.float32)))
                done += imgs.shape[0]
            feats = np.concatenate(feats)
            mu_real = np.mean(feats, axis=0)
            sigma_real = np.cov(feats, rowvar=False)
            with open(cache, "wb") as f:
                pickle.dump((mu_real, sigma_real), f)

        # fakes
        from .metric_base import apply_in_batches
        feats = []
        for imgs in sampler.random_images(self.num_images):
            feats.append(apply_in_batches(feat_net, imgs, self.minibatch))
        feats = np.concatenate(feats)
        mu_fake = np.mean(feats, axis=0)
        sigma_fake = np.cov(feats, rowvar=False)

        # Fréchet distance (reference :68-71)
        m = np.square(mu_fake - mu_real).sum()
        s = scipy.linalg.sqrtm(np.dot(sigma_fake, sigma_real))
        dist = m + np.trace(sigma_fake + sigma_real - 2 * s)
        self._report_result(np.real(dist))
        if feat_net.mode != "pretrained":
            self._report_result(1.0, suffix="_random_features", fmt="-1.0f")
