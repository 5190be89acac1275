"""Frozen feature extractors backing the metrics suite.

The reference depends on frozen TF pickles that are not shipped in-tree
(inception_v3_features.pkl, vgg16.pkl, inception_v3_softmax.pkl,
stacked_mnist_classifier.pkl — listed in /root/reference/.MISSING_LARGE_BLOBS
and loaded at metrics/frechet_inception_distance.py:28,
precision_recall.py:182, inception_score.py:27, mode_counts.py:29).

This container has no network egress, so pretrained weights cannot be
fetched. The design keeps metric *machinery* exact while making the
embedding network pluggable:

  * ``vgg16`` — the LPIPS VGG16 trunk (models/lpips.py) with global average
    pooling per tap; loads converted weights from npz when provided,
    otherwise a fixed-seed random init. Random-feature Fréchet/PR metrics
    are valid *relative* metrics (consistent ordering across snapshots of
    one run) but are NOT comparable with published Inception-FID numbers —
    every consumer prints which mode is active.
  * ``mnist_classifier`` — a small digit CNN applied per channel of a
    stacked-MNIST image; the 1000-way mode id is d_R + 10·d_G + 100·d_B
    (same label construction as dataset_tool create_mnistrgb :307-334).
    Train it once on MNIST with scripts/train_mnist_classifier.py; metric
    results files record the classifier checksum.
"""

import hashlib
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, random

from .lpips import _VGG_LAYOUT, _preprocess, _vgg_features, init_lpips_params, load_lpips_params


# ---------------------------------------------------------------------------
# VGG16 pooled-feature embedder (FID / PR backbone)
# ---------------------------------------------------------------------------

class VGGFeatureNet:
    """images [N,C,H,W] uint8/[0,255] float → [N, 1472] pooled features
    (64+128+256+512+512 tap channels, globally average-pooled)."""

    feature_dim = 64 + 128 + 256 + 512 + 512

    def __init__(self, weights_path: Optional[str] = None, seed: int = 0):
        if weights_path and os.path.exists(weights_path):
            self.params = load_lpips_params(weights_path)
            self.mode = "pretrained"
        else:
            self.params = init_lpips_params(seed=seed)
            self.mode = "random-features"
        self._apply = jax.jit(self._apply_impl)

    def _apply_impl(self, params, img_255):
        taps = _vgg_features(params, _preprocess(img_255))
        pooled = [jnp.mean(t, axis=(2, 3)) for t in taps]
        return jnp.concatenate(pooled, axis=1)

    def __call__(self, images_255: np.ndarray) -> np.ndarray:
        return np.asarray(self._apply(self.params, jnp.asarray(images_255)))

    def checksum(self) -> str:
        leaves = jax.tree_util.tree_leaves(self.params)
        h = hashlib.md5()
        for leaf in leaves:
            h.update(np.asarray(leaf).tobytes()[:1024])
        return h.hexdigest()[:12]


# ---------------------------------------------------------------------------
# MNIST digit classifier (mode_counts / KL backbone)
# ---------------------------------------------------------------------------

def init_mnist_classifier(rng=None, seed: int = 0) -> Dict:
    """Conv(32,5x5)/pool → Conv(64,5x5)/pool → Dense(256) → Dense(10)."""
    if rng is None:
        rng = random.key(seed)
    k1, k2, k3, k4 = random.split(rng, 4)

    def he(k, shape):
        fan_in = int(np.prod(shape[:-1]))
        return random.normal(k, shape, jnp.float32) * np.sqrt(2.0 / fan_in)

    return {
        "conv1": {"w": he(k1, (5, 5, 1, 32)), "b": jnp.zeros((32,))},
        "conv2": {"w": he(k2, (5, 5, 32, 64)), "b": jnp.zeros((64,))},
        "dense1": {"w": he(k3, (64 * 8 * 8, 256)), "b": jnp.zeros((256,))},
        "dense2": {"w": he(k4, (256, 10)), "b": jnp.zeros((10,))},
    }


def mnist_classifier_logits(params, x):
    """x: [N,1,32,32] in [0,1] → logits [N,10]."""

    def conv(x, p):
        w = jnp.transpose(p["w"], (3, 2, 0, 1))
        y = lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return jnp.maximum(y + p["b"][None, :, None, None], 0)

    x = conv(x, params["conv1"])
    x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                          "VALID")
    x = conv(x, params["conv2"])
    x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                          "VALID")
    x = x.reshape(x.shape[0], -1)
    x = jnp.maximum(jnp.dot(x, params["dense1"]["w"]) + params["dense1"]["b"], 0)
    return jnp.dot(x, params["dense2"]["w"]) + params["dense2"]["b"]


class StackedMNISTClassifier:
    """RGB stacked-MNIST image → 1000-way mode id (per-channel digit CNN)."""

    def __init__(self, weights_path: Optional[str] = None, seed: int = 0):
        if weights_path is None:
            # fixed-path resolution like the reference's
            # metrics/stacked_mnist_classifier.pkl (mode_counts.py:29)
            weights_path = os.environ.get(
                "INCLUSIVEGAN_TPU_MNIST_CLASSIFIER",
                os.path.join("metrics_weights",
                             "stacked_mnist_classifier.npz"))
        if weights_path and os.path.exists(weights_path):
            data = np.load(weights_path)
            self.params = {
                name: {"w": jnp.asarray(data[f"{name}_w"]),
                       "b": jnp.asarray(data[f"{name}_b"])}
                for name in ("conv1", "conv2", "dense1", "dense2")}
            self.mode = "pretrained"
        else:
            # the reference hard-fails on a missing classifier pkl
            # (mode_counts.py:29); we degrade to random weights so smoke
            # tests can run, but make the substitution impossible to miss —
            # metric results also carry an `_untrained_classifier` suffix
            import sys
            print(f"WARNING: stacked-MNIST classifier weights not found at "
                  f"{weights_path!r}; mode_counts/KL will use an UNTRAINED "
                  f"classifier (train one with "
                  f"scripts/train_mnist_classifier.py)", file=sys.stderr)
            self.params = init_mnist_classifier(seed=seed)
            self.mode = "random-init (train with scripts/train_mnist_classifier.py)"
        self._digits = jax.jit(self._digits_impl)

    def _digits_impl(self, params, img_255):
        n, c, h, w = img_255.shape
        x = img_255.astype(jnp.float32).reshape(n * c, 1, h, w) / 255.0
        logits = mnist_classifier_logits(params, x)
        return jnp.argmax(logits, axis=1).reshape(n, c)

    def modes(self, images_255: np.ndarray) -> np.ndarray:
        """[N,3,32,32] in [0,255] → mode ids [N] in [0,1000)."""
        digits = np.asarray(self._digits(self.params, jnp.asarray(images_255)))
        return digits[:, 0] + 10 * digits[:, 1] + 100 * digits[:, 2]

    @staticmethod
    def save(params, path: str):
        flat = {}
        for name, p in params.items():
            flat[f"{name}_w"] = np.asarray(p["w"])
            flat[f"{name}_b"] = np.asarray(p["b"])
        np.savez(path, **flat)


# ---------------------------------------------------------------------------
# CelebA 40-attribute classifier — the LS metric's scorer. The reference
# downloads 40 separate frozen per-attribute classifiers
# (/root/reference/metrics/linear_separability.py:25-64); one shared trunk
# with 40 sigmoid heads covers the same capability in a single npz (train
# with scripts/train_attr_classifier.py on the synthetic-CelebA dataset).
# ---------------------------------------------------------------------------

_ATTR_LAYERS = ("conv1", "conv2", "conv3", "conv4", "dense1", "dense2")


def init_attr_classifier(rng=None, seed: int = 0, num_attrs: int = 40) -> Dict:
    """Strided conv trunk 128px -> 8px, global pool, 2 dense layers."""
    if rng is None:
        rng = random.key(seed)
    ks = random.split(rng, 6)

    def he(k, shape):
        fan_in = int(np.prod(shape[:-1]))
        return random.normal(k, shape, jnp.float32) * np.sqrt(2.0 / fan_in)

    return {
        "conv1": {"w": he(ks[0], (3, 3, 3, 32)), "b": jnp.zeros((32,))},
        "conv2": {"w": he(ks[1], (3, 3, 32, 64)), "b": jnp.zeros((64,))},
        "conv3": {"w": he(ks[2], (3, 3, 64, 128)), "b": jnp.zeros((128,))},
        "conv4": {"w": he(ks[3], (3, 3, 128, 128)), "b": jnp.zeros((128,))},
        "dense1": {"w": he(ks[4], (128, 256)), "b": jnp.zeros((256,))},
        "dense2": {"w": he(ks[5], (256, num_attrs)),
                   "b": jnp.zeros((num_attrs,))},
    }


def attr_classifier_logits(params, x):
    """x: [N,3,H,W] in [0,1] (H=W=128 nominal; any 2^k>=16 works) →
    logits [N,num_attrs]."""

    def conv(x, p, stride):
        w = jnp.transpose(p["w"], (3, 2, 0, 1))
        y = lax.conv_general_dilated(x, w, (stride, stride), "SAME",
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return jax.nn.leaky_relu(y + p["b"][None, :, None, None], 0.2)

    x = conv(x, params["conv1"], 2)
    x = conv(x, params["conv2"], 2)
    x = conv(x, params["conv3"], 2)
    x = conv(x, params["conv4"], 2)
    x = jnp.mean(x, axis=(2, 3))  # global average pool
    x = jax.nn.leaky_relu(
        jnp.dot(x, params["dense1"]["w"]) + params["dense1"]["b"], 0.2)
    return jnp.dot(x, params["dense2"]["w"]) + params["dense2"]["b"]


class CelebAAttrClassifier:
    """[N,3,H,W] uint8 images in [0,255] → attribute probabilities [N,40]."""

    def __init__(self, weights_path: Optional[str] = None, seed: int = 0):
        if weights_path is None:
            weights_path = os.environ.get(
                "INCLUSIVEGAN_TPU_ATTR_CLASSIFIER",
                os.path.join("metrics_weights", "celeba_attr_classifier.npz"))
        if weights_path and os.path.exists(weights_path):
            data = np.load(weights_path)
            self.params = {
                name: {"w": jnp.asarray(data[f"{name}_w"]),
                       "b": jnp.asarray(data[f"{name}_b"])}
                for name in _ATTR_LAYERS}
            self.mode = "pretrained"
        else:
            import sys
            print(f"WARNING: CelebA attribute classifier weights not found "
                  f"at {weights_path!r}; LS will use an UNTRAINED scorer "
                  f"(train one with scripts/train_attr_classifier.py)",
                  file=sys.stderr)
            self.params = init_attr_classifier(seed=seed)
            self.mode = ("random-init (train with "
                         "scripts/train_attr_classifier.py)")
        self._probs = jax.jit(self._probs_impl)

    def _probs_impl(self, params, img_255):
        x = img_255.astype(jnp.float32) / 255.0
        return jax.nn.sigmoid(attr_classifier_logits(params, x))

    def __call__(self, images_255: np.ndarray) -> np.ndarray:
        return np.asarray(self._probs(self.params, jnp.asarray(images_255)))

    @staticmethod
    def save(params, path: str):
        flat = {}
        for name, p in params.items():
            flat[f"{name}_w"] = np.asarray(p["w"])
            flat[f"{name}_b"] = np.asarray(p["b"])
        np.savez(path, **flat)
