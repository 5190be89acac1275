"""Synthetic-MNIST generator (scripts/make_synthetic_mnist.py): idx-ubyte
files round-trip through the dataset_tool loaders and the glyph classes are
visually separable (nearest-class-mean classification on raw pixels)."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_idx_roundtrip_and_separability(tmp_path):
    out = str(tmp_path / "mnist")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/make_synthetic_mnist.py"),
         "--out", out, "--num-images", "600", "--seed", "3"],
        check=True, capture_output=True)

    from inclusivegan_tpu.data.dataset_tool import (_find, _load_mnist_images,
                                                    _load_mnist_labels)
    imgs = _load_mnist_images(_find(out, "train-images-idx3-ubyte*"))
    labs = _load_mnist_labels(_find(out, "train-labels-idx1-ubyte*"))
    assert imgs.shape == (600, 28, 28) and imgs.dtype == np.uint8
    assert labs.shape == (600,) and set(np.unique(labs)) == set(range(10))

    # class-mean template matching on raw pixels must beat chance by far
    # (the geometric augmentation caps it well below the CNN's 100%
    # held-out accuracy, but classes must not be degenerate)
    x = imgs.reshape(600, -1).astype(np.float32) / 255.0
    means = np.stack([x[labs == d].mean(axis=0) for d in range(10)])
    pred = np.argmin(
        ((x[:, None, :] - means[None]) ** 2).sum(-1), axis=1)
    assert (pred == labs).mean() > 0.5


def test_deterministic_given_seed(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for out in (a, b):
        subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts/make_synthetic_mnist.py"),
             "--out", out, "--num-images", "64", "--seed", "7"],
            check=True, capture_output=True)
    pa = open(os.path.join(a, "train-images-idx3-ubyte"), "rb").read()
    pb = open(os.path.join(b, "train-images-idx3-ubyte"), "rb").read()
    assert pa == pb
