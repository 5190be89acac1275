"""Metric math tests in the style of the reference's only unit-test file
(precision-recall-distributions/prd_score_test.py) plus machinery checks for
mode_counts/KL/PR."""

import numpy as np
import pytest

from inclusivegan_tpu.prd import (compute_prd, compute_prd_from_embedding,
                                  prd_to_max_f_beta_pair)
from inclusivegan_tpu.metrics.KL import kl_to_uniform
from inclusivegan_tpu.metrics.mode_counts import count_modes
from inclusivegan_tpu.metrics.precision_recall import (
    knn_precision_recall_features)
from inclusivegan_tpu.metrics.linear_separability import conditional_entropy


# --- PRD math (mirrors prd_score_test.py:28-60 semantics) -----------------

def test_prd_no_overlap_is_zero():
    p, r = compute_prd([0, 1], [1, 0], num_angles=11)
    assert np.allclose(p, 0) and np.allclose(r, 0)


def test_prd_perfect_overlap():
    p, r = compute_prd([0.5, 0.5], [0.5, 0.5], num_angles=11)
    assert p.max() > 0.99 and r.max() > 0.99


def test_prd_asymmetry():
    # eval covers only one of two ref modes: precision high, recall capped
    p, r = compute_prd([1.0, 0.0], [0.5, 0.5], num_angles=1001)
    f8, f1_8 = prd_to_max_f_beta_pair(p, r, beta=8)
    # recall-weighted F8 suffers; precision-weighted F1/8 stays high
    assert f1_8 > 0.9
    assert f8 < 0.75


def test_prd_bad_epsilon_raises():
    with pytest.raises(ValueError):
        compute_prd([1], [1], epsilon=0.5)
    with pytest.raises(ValueError):
        compute_prd([1], [1], num_angles=2)


def test_prd_from_embedding_identical_distributions():
    data = np.random.RandomState(0).randn(400, 8)
    p, r = compute_prd_from_embedding(data, data.copy(), num_clusters=5,
                                      num_runs=2)
    f8, f1_8 = prd_to_max_f_beta_pair(p, r)
    assert f8 > 0.95 and f1_8 > 0.95


def test_prd_balance_enforcement():
    with pytest.raises(ValueError):
        compute_prd_from_embedding(np.zeros((10, 2)), np.zeros((20, 2)))


# --- stacked-MNIST mode metrics -------------------------------------------

def test_kl_uniform_is_zero():
    modes = np.repeat(np.arange(1000), 10)
    assert kl_to_uniform(modes) < 1e-12


def test_kl_collapsed_is_log1000():
    modes = np.zeros(5000, np.int64)
    np.testing.assert_allclose(kl_to_uniform(modes), np.log(1000), rtol=1e-9)


def test_count_modes():
    assert count_modes(np.array([1, 5, 5, 999])) == 3


# --- kNN precision/recall ---------------------------------------------------

def test_knn_pr_identical_sets():
    feats = np.random.RandomState(0).randn(256, 16).astype(np.float32)
    res = knn_precision_recall_features(feats, feats.copy(), nhood_size=3)
    assert res["precision"] == 1.0 and res["recall"] == 1.0


def test_knn_pr_disjoint_sets():
    r = np.random.RandomState(0)
    a = r.randn(256, 16).astype(np.float32)
    b = r.randn(256, 16).astype(np.float32) + 100.0
    res = knn_precision_recall_features(a, b, nhood_size=3)
    assert res["precision"] < 0.05 and res["recall"] < 0.05


# --- conditional entropy ----------------------------------------------------

def test_conditional_entropy_perfect_predictor():
    y = np.random.RandomState(0).randint(2, size=1000)
    assert conditional_entropy(y, y) < 1e-9


def test_conditional_entropy_random_predictor():
    r = np.random.RandomState(0)
    y = r.randint(2, size=200000)
    pred = r.randint(2, size=200000)
    assert abs(conditional_entropy(y, pred) - 1.0) < 0.01


# --- stacked-MNIST classifier plumbing -------------------------------------

def test_stacked_classifier_mode_ids():
    from inclusivegan_tpu.models.feature_nets import StackedMNISTClassifier
    clf = StackedMNISTClassifier()
    imgs = np.random.RandomState(0).randint(
        0, 256, (8, 3, 32, 32)).astype(np.float32)
    modes = clf.modes(imgs)
    assert modes.shape == (8,)
    assert ((modes >= 0) & (modes < 1000)).all()


def test_vgg_feature_net_shapes():
    from inclusivegan_tpu.models.feature_nets import VGGFeatureNet
    net = VGGFeatureNet()
    imgs = np.random.RandomState(0).randint(
        0, 256, (4, 3, 32, 32)).astype(np.float32)
    feats = net(imgs)
    assert feats.shape == (4, net.feature_dim)
    assert np.isfinite(feats).all()
    # deterministic across instances (fixed seed)
    net2 = VGGFeatureNet()
    np.testing.assert_allclose(net2(imgs), feats, rtol=1e-6)


def test_apply_mirror_augment_flips_half():
    """Reference training/misc.py::apply_mirror_augment semantics: a random
    ~half of the NCHW batch is flipped along width, the rest untouched, and
    the input array is not mutated."""
    from inclusivegan_tpu.utils.misc import apply_mirror_augment

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (64, 3, 8, 8)).astype(np.uint8)
    orig = imgs.copy()
    out = apply_mirror_augment(imgs, np.random.default_rng(123))
    np.testing.assert_array_equal(imgs, orig)  # input untouched
    flipped = [i for i in range(64)
               if np.array_equal(out[i], orig[i, :, :, ::-1])]
    kept = [i for i in range(64) if np.array_equal(out[i], orig[i])]
    assert len(flipped) + len(kept) == 64
    assert 10 < len(flipped) < 54  # random ~half at n=64


def test_metric_reals_batch_applies_mirror_augment():
    """MetricBase._reals_batch mirrors reals only when the run used mirror
    augmentation (reference metric_base.py:128-129)."""
    from inclusivegan_tpu.metrics.metric_base import MetricBase

    class FakeDataset:
        def get_minibatch_np(self, n):
            base = np.arange(n * 3 * 4 * 4, dtype=np.uint8)
            return base.reshape(n, 3, 4, 4), np.zeros((n, 0), np.float32)

    m = MetricBase.__new__(MetricBase)
    m.name = "t"
    m._mirror_augment = False
    m._mirror_rng = np.random.default_rng(123)
    plain, _ = m._reals_batch(FakeDataset(), 32)
    m._mirror_augment = True
    mirrored, _ = m._reals_batch(FakeDataset(), 32)
    assert not np.array_equal(plain, mirrored)
    per_img_same_or_flip = all(
        np.array_equal(mirrored[i], plain[i])
        or np.array_equal(mirrored[i], plain[i, :, :, ::-1])
        for i in range(32))
    assert per_img_same_or_flip


def test_ppl_crop_and_downsample_reference_geometry():
    """PPL's face crop must match the reference exactly (perceptual_path_
    length.py:83-93): the ASYMMETRIC window rows [3c,7c) x cols [2c,6c)
    with c=H//8 applied at ANY resolution when crop=True, then a single
    mean-pool down to <=256."""
    import numpy as np
    from inclusivegan_tpu.metrics.perceptual_path_length import (
        crop_and_downsample)

    rng = np.random.RandomState(0)

    # 128px, crop=True: cropped to 64x64 at the face window, NO downsample
    img = rng.randn(2, 3, 128, 128).astype(np.float32)
    out = np.asarray(crop_and_downsample(img, crop=True))
    assert out.shape == (2, 3, 64, 64)
    np.testing.assert_allclose(out, img[:, :, 48:112, 32:96], rtol=1e-6)

    # 128px, crop=False: untouched
    out = np.asarray(crop_and_downsample(img, crop=False))
    np.testing.assert_allclose(out, img)

    # 1024px, crop=True: crop to 512, then factor-2 mean-pool to 256
    img = rng.randn(1, 3, 1024, 1024).astype(np.float32)
    out = np.asarray(crop_and_downsample(img, crop=True))
    assert out.shape == (1, 3, 256, 256)
    c = 128
    ref = img[:, :, c * 3:c * 7, c * 2:c * 6]
    ref = ref.reshape(1, 3, 256, 2, 256, 2).mean((3, 5))
    np.testing.assert_allclose(out, ref, rtol=1e-6)

    # 512px, crop=False: factor-2 mean-pool only
    img = rng.randn(1, 3, 512, 512).astype(np.float32)
    out = np.asarray(crop_and_downsample(img, crop=False))
    ref = img.reshape(1, 3, 256, 2, 256, 2).mean((3, 5))
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_ppl_registry_crop_flags_match_reference():
    """reference metric_defaults.py:20-24: the four classic PPL variants
    crop; ppl2_wend does not."""
    from inclusivegan_tpu.metrics.metric_defaults import metric_defaults
    for name in ("ppl_zfull", "ppl_wfull", "ppl_zend", "ppl_wend"):
        assert metric_defaults[name]["crop"] is True, name
    assert metric_defaults["ppl2_wend"]["crop"] is False
