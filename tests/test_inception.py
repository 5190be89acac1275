"""InceptionV3 architecture tests: output shapes, determinism, param count
(trunk 21.8M + 1008-way head ≈ 23.87M, matching torchvision's inception_v3
trunk so converted weights drop in 1:1)."""

import numpy as np

from inclusivegan_tpu.models.inception import InceptionV3


def test_feature_shapes_determinism_and_softmax():
    """One compiled shape exercises features + determinism + softmax head
    (each extra input shape costs a multi-minute CPU compile on this host)."""
    net = InceptionV3(seed=3)
    imgs = np.random.RandomState(0).randint(0, 256, (2, 3, 64, 64)).astype(np.float32)
    f = net(imgs)
    assert f.shape == (2, 2048)
    assert np.isfinite(f).all()
    net2 = InceptionV3(seed=3)
    np.testing.assert_allclose(net2(imgs), f, rtol=1e-6)
    probs = net2.softmax_probs(imgs)
    assert probs.shape == (2, 1008)
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-5)
    # grayscale broadcast reuses the same 64px compiled program? (no — but
    # 32px gray is the cheapest second shape and covers the resize+tile path)
    gray = np.random.RandomState(1).randint(0, 256, (2, 1, 32, 32)).astype(np.float32)
    assert net2(gray).shape == (2, 2048)


def test_param_count_matches_torchvision_trunk():
    net = InceptionV3()
    n = sum(int(np.prod(v.shape)) for v in net.params.values())
    # conv trunk 21,802,784 (3×{w,beta,mean,var} accounting) + logits 2048*1008+1008
    assert 23_000_000 < n < 25_000_000, n
