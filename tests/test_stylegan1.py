"""Legacy StyleGAN1 model family (config-a networks) — shape, LOD lerping
and growth semantics per /root/reference/training/networks_stylegan.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inclusivegan_tpu.models.stylegan import (DBasic, GStyle, blur2d,
                                              downscale2d, upscale2d)


def test_blur_and_scale_primitives():
    x = jnp.ones((1, 2, 8, 8))
    assert blur2d(x).shape == x.shape
    np.testing.assert_allclose(np.asarray(blur2d(x))[0, 0, 2:-2, 2:-2], 1.0,
                               rtol=1e-6)
    up = upscale2d(x)
    assert up.shape == (1, 2, 16, 16)
    np.testing.assert_allclose(np.asarray(downscale2d(up)), np.asarray(x),
                               rtol=1e-6)


def test_gstyle_forward():
    g = GStyle.create(resolution=32, num_channels=3, latent_size=32,
                      dlatent_size=32, fmap_base=256, fmap_max=32,
                      mapping_layers=2, mapping_fmaps=32)
    params = g.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (2, 32))
    img = g.apply(params, z, rng=jax.random.key(2))
    assert img.shape == (2, 3, 32, 32)
    assert np.isfinite(np.asarray(img)).all()


def test_gstyle_lod_blending():
    g = GStyle.create(resolution=32, num_channels=3, latent_size=32,
                      dlatent_size=32, fmap_base=256, fmap_max=32,
                      mapping_layers=2, mapping_fmaps=32)
    params = g.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (2, 32))
    img0 = g.apply(params, z, rng=jax.random.key(2), lod=0.0,
                   randomize_noise=False)
    img_hi = g.apply(params, z, rng=jax.random.key(2), lod=2.0,
                     randomize_noise=False)
    # at high lod the output is an upscaled low-res image: constant 2x2 blocks
    arr = np.asarray(img_hi)
    blocks = arr.reshape(2, 3, 16, 2, 16, 2)
    np.testing.assert_allclose(blocks[..., 0, :, 0], blocks[..., 1, :, 1],
                               rtol=1e-4, atol=1e-5)
    assert float(np.abs(np.asarray(img0) - arr).max()) > 1e-4


def test_dbasic_forward_and_label_switch():
    d = DBasic(resolution=32, num_channels=3, fmap_base=256, fmap_max=32,
               mbstd_group_size=2, label_size=0)
    params = d.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (4, 3, 32, 32))
    scores = d.apply(params, x)
    assert scores.shape == (4,)

    d10 = DBasic(resolution=32, num_channels=3, fmap_base=256, fmap_max=32,
                 mbstd_group_size=2, label_size=10)
    params = d10.init(jax.random.key(0))
    labels = jnp.eye(10)[jnp.array([1, 2, 3, 4])]
    scores = d10.apply(params, x, labels)
    assert scores.shape == (4,)
    assert np.isfinite(np.asarray(scores)).all()
