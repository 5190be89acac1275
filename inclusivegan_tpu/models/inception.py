"""InceptionV3 pool_3 feature extractor in JAX.

The reference FID/IS metrics load a frozen TF ``inception_v3_features.pkl``
/ ``inception_v3_softmax.pkl`` (/root/reference/metrics/
frechet_inception_distance.py:28, inception_score.py:27). This implements
the full InceptionV3 architecture (2048-d pool_3 features + optional 1008-way
logits head) so converted weights reproduce published FID numbers exactly;
without weights it runs as a deterministic random-feature embedder like the
VGG backbone (models/feature_nets.py — same no-egress policy).

Weight layout: npz of ``<path>.w`` [kh,kw,Cin,Cout], ``<path>.beta``,
``<path>.mean``, ``<path>.var`` per BasicConv (BN with scale=False,
eps=1e-3, matching both TF-slim and torchvision) — convert with
scripts/convert_inception_weights.py.
"""

import math
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, random

BN_EPS = 1e-3


def _conv_spec(name, cin, cout, k, stride=1, pad=None):
    if pad is None:
        pad = (k // 2 if isinstance(k, int) else None)
    return dict(name=name, cin=cin, cout=cout, k=k, stride=stride, pad=pad)


# ---------------------------------------------------------------------------
# architecture table
# ---------------------------------------------------------------------------

def _stem():
    return [
        _conv_spec("Conv2d_1a_3x3", 3, 32, 3, stride=2, pad=0),
        _conv_spec("Conv2d_2a_3x3", 32, 32, 3, pad=0),
        _conv_spec("Conv2d_2b_3x3", 32, 64, 3, pad=1),
        "maxpool",
        _conv_spec("Conv2d_3b_1x1", 64, 80, 1, pad=0),
        _conv_spec("Conv2d_4a_3x3", 80, 192, 3, pad=0),
        "maxpool",
    ]


class InceptionV3:
    """Functional InceptionV3; params are a flat dict name → conv params."""

    feature_dim = 2048

    def __init__(self, weights_path: Optional[str] = None, seed: int = 0,
                 num_logits: int = 1008):
        self.num_logits = num_logits
        if weights_path and os.path.exists(weights_path):
            data = np.load(weights_path)
            self.params = {k: jnp.asarray(v) for k, v in data.items()}
            self.mode = "pretrained"
        else:
            self.params = self._random_init(seed)
            self.mode = "random-features"
        self._features = jax.jit(self._features_impl)

    # ------------------------------------------------------------------
    def _conv_names(self) -> List[Tuple[str, int, int, Any, int, Any]]:
        """Enumerate every BasicConv in the network: (name, cin, cout,
        kernel, stride, pad). kernel may be (kh, kw)."""
        out = []

        def c(name, cin, cout, k, stride=1, pad=0):
            out.append((name, cin, cout, k, stride, pad))

        for spec in _stem():
            if spec == "maxpool":
                continue
            c(spec["name"], spec["cin"], spec["cout"], spec["k"],
              spec["stride"], spec["pad"])

        # InceptionA(in, pool_features): Mixed_5b/5c/5d
        for name, cin, pf in [("Mixed_5b", 192, 32), ("Mixed_5c", 256, 64),
                              ("Mixed_5d", 288, 64)]:
            c(f"{name}.branch1x1", cin, 64, 1)
            c(f"{name}.branch5x5_1", cin, 48, 1)
            c(f"{name}.branch5x5_2", 48, 64, 5, pad=2)
            c(f"{name}.branch3x3dbl_1", cin, 64, 1)
            c(f"{name}.branch3x3dbl_2", 64, 96, 3, pad=1)
            c(f"{name}.branch3x3dbl_3", 96, 96, 3, pad=1)
            c(f"{name}.branch_pool", cin, pf, 1)

        # InceptionB: Mixed_6a (in 288)
        c("Mixed_6a.branch3x3", 288, 384, 3, stride=2, pad=0)
        c("Mixed_6a.branch3x3dbl_1", 288, 64, 1)
        c("Mixed_6a.branch3x3dbl_2", 64, 96, 3, pad=1)
        c("Mixed_6a.branch3x3dbl_3", 96, 96, 3, stride=2, pad=0)

        # InceptionC(c7): Mixed_6b..6e (in 768)
        for name, c7 in [("Mixed_6b", 128), ("Mixed_6c", 160),
                         ("Mixed_6d", 160), ("Mixed_6e", 192)]:
            cin = 768
            c(f"{name}.branch1x1", cin, 192, 1)
            c(f"{name}.branch7x7_1", cin, c7, 1)
            c(f"{name}.branch7x7_2", c7, c7, (1, 7), pad=(0, 3))
            c(f"{name}.branch7x7_3", c7, 192, (7, 1), pad=(3, 0))
            c(f"{name}.branch7x7dbl_1", cin, c7, 1)
            c(f"{name}.branch7x7dbl_2", c7, c7, (7, 1), pad=(3, 0))
            c(f"{name}.branch7x7dbl_3", c7, c7, (1, 7), pad=(0, 3))
            c(f"{name}.branch7x7dbl_4", c7, c7, (7, 1), pad=(3, 0))
            c(f"{name}.branch7x7dbl_5", c7, 192, (1, 7), pad=(0, 3))
            c(f"{name}.branch_pool", cin, 192, 1)

        # InceptionD: Mixed_7a (in 768)
        c("Mixed_7a.branch3x3_1", 768, 192, 1)
        c("Mixed_7a.branch3x3_2", 192, 320, 3, stride=2, pad=0)
        c("Mixed_7a.branch7x7x3_1", 768, 192, 1)
        c("Mixed_7a.branch7x7x3_2", 192, 192, (1, 7), pad=(0, 3))
        c("Mixed_7a.branch7x7x3_3", 192, 192, (7, 1), pad=(3, 0))
        c("Mixed_7a.branch7x7x3_4", 192, 192, 3, stride=2, pad=0)

        # InceptionE: Mixed_7b (in 1280), Mixed_7c (in 2048)
        for name, cin in [("Mixed_7b", 1280), ("Mixed_7c", 2048)]:
            c(f"{name}.branch1x1", cin, 320, 1)
            c(f"{name}.branch3x3_1", cin, 384, 1)
            c(f"{name}.branch3x3_2a", 384, 384, (1, 3), pad=(0, 1))
            c(f"{name}.branch3x3_2b", 384, 384, (3, 1), pad=(1, 0))
            c(f"{name}.branch3x3dbl_1", cin, 448, 1)
            c(f"{name}.branch3x3dbl_2", 448, 384, 3, pad=1)
            c(f"{name}.branch3x3dbl_3a", 384, 384, (1, 3), pad=(0, 1))
            c(f"{name}.branch3x3dbl_3b", 384, 384, (3, 1), pad=(1, 0))
            c(f"{name}.branch_pool", cin, 192, 1)
        return out

    def _random_init(self, seed: int) -> Dict[str, jnp.ndarray]:
        rng = random.key(seed)
        params = {}
        for name, cin, cout, k, _s, _p in self._conv_names():
            kh, kw = (k, k) if isinstance(k, int) else k
            rng, kk = random.split(rng)
            std = math.sqrt(2.0 / (kh * kw * cin))
            params[f"{name}.w"] = random.normal(
                kk, (kh, kw, cin, cout), jnp.float32) * std
            params[f"{name}.beta"] = jnp.zeros((cout,), jnp.float32)
            params[f"{name}.mean"] = jnp.zeros((cout,), jnp.float32)
            params[f"{name}.var"] = jnp.ones((cout,), jnp.float32)
        rng, kk = random.split(rng)
        params["logits.w"] = random.normal(
            kk, (2048, self.num_logits), jnp.float32) * 0.02
        params["logits.b"] = jnp.zeros((self.num_logits,), jnp.float32)
        return params

    # ------------------------------------------------------------------
    def _bconv(self, p, x, name, stride=1, pad=0):
        w = jnp.transpose(p[f"{name}.w"], (3, 2, 0, 1)).astype(x.dtype)
        if isinstance(pad, int):
            pad = (pad, pad)
        y = lax.conv_general_dilated(
            x, w, (stride, stride), [(pad[0], pad[0]), (pad[1], pad[1])],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        inv = lax.rsqrt(p[f"{name}.var"] + BN_EPS)
        y = (y - p[f"{name}.mean"][None, :, None, None]) * \
            inv[None, :, None, None] + p[f"{name}.beta"][None, :, None, None]
        return jnp.maximum(y, 0.0)

    @staticmethod
    def _maxpool(x, k=3, s=2):
        return lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, k, k),
                                 (1, 1, s, s), "VALID")

    @staticmethod
    def _avgpool_same(x, k=3):
        ones = jnp.ones_like(x)
        sum_ = lax.reduce_window(x, 0.0, lax.add, (1, 1, k, k), (1, 1, 1, 1),
                                 "SAME")
        cnt = lax.reduce_window(ones, 0.0, lax.add, (1, 1, k, k),
                                (1, 1, 1, 1), "SAME")
        return sum_ / cnt

    def _features_impl(self, params, img_255):
        """[N,C,H,W] in [0,255] → pool_3 features [N,2048]."""
        p = params
        x = img_255.astype(jnp.float32)
        if x.shape[1] == 1:
            x = jnp.tile(x, (1, 3, 1, 1))
        if x.shape[2] != 299:
            x = jax.image.resize(x, (x.shape[0], 3, 299, 299), "bilinear")
        x = x / 127.5 - 1.0

        bc = self._bconv
        x = bc(p, x, "Conv2d_1a_3x3", stride=2)
        x = bc(p, x, "Conv2d_2a_3x3")
        x = bc(p, x, "Conv2d_2b_3x3", pad=1)
        x = self._maxpool(x)
        x = bc(p, x, "Conv2d_3b_1x1")
        x = bc(p, x, "Conv2d_4a_3x3")
        x = self._maxpool(x)

        def inception_a(x, name):
            b1 = bc(p, x, f"{name}.branch1x1")
            b2 = bc(p, bc(p, x, f"{name}.branch5x5_1"), f"{name}.branch5x5_2",
                    pad=2)
            b3 = bc(p, bc(p, bc(p, x, f"{name}.branch3x3dbl_1"),
                          f"{name}.branch3x3dbl_2", pad=1),
                    f"{name}.branch3x3dbl_3", pad=1)
            b4 = bc(p, self._avgpool_same(x), f"{name}.branch_pool")
            return jnp.concatenate([b1, b2, b3, b4], axis=1)

        x = inception_a(x, "Mixed_5b")
        x = inception_a(x, "Mixed_5c")
        x = inception_a(x, "Mixed_5d")

        # Mixed_6a
        b1 = bc(p, x, "Mixed_6a.branch3x3", stride=2)
        b2 = bc(p, bc(p, bc(p, x, "Mixed_6a.branch3x3dbl_1"),
                      "Mixed_6a.branch3x3dbl_2", pad=1),
                "Mixed_6a.branch3x3dbl_3", stride=2)
        b3 = self._maxpool(x)
        x = jnp.concatenate([b1, b2, b3], axis=1)

        def inception_c(x, name):
            b1 = bc(p, x, f"{name}.branch1x1")
            b2 = bc(p, x, f"{name}.branch7x7_1")
            b2 = bc(p, b2, f"{name}.branch7x7_2", pad=(0, 3))
            b2 = bc(p, b2, f"{name}.branch7x7_3", pad=(3, 0))
            b3 = bc(p, x, f"{name}.branch7x7dbl_1")
            b3 = bc(p, b3, f"{name}.branch7x7dbl_2", pad=(3, 0))
            b3 = bc(p, b3, f"{name}.branch7x7dbl_3", pad=(0, 3))
            b3 = bc(p, b3, f"{name}.branch7x7dbl_4", pad=(3, 0))
            b3 = bc(p, b3, f"{name}.branch7x7dbl_5", pad=(0, 3))
            b4 = bc(p, self._avgpool_same(x), f"{name}.branch_pool")
            return jnp.concatenate([b1, b2, b3, b4], axis=1)

        for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
            x = inception_c(x, name)

        # Mixed_7a
        b1 = bc(p, bc(p, x, "Mixed_7a.branch3x3_1"), "Mixed_7a.branch3x3_2",
                stride=2)
        b2 = bc(p, x, "Mixed_7a.branch7x7x3_1")
        b2 = bc(p, b2, "Mixed_7a.branch7x7x3_2", pad=(0, 3))
        b2 = bc(p, b2, "Mixed_7a.branch7x7x3_3", pad=(3, 0))
        b2 = bc(p, b2, "Mixed_7a.branch7x7x3_4", stride=2)
        b3 = self._maxpool(x)
        x = jnp.concatenate([b1, b2, b3], axis=1)

        def inception_e(x, name):
            b1 = bc(p, x, f"{name}.branch1x1")
            b2 = bc(p, x, f"{name}.branch3x3_1")
            b2 = jnp.concatenate([bc(p, b2, f"{name}.branch3x3_2a", pad=(0, 1)),
                                  bc(p, b2, f"{name}.branch3x3_2b", pad=(1, 0))],
                                 axis=1)
            b3 = bc(p, bc(p, x, f"{name}.branch3x3dbl_1"),
                    f"{name}.branch3x3dbl_2", pad=1)
            b3 = jnp.concatenate([bc(p, b3, f"{name}.branch3x3dbl_3a", pad=(0, 1)),
                                  bc(p, b3, f"{name}.branch3x3dbl_3b", pad=(1, 0))],
                                 axis=1)
            b4 = bc(p, self._avgpool_same(x), f"{name}.branch_pool")
            return jnp.concatenate([b1, b2, b3, b4], axis=1)

        x = inception_e(x, "Mixed_7b")
        x = inception_e(x, "Mixed_7c")
        return jnp.mean(x, axis=(2, 3))  # pool_3 [N, 2048]

    # ------------------------------------------------------------------
    def __call__(self, images_255: np.ndarray) -> np.ndarray:
        return np.asarray(self._features(self.params, jnp.asarray(images_255)))

    def softmax_probs(self, images_255: np.ndarray) -> np.ndarray:
        feats = self._features(self.params, jnp.asarray(images_255))
        logits = feats @ self.params["logits.w"] + self.params["logits.b"]
        return np.asarray(jax.nn.softmax(logits, axis=-1))

    def checksum(self) -> str:
        import hashlib
        h = hashlib.md5()
        for k in sorted(self.params):
            h.update(np.asarray(self.params[k]).tobytes()[:256])
        return h.hexdigest()[:12]
