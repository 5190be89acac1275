"""Legacy StyleGAN1 networks — capability parity with
/root/reference/training/networks_stylegan.py (config-a model family:
G_style :301, G_mapping :383, G_synthesis :439, D_basic :563).

Semantics kept: blur [1,2,1] on resampling (:21-131), equalized LR, noise →
bias → lrelu → instance-norm → style modulation epilogue (:489-501),
progressive-growing LOD lerping between ToRGB/FromRGB heads, mbstd group 4,
label-switch D output. Structure is the reference's 'linear' variant
(:539-548, :633-643): every resolution branch is computed and lerp_clip
selects — static shapes, no data-dependent control flow, XLA-friendly (the
reference's 'recursive' tf.cond variant exists only to prune the TF1 graph;
under jit the linear form is what the compiler wants).

The reference fork's CLI never actually runs these (config-a–d are broken
there, SURVEY.md §5) — provided for model-zoo completeness.
"""

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, random

from ..ops import upfirdn2d
from .stylegan2 import GMapping, _bias_act, _dense, _wcoef, _winit, minibatch_stddev

BLUR_FILTER = (1, 2, 1)


def blur2d(x, f=BLUR_FILTER):
    """Depthwise normalized blur (reference :21-47,93-101); autodiff gives
    the flipped-filter gradient the reference hand-wrote."""
    f = jnp.asarray(f, jnp.float32)
    f = jnp.outer(f, f)
    f = f / jnp.sum(f)
    return upfirdn2d(x, f, up=1, down=1, pad=(1, 1, 1, 1))


def upscale2d(x, factor=2):
    n, c, h, w = x.shape
    x = jnp.tile(x.reshape(n, c, h, 1, w, 1), (1, 1, 1, factor, 1, factor))
    return x.reshape(n, c, h * factor, w * factor)


def downscale2d(x, factor=2):
    n, c, h, w = x.shape
    return x.reshape(n, c, h // factor, factor, w // factor,
                     factor).mean((3, 5))


def _conv2d_sg1(x, w, gain=math.sqrt(2)):
    coef = _wcoef(w.shape, gain=gain)
    kh = w.shape[0]
    pad = kh // 2
    return lax.conv_general_dilated(
        x, jnp.transpose(w * coef, (3, 2, 0, 1)).astype(x.dtype), (1, 1),
        [(pad, pad), (pad, pad)], dimension_numbers=("NCHW", "OIHW", "NCHW"))


def instance_norm(x, eps=1e-8):
    x32 = x.astype(jnp.float32)
    x32 = x32 - jnp.mean(x32, axis=(2, 3), keepdims=True)
    x32 = x32 * lax.rsqrt(jnp.mean(jnp.square(x32), axis=(2, 3),
                                   keepdims=True) + eps)
    return x32.astype(x.dtype)


def pixel_norm(x, eps=1e-8):
    return x * lax.rsqrt(jnp.mean(jnp.square(x), axis=1, keepdims=True) + eps)


def lerp_clip(a, b, t):
    return a + (b - a) * jnp.clip(t, 0.0, 1.0)


@dataclasses.dataclass(frozen=True)
class GSynthesisStyleGAN1:
    dlatent_size: int = 512
    num_channels: int = 3
    resolution: int = 1024
    fmap_base: int = 8192
    fmap_decay: float = 1.0
    fmap_max: int = 512
    use_pixel_norm: bool = False
    use_instance_norm: bool = True

    @property
    def resolution_log2(self):
        r = int(np.log2(self.resolution))
        assert self.resolution == 2 ** r and self.resolution >= 4
        return r

    @property
    def num_layers(self):
        return self.resolution_log2 * 2 - 2

    def _nf(self, stage):
        return min(int(self.fmap_base / (2.0 ** (stage * self.fmap_decay))),
                   self.fmap_max)

    def _epilogue_init(self, rng, fmaps):
        k = random.split(rng, 1)[0]
        return {
            "noise_weight": jnp.zeros((fmaps,), jnp.float32),
            "bias": jnp.zeros((fmaps,), jnp.float32),
            "StyleMod": {
                "weight": _winit(k, (self.dlatent_size, fmaps * 2), gain=1.0),
                "bias": jnp.zeros((fmaps * 2,), jnp.float32)},
        }

    def init(self, rng) -> Any:
        params = {}
        rlog2 = self.resolution_log2
        rng, kc, ke0, kcv, ke1 = random.split(rng, 5)
        params["4x4"] = {
            "Const": {"const": jnp.ones((1, self._nf(1), 4, 4), jnp.float32),
                      **self._epilogue_init(ke0, self._nf(1))},
            "Conv": {"weight": _winit(kcv, (3, 3, self._nf(1), self._nf(1))),
                     **self._epilogue_init(ke1, self._nf(1))},
        }
        for res in range(3, rlog2 + 1):
            rng, k0, ke0, k1, ke1 = random.split(rng, 5)
            params[f"{2**res}x{2**res}"] = {
                "Conv0_up": {"weight": _winit(k0, (3, 3, self._nf(res - 2),
                                                   self._nf(res - 1))),
                             **self._epilogue_init(ke0, self._nf(res - 1))},
                "Conv1": {"weight": _winit(k1, (3, 3, self._nf(res - 1),
                                                self._nf(res - 1))),
                          **self._epilogue_init(ke1, self._nf(res - 1))},
            }
        for res in range(2, rlog2 + 1):
            rng, kt = random.split(rng)
            params[f"ToRGB_lod{rlog2 - res}"] = {
                "weight": _winit(kt, (1, 1, self._nf(res - 1),
                                      self.num_channels), gain=1.0),
                "bias": jnp.zeros((self.num_channels,), jnp.float32)}
        return params

    def init_noise(self, rng) -> Any:
        noise = {}
        for layer_idx in range(self.num_layers):
            res = layer_idx // 2 + 2
            rng, k = random.split(rng)
            noise[f"noise{layer_idx}"] = random.normal(
                k, (1, 1, 2 ** res, 2 ** res), jnp.float32)
        return noise

    def apply(self, params, dlatents, *, lod: float = 0.0, noise=None,
              rng=None, randomize_noise=True):
        def epilogue(x, p, layer_idx):
            nonlocal rng
            if randomize_noise:
                assert rng is not None
                rng, k = random.split(rng)
                nz = random.normal(k, (x.shape[0], 1, x.shape[2], x.shape[3]),
                                   x.dtype)
            else:
                nz = noise[f"noise{layer_idx}"].astype(x.dtype)
            x = x + nz * p["noise_weight"][None, :, None, None].astype(x.dtype)
            x = _bias_act(x, p["bias"], act="lrelu")
            if self.use_pixel_norm:
                x = pixel_norm(x)
            if self.use_instance_norm:
                x = instance_norm(x)
            style = _dense(dlatents[:, layer_idx], p["StyleMod"]["weight"],
                           gain=1.0) + p["StyleMod"]["bias"]
            style = style.reshape(-1, 2, x.shape[1], 1, 1)
            return x * (style[:, 0] + 1) + style[:, 1]

        rlog2 = self.resolution_log2
        batch = dlatents.shape[0]
        p4 = params["4x4"]
        x = jnp.tile(p4["Const"]["const"], (batch, 1, 1, 1))
        x = epilogue(x, p4["Const"], 0)
        x = _conv2d_sg1(x, p4["Conv"]["weight"])
        x = epilogue(x, p4["Conv"], 1)

        def torgb(x, res):
            p = params[f"ToRGB_lod{rlog2 - res}"]
            y = _conv2d_sg1(x, p["weight"], gain=1.0)
            return y + p["bias"][None, :, None, None]

        # 'linear' progressive structure (reference :539-548)
        images_out = torgb(x, 2)
        for res in range(3, rlog2 + 1):
            cur_lod = rlog2 - res
            blk = params[f"{2**res}x{2**res}"]
            x = upscale2d(x)
            x = _conv2d_sg1(x, blk["Conv0_up"]["weight"])
            x = blur2d(x)
            x = epilogue(x, blk["Conv0_up"], res * 2 - 4)
            x = _conv2d_sg1(x, blk["Conv1"]["weight"])
            x = epilogue(x, blk["Conv1"], res * 2 - 3)
            img = torgb(x, res)
            images_out = upscale2d(images_out)
            images_out = lerp_clip(img, images_out, lod - cur_lod)
        return images_out


@dataclasses.dataclass(frozen=True)
class GStyle:
    """Reference G_style (:301-380): StyleGAN1 trunk with the same
    truncation/mixing/EMA plumbing as GMain but cutoff-8 truncation default."""
    mapping: GMapping
    synthesis: GSynthesisStyleGAN1
    truncation_psi: float = 0.7
    truncation_cutoff: Optional[int] = 8
    dlatent_avg_beta: float = 0.995
    style_mixing_prob: float = 0.9

    @staticmethod
    def create(resolution=1024, num_channels=3, latent_size=512,
               dlatent_size=512, fmap_base=8192, fmap_max=512,
               mapping_layers=8, mapping_fmaps=512, **kwargs) -> "GStyle":
        synthesis = GSynthesisStyleGAN1(
            dlatent_size=dlatent_size, num_channels=num_channels,
            resolution=resolution, fmap_base=fmap_base, fmap_max=fmap_max)
        mapping = GMapping(latent_size=latent_size, dlatent_size=dlatent_size,
                           dlatent_broadcast=synthesis.num_layers,
                           mapping_layers=mapping_layers,
                           mapping_fmaps=mapping_fmaps)
        return GStyle(mapping=mapping, synthesis=synthesis)

    def init(self, rng):
        k1, k2, k3 = random.split(rng, 3)
        return {"mapping": self.mapping.init(k1),
                "synthesis": self.synthesis.init(k2),
                "noise": self.synthesis.init_noise(k3),
                "dlatent_avg": jnp.zeros((self.mapping.dlatent_size,),
                                         jnp.float32)}

    def apply(self, params, latents, labels=None, *, rng=None, lod=0.0,
              is_training=False, truncation_psi=None,
              truncation_cutoff="default", randomize_noise=None):
        if truncation_psi is None:
            truncation_psi = self.truncation_psi
        if truncation_cutoff == "default":
            truncation_cutoff = self.truncation_cutoff
        if is_training:
            truncation_psi = None
        if randomize_noise is None:
            randomize_noise = True
        num_layers = self.synthesis.num_layers
        dlatents = self.mapping.apply(params["mapping"], latents,
                                      labels).astype(jnp.float32)

        if is_training and self.style_mixing_prob is not None and rng is not None:
            rng, k1, k2, k3 = random.split(rng, 4)
            latents2 = random.normal(k1, latents.shape, latents.dtype)
            dlatents2 = self.mapping.apply(params["mapping"], latents2,
                                           labels).astype(jnp.float32)
            layer_idx = jnp.arange(num_layers)[None, :, None]
            cutoff = jnp.where(random.uniform(k2) < self.style_mixing_prob,
                               random.randint(k3, (), 1, num_layers),
                               jnp.asarray(num_layers))
            dlatents = jnp.where(layer_idx < cutoff, dlatents, dlatents2)

        if not is_training and truncation_psi is not None:
            layer_idx = np.arange(num_layers)[None, :, None]
            layer_psi = np.ones(layer_idx.shape, np.float32)
            if truncation_cutoff is None:
                layer_psi *= truncation_psi
            else:
                layer_psi = np.where(layer_idx < truncation_cutoff,
                                     layer_psi * truncation_psi, layer_psi)
            dlatents = params["dlatent_avg"] + (
                dlatents - params["dlatent_avg"]) * jnp.asarray(layer_psi)

        if rng is not None:
            rng, k = random.split(rng)
        else:
            k = None
        return self.synthesis.apply(params["synthesis"], dlatents, lod=lod,
                                    noise=params["noise"], rng=k,
                                    randomize_noise=randomize_noise)


@dataclasses.dataclass(frozen=True)
class DBasic:
    """Reference D_basic (:563-655), 'linear' progressive structure."""
    num_channels: int = 1
    resolution: int = 32
    label_size: int = 0
    fmap_base: int = 8192
    fmap_decay: float = 1.0
    fmap_max: int = 512
    mbstd_group_size: int = 4
    mbstd_num_features: int = 1

    @property
    def resolution_log2(self):
        r = int(np.log2(self.resolution))
        assert self.resolution == 2 ** r and self.resolution >= 4
        return r

    def _nf(self, stage):
        return min(int(self.fmap_base / (2.0 ** (stage * self.fmap_decay))),
                   self.fmap_max)

    def init(self, rng):
        params = {}
        rlog2 = self.resolution_log2
        for res in range(rlog2, 2, -1):
            rng, k0, k1 = random.split(rng, 3)
            params[f"{2**res}x{2**res}"] = {
                "Conv0": {"weight": _winit(k0, (3, 3, self._nf(res - 1),
                                                self._nf(res - 1))),
                          "bias": jnp.zeros((self._nf(res - 1),), jnp.float32)},
                "Conv1_down": {"weight": _winit(k1, (3, 3, self._nf(res - 1),
                                                     self._nf(res - 2))),
                               "bias": jnp.zeros((self._nf(res - 2),),
                                                 jnp.float32)},
            }
        for res in range(2, rlog2 + 1):
            rng, kf = random.split(rng)
            params[f"FromRGB_lod{rlog2 - res}"] = {
                "weight": _winit(kf, (1, 1, self.num_channels,
                                      self._nf(res - 1))),
                "bias": jnp.zeros((self._nf(res - 1),), jnp.float32)}
        mbstd_ch = self.mbstd_num_features if self.mbstd_group_size > 1 else 0
        rng, kc, kd0, kd1 = random.split(rng, 4)
        params["4x4"] = {
            "Conv": {"weight": _winit(kc, (3, 3, self._nf(1) + mbstd_ch,
                                           self._nf(1))),
                     "bias": jnp.zeros((self._nf(1),), jnp.float32)},
            "Dense0": {"weight": _winit(kd0, (self._nf(1) * 16, self._nf(0))),
                       "bias": jnp.zeros((self._nf(0),), jnp.float32)},
            "Dense1": {"weight": _winit(kd1, (self._nf(0),
                                              max(self.label_size, 1)),
                                        gain=1.0),
                       "bias": jnp.zeros((max(self.label_size, 1),),
                                         jnp.float32)},
        }
        return params

    def apply(self, params, images, labels=None, *, lod: float = 0.0):
        rlog2 = self.resolution_log2

        def fromrgb(img, res):
            p = params[f"FromRGB_lod{rlog2 - res}"]
            return _bias_act(_conv2d_sg1(img, p["weight"]), p["bias"],
                             act="lrelu")

        img = images.astype(jnp.float32)
        x = fromrgb(img, rlog2)
        for res in range(rlog2, 2, -1):
            cur_lod = rlog2 - res
            blk = params[f"{2**res}x{2**res}"]
            x = _bias_act(_conv2d_sg1(x, blk["Conv0"]["weight"]),
                          blk["Conv0"]["bias"], act="lrelu")
            x = blur2d(x)
            x = _conv2d_sg1(x, blk["Conv1_down"]["weight"])
            x = downscale2d(x)
            x = _bias_act(x, blk["Conv1_down"]["bias"], act="lrelu")
            img = downscale2d(img)
            y = fromrgb(img, res - 1)
            x = lerp_clip(x, y, lod - cur_lod)

        p4 = params["4x4"]
        if self.mbstd_group_size > 1:
            x = minibatch_stddev(x, self.mbstd_group_size,
                                 self.mbstd_num_features)
        x = _bias_act(_conv2d_sg1(x, p4["Conv"]["weight"]), p4["Conv"]["bias"],
                      act="lrelu")
        x = _bias_act(_dense(x, p4["Dense0"]["weight"]), p4["Dense0"]["bias"],
                      act="lrelu")
        x = _bias_act(_dense(x, p4["Dense1"]["weight"], gain=1.0),
                      p4["Dense1"]["bias"])
        if self.label_size:
            x = jnp.sum(x * labels.astype(x.dtype), axis=1, keepdims=True)
        return jnp.squeeze(x, axis=1)
