"""StyleGAN2 networks — functional JAX re-design of the reference model zoo
(/root/reference/training/networks_stylegan2.py).

Capability parity (file:line cites refer to that file):
  * equalized learning rate + lrmul + ``init_mul`` knob (get_weight :22-36)
  * mapping net: z-normalize, 8×512 lrelu, lrmul 0.01, broadcast (:252-304)
  * synthesis: const 4×4 input, modulated conv with demodulation (:89-127),
    per-layer noise with learned strength (:349-357), skip / resnet / orig
    architectures (:360-398), resample_kernel [1,3,3,1]
  * G_main: dlatent_avg EMA (β=0.995), style-mixing regularization (p=0.9),
    truncation trick with optional cutoff (:151-245)
  * D: fromrgb/blocks/minibatch-stddev (:132-144,442-452) plus the fork's
    multi-scale normalized ``features_out`` head (feature_concat :457-507)

TPU-native design decisions (NOT a translation):
  * Pure functions over parameter pytrees — no graph/session/variable-scope
    machinery. The dlatent_avg EMA is *returned* from the training forward
    pass and threaded through the train state instead of being a hidden
    assign side effect (:201-207): side effects don't exist under jit.
  * Modulated conv always uses the mathematically-identical input/output
    scaling form (the reference's ``fused_modconv=False`` branch, :111-126):
    per-sample grouped weights defeat XLA's batched MXU tiling, whereas
    scale→conv→scale keeps one large conv per layer. The demodulation factor
    is computed as ``rsqrt(s² · Σ_spatial w² + ε)`` — one [B,I]×[I,O] matmul
    instead of materializing [B,k,k,I,O].
  * Parameter trees are nested dicts keyed by the reference's variable-scope
    names ('4x4/Conv/weight', ...) so snapshot conversion and weight-count
    parity checks are mechanical.
  * Compute dtype is a config knob (fp32 default, bf16 supported); the
    numerics-sensitive reductions (pixel-norm, demodulation, minibatch
    stddev) always run fp32, mirroring the reference's fp32 casts (:136).
"""

import dataclasses
import math
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, random

from ..ops import (conv_downsample2d, downsample2d, fused_bias_act,
                   upsample2d, upsample_conv2d)

Params = Dict[str, Any]


def nf(stage: int, fmap_base: int = 16 << 10, fmap_decay: float = 1.0,
       fmap_min: int = 1, fmap_max: int = 512) -> int:
    """Feature-map count schedule (reference :331)."""
    return int(np.clip(int(fmap_base / (2.0 ** (stage * fmap_decay))),
                       fmap_min, fmap_max))


# ---------------------------------------------------------------------------
# Equalized-LR parameter helpers (reference get_weight :22-36)
# ---------------------------------------------------------------------------

def _winit(rng, shape, gain=1.0, use_wscale=True, lrmul=1.0, init_mul=1.0):
    fan_in = int(np.prod(shape[:-1]))
    he_std = gain / math.sqrt(fan_in)
    init_std = (1.0 / lrmul if use_wscale else he_std / lrmul) * init_mul
    return random.normal(rng, shape, jnp.float32) * init_std


def _wcoef(shape, gain=1.0, use_wscale=True, lrmul=1.0) -> float:
    fan_in = int(np.prod(shape[:-1]))
    he_std = gain / math.sqrt(fan_in)
    return he_std * lrmul if use_wscale else lrmul


def _dense(x, w, lrmul=1.0, gain=1.0):
    if x.ndim > 2:
        x = x.reshape(x.shape[0], -1)
    coef = _wcoef(w.shape, gain=gain, lrmul=lrmul)
    return jnp.dot(x, (w * coef).astype(x.dtype),
                   preferred_element_type=x.dtype)


def _upfirdn_impl():
    """Impl for the STANDALONE skip-path resamples (G torgb upsample, D
    fromrgb downsample); the conv-fused up/downsample paths always use the
    grouped-conv XLA form. Default on TPU is the Pallas FIR kernel
    (ops/pallas_kernels.py::upfirdn2d_pallas): measured +12% step throughput
    over the XLA depthwise-conv form at the production CelebA-128 config
    (BENCH_NOTES 2026-08-21 A/B: 81.3 vs 72.3 imgs/s/chip, plain-phase
    80.0→70.4 ms). Only TPU-family backends ('tpu', and 'axon' — this
    container's remote-TPU relay) get the Mosaic kernel; everything else
    (cpu: interpret-mode is a per-image python loop; gpu: pltpu.VMEM specs
    would not compile) keeps the conv form (ADVICE r3). Override with
    INCLUSIVEGAN_TPU_UPFIRDN_IMPL={conv,pallas}; read at trace time."""
    import jax
    default = ("pallas" if jax.default_backend() in ("tpu", "axon")
               else "conv")
    return os.environ.get("INCLUSIVEGAN_TPU_UPFIRDN_IMPL", default)


def _bias_act(x, b, act="linear", lrmul=1.0, gain=None, axis=1):
    # INCLUSIVEGAN_TPU_BIAS_ACT_IMPL=pallas routes 4-D lrelu activations
    # through ops/pallas_kernels.py (read at trace time; the kernel falls
    # back to the XLA form for shapes/acts it does not cover). Default is
    # the plain-jnp form, which XLA fuses into the producing conv — see the
    # measured A/B in BENCH_NOTES ("bias-act impl A/B").
    impl = os.environ.get("INCLUSIVEGAN_TPU_BIAS_ACT_IMPL", "jax")
    return fused_bias_act(x, (b * lrmul).astype(x.dtype), axis=axis, act=act,
                          gain=gain, impl=impl)


def _conv2d(x, w, up=False, down=False, resample_kernel=None, lrmul=1.0,
            gain=1.0):
    """SAME conv with optional fused resample. w: [kh,kw,I,O] raw param."""
    coef = _wcoef(w.shape, gain=gain, lrmul=lrmul)
    w = (w * coef).astype(x.dtype)
    if up:
        return upsample_conv2d(x, w, resample_kernel, factor=2)
    if down:
        return conv_downsample2d(x, w, resample_kernel, factor=2)
    kh = w.shape[0]
    pad = kh // 2
    return lax.conv_general_dilated(
        x, jnp.transpose(w, (3, 2, 0, 1)), (1, 1),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _modulated_conv2d(x, style_w, params, *, up=False, down=False,
                      demodulate=True, resample_kernel=None, lrmul=1.0):
    """Reference modulated_conv2d_layer (:89-127), input/output-scaling form.

    params: {'weight': [k,k,I,O], 'mod_weight': [D,I], 'mod_bias': [I]}.
    style_w: [B, D] dlatent slice for this layer.
    """
    w = params["weight"]
    s = _dense(style_w.astype(jnp.float32), params["mod_weight"])
    s = s + params["mod_bias"] + 1.0  # bias initialized to 0 → style ≈ 1

    # modulate input activations
    x = x * s[:, :, None, None].astype(x.dtype)
    x = _conv2d(x, w, up=up, down=down, resample_kernel=resample_kernel,
                lrmul=lrmul)
    if demodulate:
        coef = _wcoef(w.shape, lrmul=lrmul)
        wsq = jnp.sum(jnp.square(w.astype(jnp.float32) * coef), axis=(0, 1))  # [I,O]
        d = lax.rsqrt(jnp.dot(jnp.square(s), wsq,
                              preferred_element_type=jnp.float32) + 1e-8)  # [B,O]
        x = x * d[:, :, None, None].astype(x.dtype)
    return x


# fold-in salt for the per-example style-mixing latents2 draw (invariant-RNG
# mode). Synthesis noise salts are the layer indices (0..num_layers-2), so
# any constant far above ~16 is collision-free.
_EK_MIX = 1 << 20


def minibatch_stddev(x, group_size=6, num_new_features=1, contiguous=False):
    """Reference minibatch_stddev_layer (:132-144). Under shard_map the batch
    axis is the per-device shard, so groups stay device-local exactly like
    the reference's per-GPU graphs.

    ``contiguous=True`` assigns example n to group n//g (blocks) instead of
    the reference's strided n%M assignment. Any partition into groups of g
    is statistically equivalent; the contiguous form is additionally
    invariant under data-mesh resharding whenever the per-device batch is a
    multiple of g (shards are contiguous blocks), which the strided form is
    not — used by the sharding-invariance mode (training/train_step.py
    TrainConfig.invariant_rng)."""
    n, c, h, w = x.shape
    g = min(group_size, n)
    # pad-free grouping requires divisibility; fall back to whole batch
    if n % g != 0:
        g = n
    if contiguous:
        y = x.reshape(-1, g, num_new_features, c // num_new_features, h, w)
        y = y.astype(jnp.float32)
        y = y - jnp.mean(y, axis=1, keepdims=True)
        y = jnp.mean(jnp.square(y), axis=1)
    else:
        y = x.reshape(g, -1, num_new_features, c // num_new_features, h, w)
        y = y.astype(jnp.float32)
        y = y - jnp.mean(y, axis=0, keepdims=True)
        y = jnp.mean(jnp.square(y), axis=0)
    y = jnp.sqrt(y + 1e-8)
    y = jnp.mean(y, axis=(2, 3, 4), keepdims=True)
    y = jnp.mean(y, axis=2)
    y = y.astype(x.dtype)
    if contiguous:
        y = jnp.tile(jnp.repeat(y, g, axis=0), (1, 1, h, w))
    else:
        y = jnp.tile(y, (g, 1, h, w))
    return jnp.concatenate([x, y], axis=1)


# ---------------------------------------------------------------------------
# Mapping network (reference G_mapping :252-304)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class GMapping:
    latent_size: int = 512
    label_size: int = 0
    dlatent_size: int = 512
    dlatent_broadcast: Optional[int] = None
    mapping_layers: int = 8
    mapping_fmaps: int = 512
    mapping_lrmul: float = 0.01
    mapping_nonlinearity: str = "lrelu"
    normalize_latents: bool = True
    init_mul: float = 1.0
    dtype: Any = jnp.float32

    def init(self, rng) -> Params:
        params = {}
        in_dim = self.latent_size
        for i in range(self.mapping_layers):
            out_dim = (self.dlatent_size if i == self.mapping_layers - 1
                       else self.mapping_fmaps)
            rng, k = random.split(rng)
            params[f"Dense{i}"] = {
                "weight": _winit(k, (in_dim, out_dim), lrmul=self.mapping_lrmul,
                                 init_mul=self.init_mul),
                "bias": jnp.zeros((out_dim,), jnp.float32),
            }
            in_dim = out_dim
        return params

    def apply(self, params: Params, latents, labels=None) -> jnp.ndarray:
        x = latents.astype(self.dtype)
        if self.normalize_latents:
            x32 = x.astype(jnp.float32)
            x = (x32 * lax.rsqrt(jnp.mean(jnp.square(x32), axis=1,
                                          keepdims=True) + 1e-8)).astype(self.dtype)
        for i in range(self.mapping_layers):
            p = params[f"Dense{i}"]
            x = _dense(x, p["weight"], lrmul=self.mapping_lrmul)
            x = _bias_act(x, p["bias"], act=self.mapping_nonlinearity,
                          lrmul=self.mapping_lrmul)
        if self.dlatent_broadcast is not None:
            x = jnp.tile(x[:, None], (1, self.dlatent_broadcast, 1))
        return x


# ---------------------------------------------------------------------------
# Synthesis network (reference G_synthesis_stylegan2 :311-401)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class GSynthesis:
    dlatent_size: int = 512
    num_channels: int = 3
    resolution: int = 1024
    fmap_base: int = 16 << 10
    fmap_decay: float = 1.0
    fmap_min: int = 1
    fmap_max: int = 512
    architecture: str = "skip"
    nonlinearity: str = "lrelu"
    resample_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    init_mul: float = 1.0
    dtype: Any = jnp.float32

    @property
    def resolution_log2(self) -> int:
        r = int(np.log2(self.resolution))
        assert self.resolution == 2 ** r and self.resolution >= 4
        return r

    @property
    def num_layers(self) -> int:
        return self.resolution_log2 * 2 - 2

    def _nf(self, stage):
        return nf(stage, self.fmap_base, self.fmap_decay, self.fmap_min,
                  self.fmap_max)

    def _modconv_init(self, rng, k, cin, cout):
        k1, k2 = random.split(rng)
        return {
            "weight": _winit(k1, (k, k, cin, cout), init_mul=self.init_mul),
            "mod_weight": _winit(k2, (self.dlatent_size, cin),
                                 init_mul=self.init_mul),
            "mod_bias": jnp.zeros((cin,), jnp.float32),
        }

    def init(self, rng) -> Params:
        assert self.architecture in ("orig", "skip", "resnet")
        params: Params = {}
        rlog2 = self.resolution_log2
        rng, kc, kl, kt = random.split(rng, 4)
        p4 = {
            "Const": {"const": random.normal(kc, (1, self._nf(1), 4, 4),
                                             jnp.float32)},
            "Conv": {**self._modconv_init(kl, 3, self._nf(1), self._nf(1)),
                     "bias": jnp.zeros((self._nf(1),), jnp.float32),
                     "noise_strength": jnp.zeros((), jnp.float32)},
        }
        if self.architecture == "skip" or rlog2 == 2:
            p4["ToRGB"] = {**self._modconv_init(kt, 1, self._nf(1),
                                                self.num_channels),
                           "bias": jnp.zeros((self.num_channels,), jnp.float32)}
        params["4x4"] = p4
        for res in range(3, rlog2 + 1):
            rng, k0, k1, ks, kt = random.split(rng, 5)
            blk = {
                "Conv0_up": {**self._modconv_init(k0, 3, self._nf(res - 2),
                                                  self._nf(res - 1)),
                             "bias": jnp.zeros((self._nf(res - 1),), jnp.float32),
                             "noise_strength": jnp.zeros((), jnp.float32)},
                "Conv1": {**self._modconv_init(k1, 3, self._nf(res - 1),
                                               self._nf(res - 1)),
                          "bias": jnp.zeros((self._nf(res - 1),), jnp.float32),
                          "noise_strength": jnp.zeros((), jnp.float32)},
            }
            if self.architecture == "resnet":
                blk["Skip"] = {"weight": _winit(ks, (1, 1, self._nf(res - 2),
                                                     self._nf(res - 1)),
                                                init_mul=self.init_mul)}
            if self.architecture == "skip" or res == rlog2:
                blk["ToRGB"] = {**self._modconv_init(kt, 1, self._nf(res - 1),
                                                     self.num_channels),
                                "bias": jnp.zeros((self.num_channels,),
                                                  jnp.float32)}
            params[f"{2**res}x{2**res}"] = blk
        return params

    def init_noise(self, rng) -> Params:
        """Non-trainable per-layer noise images (reference :342-346);
        used when randomize_noise=False."""
        noise = {}
        for layer_idx in range(self.num_layers - 1):
            res = (layer_idx + 5) // 2
            rng, k = random.split(rng)
            noise[f"noise{layer_idx}"] = random.normal(
                k, (1, 1, 2 ** res, 2 ** res), jnp.float32)
        return noise

    def apply(self, params: Params, dlatents, *, noise: Optional[Params] = None,
              rng=None, randomize_noise: bool = True,
              example_keys=None) -> jnp.ndarray:
        """dlatents: [B, num_layers, dlatent_size] → images [B,C,R,R].

        ``example_keys`` ([B] PRNG keys, optional): draw per-layer noise
        per-example as normal(fold_in(example_keys[i], layer_idx)) instead of
        one batch-shaped draw from ``rng``. With keys derived from the GLOBAL
        example index the noise (and hence the whole forward) is invariant
        under data-mesh resharding (TrainConfig.invariant_rng)."""
        rk = list(self.resample_kernel)
        act = self.nonlinearity
        batch = dlatents.shape[0]
        dlatents = dlatents.astype(self.dtype)

        def layer(x, p, layer_idx, up=False):
            nonlocal rng
            x = _modulated_conv2d(x, dlatents[:, layer_idx], p, up=up,
                                  resample_kernel=rk)
            if example_keys is not None:
                nz = jax.vmap(lambda ek: random.normal(
                    random.fold_in(ek, layer_idx),
                    (1, x.shape[2], x.shape[3]), x.dtype))(example_keys)
            elif randomize_noise:
                assert rng is not None, "randomize_noise needs an rng"
                rng, k = random.split(rng)
                nz = random.normal(k, (batch, 1, x.shape[2], x.shape[3]),
                                   x.dtype)
            else:
                nz = noise[f"noise{layer_idx}"].astype(x.dtype)
            x = x + nz * p["noise_strength"].astype(x.dtype)
            return _bias_act(x, p["bias"], act=act)

        def torgb(x, y, res, p):
            t = _modulated_conv2d(x, dlatents[:, res * 2 - 3], p,
                                  demodulate=False)
            t = _bias_act(t, p["bias"])
            return t if y is None else y + t

        p4 = params["4x4"]
        x = jnp.tile(p4["Const"]["const"].astype(self.dtype), (batch, 1, 1, 1))
        x = layer(x, p4["Conv"], 0)
        y = None
        if self.architecture == "skip":
            y = torgb(x, y, 2, p4["ToRGB"])
        for res in range(3, self.resolution_log2 + 1):
            blk = params[f"{2**res}x{2**res}"]
            t = x
            x = layer(x, blk["Conv0_up"], res * 2 - 5, up=True)
            x = layer(x, blk["Conv1"], res * 2 - 4)
            if self.architecture == "resnet":
                t = _conv2d(t, blk["Skip"]["weight"], up=True,
                            resample_kernel=rk)
                x = (x + t) * np.float32(1 / np.sqrt(2))
            if self.architecture == "skip":
                y = upsample2d(y, rk, impl=_upfirdn_impl())
            if self.architecture == "skip" or res == self.resolution_log2:
                y = torgb(x, y, res, blk["ToRGB"])
        return y


# ---------------------------------------------------------------------------
# Full generator (reference G_main :151-245)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class GMain:
    mapping: GMapping
    synthesis: GSynthesis
    truncation_psi: float = 0.6
    truncation_cutoff: Optional[int] = None
    dlatent_avg_beta: float = 0.995
    style_mixing_prob: float = 0.9

    @staticmethod
    def create(resolution=128, num_channels=3, latent_size=512,
               dlatent_size=512, label_size=0, fmap_base=16 << 10,
               fmap_max=512, architecture="skip", init_mul=1.0,
               truncation_psi=0.6, truncation_cutoff=None,
               dlatent_avg_beta=0.995, style_mixing_prob=0.9,
               mapping_layers=8, mapping_fmaps=512,
               dtype=jnp.float32, **kwargs) -> "GMain":
        synthesis = GSynthesis(dlatent_size=dlatent_size,
                               num_channels=num_channels,
                               resolution=resolution, fmap_base=fmap_base,
                               fmap_max=fmap_max, architecture=architecture,
                               init_mul=init_mul, dtype=dtype)
        mapping = GMapping(latent_size=latent_size, label_size=label_size,
                           dlatent_size=dlatent_size,
                           dlatent_broadcast=synthesis.num_layers,
                           mapping_layers=mapping_layers,
                           mapping_fmaps=mapping_fmaps,
                           init_mul=init_mul, dtype=dtype)
        return GMain(mapping=mapping, synthesis=synthesis,
                     truncation_psi=truncation_psi,
                     truncation_cutoff=truncation_cutoff,
                     dlatent_avg_beta=dlatent_avg_beta,
                     style_mixing_prob=style_mixing_prob)

    def init(self, rng) -> Params:
        k1, k2, k3 = random.split(rng, 3)
        return {
            "mapping": self.mapping.init(k1),
            "synthesis": self.synthesis.init(k2),
            # non-trainable state, kept in the same tree and masked out of the
            # optimizer (see training/train_state.py):
            "noise": self.synthesis.init_noise(k3),
            "dlatent_avg": jnp.zeros((self.mapping.dlatent_size,), jnp.float32),
        }

    NON_TRAINABLE = ("noise", "dlatent_avg")

    def map_latents(self, params: Params, latents, labels=None, *, rng=None,
                    style_mixing_prob="default", example_keys=None):
        """Training-mode mapping + style-mixing: z → dlatents [B, L, D]
        (float32) plus the batch average for the dlatent_avg EMA. Exposed so
        callers can batch several logical G forwards into one synthesis call
        while keeping an independent mixing draw per group (see
        training/loss.g_main_loss).

        ``example_keys`` ([B] keys): draw the mixing latents2 per-example
        (fold-in salt _EK_MIX) so the draw is invariant under data-mesh
        resharding; the batch-scalar mixing decision/cutoff still come from
        ``rng`` — with a replicated rng they are shared across shards, like
        a single-device batch."""
        if style_mixing_prob == "default":
            style_mixing_prob = self.style_mixing_prob
        num_layers = self.synthesis.num_layers
        dlatents = self.mapping.apply(params["mapping"], latents,
                                      labels).astype(jnp.float32)
        batch_avg = jnp.mean(dlatents[:, 0], axis=0)
        if style_mixing_prob is not None and rng is not None:
            rng, k1, k2, k3 = random.split(rng, 4)
            if example_keys is not None:
                latents2 = jax.vmap(lambda ek: random.normal(
                    random.fold_in(ek, _EK_MIX), latents.shape[1:],
                    latents.dtype))(example_keys)
            else:
                latents2 = random.normal(k1, latents.shape, latents.dtype)
            dlatents2 = self.mapping.apply(params["mapping"], latents2,
                                           labels).astype(jnp.float32)
            layer_idx = jnp.arange(num_layers)[None, :, None]
            mixing_cutoff = jnp.where(
                random.uniform(k2) < style_mixing_prob,
                random.randint(k3, (), 1, num_layers),
                jnp.asarray(num_layers))
            dlatents = jnp.where(layer_idx < mixing_cutoff, dlatents, dlatents2)
        return dlatents, batch_avg

    def apply(self, params: Params, latents, labels=None, *, rng=None,
              is_training: bool = False, truncation_psi=None,
              truncation_cutoff="default", randomize_noise: Optional[bool] = None,
              return_dlatents: bool = False, style_mixing_prob="default",
              example_keys=None):
        """Returns images (plus dlatents and the updated dlatent_avg when
        requested/training). Mirrors the mode logic of the reference
        (:170-183): training disables truncation, eval disables mixing+EMA."""
        if truncation_psi is None:
            truncation_psi = self.truncation_psi
        if truncation_cutoff == "default":
            truncation_cutoff = self.truncation_cutoff
        if style_mixing_prob == "default":
            style_mixing_prob = self.style_mixing_prob
        if is_training:
            truncation_psi = None
            truncation_cutoff = None
        if truncation_psi is not None and truncation_psi == 1:
            truncation_psi = None
        if randomize_noise is None:
            randomize_noise = True

        num_layers = self.synthesis.num_layers
        dlatents = self.mapping.apply(params["mapping"], latents, labels)
        dlatents = dlatents.astype(jnp.float32)

        # EMA contribution of this forward: the caller folds batch_avg into
        # dlatent_avg via loss.fold_dlatent_avg (one lerp per training-mode
        # forward, mirroring the reference's per-invocation assign op).
        dlatent_batch_avg = jnp.mean(dlatents[:, 0], axis=0)

        if is_training and style_mixing_prob is not None and rng is not None:
            rng, k1, k2, k3 = random.split(rng, 4)
            if example_keys is not None:
                latents2 = jax.vmap(lambda ek: random.normal(
                    random.fold_in(ek, _EK_MIX), latents.shape[1:],
                    latents.dtype))(example_keys)
            else:
                latents2 = random.normal(k1, latents.shape, latents.dtype)
            dlatents2 = self.mapping.apply(params["mapping"], latents2,
                                           labels).astype(jnp.float32)
            layer_idx = jnp.arange(num_layers)[None, :, None]
            mixing_cutoff = jnp.where(
                random.uniform(k2) < style_mixing_prob,
                random.randint(k3, (), 1, num_layers),
                jnp.asarray(num_layers))
            dlatents = jnp.where(layer_idx < mixing_cutoff, dlatents, dlatents2)

        if not is_training and truncation_psi is not None:
            layer_idx = np.arange(num_layers)[None, :, None]
            layer_psi = np.ones(layer_idx.shape, np.float32)
            if truncation_cutoff is None:
                layer_psi = layer_psi * truncation_psi
            else:
                layer_psi = np.where(layer_idx < truncation_cutoff,
                                     layer_psi * truncation_psi, layer_psi)
            dlatents = params["dlatent_avg"] + (
                dlatents - params["dlatent_avg"]) * jnp.asarray(layer_psi)

        if rng is not None:
            rng, krng = random.split(rng)
        else:
            krng = None
        images = self.synthesis.apply(params["synthesis"], dlatents,
                                      noise=params["noise"], rng=krng,
                                      randomize_noise=randomize_noise,
                                      example_keys=example_keys)
        out = [images]
        if return_dlatents:
            out.append(dlatents)
        if is_training:
            out.append(dlatent_batch_avg)
        return tuple(out) if len(out) > 1 else images


# ---------------------------------------------------------------------------
# Discriminator with feature head (reference D_stylegan2_feature :408-507)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Discriminator:
    num_channels: int = 3
    resolution: int = 1024
    label_size: int = 0
    fmap_base: int = 16 << 10
    fmap_decay: float = 1.0
    fmap_min: int = 1
    fmap_max: int = 512
    architecture: str = "resnet"
    nonlinearity: str = "lrelu"
    mbstd_group_size: int = 6
    mbstd_num_features: int = 1
    # contiguous mbstd grouping (see minibatch_stddev): statistically
    # equivalent to the reference's strided grouping, and sharding-invariant
    # when the per-device batch divides by the group size
    mbstd_contiguous: bool = False
    resample_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    init_mul: float = 1.0
    dtype: Any = jnp.float32

    @property
    def resolution_log2(self) -> int:
        r = int(np.log2(self.resolution))
        assert self.resolution == 2 ** r and self.resolution >= 4
        return r

    def _nf(self, stage):
        return nf(stage, self.fmap_base, self.fmap_decay, self.fmap_min,
                  self.fmap_max)

    def init(self, rng) -> Params:
        assert self.architecture in ("orig", "skip", "resnet")
        params: Params = {}
        rlog2 = self.resolution_log2
        for res in range(rlog2, 2, -1):
            rng, kf, k0, k1, ks = random.split(rng, 5)
            blk = {}
            if self.architecture == "skip" or res == rlog2:
                blk["FromRGB"] = {
                    "weight": _winit(kf, (1, 1, self.num_channels,
                                          self._nf(res - 1)),
                                     init_mul=self.init_mul),
                    "bias": jnp.zeros((self._nf(res - 1),), jnp.float32)}
            blk["Conv0"] = {
                "weight": _winit(k0, (3, 3, self._nf(res - 1),
                                      self._nf(res - 1)),
                                 init_mul=self.init_mul),
                "bias": jnp.zeros((self._nf(res - 1),), jnp.float32)}
            blk["Conv1_down"] = {
                "weight": _winit(k1, (3, 3, self._nf(res - 1),
                                      self._nf(res - 2)),
                                 init_mul=self.init_mul),
                "bias": jnp.zeros((self._nf(res - 2),), jnp.float32)}
            if self.architecture == "resnet":
                blk["Skip"] = {"weight": _winit(ks, (1, 1, self._nf(res - 1),
                                                     self._nf(res - 2)),
                                                init_mul=self.init_mul)}
            params[f"{2**res}x{2**res}"] = blk
        rng, kf4, kc, kd, ko = random.split(rng, 5)
        p4 = {}
        if self.architecture == "skip":
            p4["FromRGB"] = {
                "weight": _winit(kf4, (1, 1, self.num_channels, self._nf(1)),
                                 init_mul=self.init_mul),
                "bias": jnp.zeros((self._nf(1),), jnp.float32)}
        mbstd_ch = self.mbstd_num_features if self.mbstd_group_size > 1 else 0
        p4["Conv"] = {
            "weight": _winit(kc, (3, 3, self._nf(1) + mbstd_ch, self._nf(1)),
                             init_mul=self.init_mul),
            "bias": jnp.zeros((self._nf(1),), jnp.float32)}
        p4["Dense0"] = {
            "weight": _winit(kd, (self._nf(1) * 16, self._nf(0)),
                             init_mul=self.init_mul),
            "bias": jnp.zeros((self._nf(0),), jnp.float32)}
        params["4x4"] = p4
        params["Output"] = {
            "weight": _winit(ko, (self._nf(0), 1), init_mul=self.init_mul),
            "bias": jnp.zeros((1,), jnp.float32)}
        return params

    def apply(self, params: Params, images, labels=None
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """→ (scores [B], features [B, F]) where features is the normalized
        concat of every intermediate activation (reference feature_concat
        :457-461, used by the LPIPS-free rec losses and the projector)."""
        rk = list(self.resample_kernel)
        act = self.nonlinearity
        rlog2 = self.resolution_log2
        feats = []

        def feat(x):
            length = int(np.prod(x.shape[1:]))
            feats.append((x.astype(jnp.float32) / np.sqrt(np.float32(length))
                          ).reshape(x.shape[0], -1))

        def fromrgb(x, y, p):
            t = _conv2d(y, p["weight"])
            t = _bias_act(t, p["bias"], act=act)
            return t if x is None else x + t

        y = images.astype(self.dtype)
        feat(y)
        x = None
        for res in range(rlog2, 2, -1):
            blk = params[f"{2**res}x{2**res}"]
            if self.architecture == "skip" or res == rlog2:
                x = fromrgb(x, y, blk["FromRGB"])
                feat(x)
            t = x
            x = _bias_act(_conv2d(x, blk["Conv0"]["weight"]),
                          blk["Conv0"]["bias"], act=act)
            x = _bias_act(_conv2d(x, blk["Conv1_down"]["weight"], down=True,
                                  resample_kernel=rk),
                          blk["Conv1_down"]["bias"], act=act)
            if self.architecture == "resnet":
                t = _conv2d(t, blk["Skip"]["weight"], down=True,
                            resample_kernel=rk)
                x = (x + t) * np.float32(1 / np.sqrt(2))
            feat(x)
            if self.architecture == "skip":
                y = downsample2d(y, rk, impl=_upfirdn_impl())

        p4 = params["4x4"]
        if self.architecture == "skip":
            x = fromrgb(x, y, p4["FromRGB"])
        if self.mbstd_group_size > 1:
            x = minibatch_stddev(x, self.mbstd_group_size,
                                 self.mbstd_num_features,
                                 contiguous=self.mbstd_contiguous)
        x = _bias_act(_conv2d(x, p4["Conv"]["weight"]), p4["Conv"]["bias"],
                      act=act)
        feat(x)
        x = _bias_act(_dense(x, p4["Dense0"]["weight"]), p4["Dense0"]["bias"],
                      act=act)
        feat(x)
        x = _bias_act(_dense(x, params["Output"]["weight"]),
                      params["Output"]["bias"])
        feat(x)
        scores = jnp.squeeze(x, axis=1)
        features = jnp.concatenate(feats, axis=1)
        return scores, features
