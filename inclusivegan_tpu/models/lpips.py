"""LPIPS perceptual distance (VGG16, Zhang et al. 2018) in JAX.

Capability parity with the reference's frozen ``vgg16_zhang_perceptual.pkl``
(loaded in the training loop itself, /root/reference/training/training_loop.py:195,
and consumed by the G loss at loss.py:31,41 with inputs scaled to [0,255]).

Design:
  * VGG16 conv trunk with feature taps after relu1_2/relu2_2/relu3_3/relu4_3/
    relu5_3; per-channel unit-normalization; learned (or uniform) linear head
    per tap; spatial mean; sum over taps — the standard LPIPS pipeline.
  * Weights load from an ``.npz`` (convert once from any public VGG16+LPIPS
    release with scripts/convert_lpips_weights.py). This container has no
    network egress and ships no pretrained blobs, so the default is a
    **deterministic random-feature fallback**: He-init conv weights from a
    fixed seed and uniform linear heads. Random VGG features are a documented,
    usable perceptual metric (e.g. "the unreasonable effectiveness" line of
    work); training quality numbers in BENCH files note which mode was used.
  * Everything is a pure function of a params pytree — usable inside jitted
    train steps and metric loops.
"""

import math
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, random

# (name, out_channels, pool_before) — standard VGG16 conv layout.
_VGG_LAYOUT: List[Tuple[str, int, bool]] = [
    ("conv1_1", 64, False), ("conv1_2", 64, False),
    ("conv2_1", 128, True), ("conv2_2", 128, False),
    ("conv3_1", 256, True), ("conv3_2", 256, False), ("conv3_3", 256, False),
    ("conv4_1", 512, True), ("conv4_2", 512, False), ("conv4_3", 512, False),
    ("conv5_1", 512, True), ("conv5_2", 512, False), ("conv5_3", 512, False),
]
_TAPS = ["conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3"]
# Zhang-net input normalization constants (RGB in [-1,1] domain).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


# Random-feature calibration: with He-init convs + channel normalization,
# distances between DISTINCT 32px dataset images measure ~0.005 (p10-p90
# 0.0044-0.0056) vs ~0.3 for converted zhang-VGG weights on distinct
# natural images. Folding the scale into the uniform linear heads keeps the
# reference's relative loss magnitudes when this net is used as a workload
# stand-in (bench.py, compile checks). NOTE random VGG features are NOT a
# usable *training* metric on sparse imagery: they rank an all-black image
# closer to a digit (0.0040) than another digit is (0.0051), so a strong
# reconstruction weight drives G toward darkness, and a weak one lets the
# GAN mode-collapse (both observed on stacked-MNIST; BENCH_NOTES.md).
# Quality paths without converted weights use the pixel-pyramid fallback
# below instead (get_lpips_params).
_RANDOM_FEATURE_CALIBRATION = 60.0

# Pixel-pyramid fallback (init_pixel_fallback_params): the original IMLE
# distance — mean squared pixel error over a 5-level average-pool pyramid
# in the [-1,1] domain. Unlike random features it has a unique minimum at
# the target and no dark/flat cheap region; per-scale weights are uniform.
# Measured on distinct 32px dataset images: 0.22 mean (p10-p90 0.19-0.28)
# — already the converted-LPIPS scale — with an all-black image FARTHER
# from a digit (0.29) than digits are from each other.
_PIXEL_SCALES = 5
_PIXEL_CALIBRATION = 1.0  # divided by scale count in the lin heads


def init_lpips_params(rng=None, seed: int = 0) -> Dict[str, Any]:
    """Deterministic random-feature LPIPS params (fallback mode)."""
    if rng is None:
        rng = random.key(seed)
    params: Dict[str, Any] = {"_mode": np.array(0)}  # 0 = random features
    cin = 3
    for name, cout, _pool in _VGG_LAYOUT:
        rng, k = random.split(rng)
        std = math.sqrt(2.0 / (3 * 3 * cin))
        params[name] = {
            "w": random.normal(k, (3, 3, cin, cout), jnp.float32) * std,
            "b": jnp.zeros((cout,), jnp.float32),
        }
        cin = cout
    for tap in _TAPS:
        cout = dict((n, c) for n, c, _ in _VGG_LAYOUT)[tap]
        params[f"lin_{tap}"] = jnp.full(
            (cout,), _RANDOM_FEATURE_CALIBRATION / cout, jnp.float32)
    return params


def init_pixel_fallback_params() -> Dict[str, Any]:
    """Multi-scale pixel-MSE params (no conv leaves — lpips_features detects
    this structurally). Taps reuse the _TAPS names so the distance head and
    every consumer (loss batching, PPL, projector) work unchanged."""
    params: Dict[str, Any] = {"_mode": np.array(2)}
    for tap in _TAPS[:_PIXEL_SCALES]:
        params[f"lin_{tap}"] = jnp.full(
            (3,), _PIXEL_CALIBRATION / _PIXEL_SCALES, jnp.float32)
    return params


def load_lpips_params(path: str) -> Dict[str, Any]:
    """Load converted weights: npz with keys '<conv>_w', '<conv>_b',
    'lin_<tap>'."""
    data = np.load(path)
    params: Dict[str, Any] = {"_mode": np.array(1)}
    for name, _c, _p in _VGG_LAYOUT:
        params[name] = {"w": jnp.asarray(data[f"{name}_w"]),
                        "b": jnp.asarray(data[f"{name}_b"])}
    for tap in _TAPS:
        params[f"lin_{tap}"] = jnp.asarray(data[f"lin_{tap}"])
    return params


# Well-known drop-in location for converted zhang-VGG weights, mirroring
# the reference's hardcoded metrics/vgg16_zhang_perceptual.pkl path
# (/root/reference/training/training_loop.py:195): convert once with
# scripts/convert_lpips_weights.py, place the npz here, and every LPIPS
# consumer (training rec anchor, PPL, projector) picks it up without flags.
DEFAULT_WEIGHTS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "metrics_weights", "vgg16_zhang_perceptual.npz")


def get_lpips_params(weights_path: Optional[str] = None, seed: int = 0):
    """Converted zhang-VGG weights when available; otherwise the
    pixel-pyramid fallback — the quality-safe no-egress metric (random VGG
    features are kept only as a workload stand-in, see calibration note).

    With no explicit path, discovery order is the INCLUSIVEGAN_LPIPS_WEIGHTS
    env var (empty string forces the fallback — tests set this for
    hermeticity) then DEFAULT_WEIGHTS_PATH.
    """
    del seed
    if weights_path is None:
        env = os.environ.get("INCLUSIVEGAN_LPIPS_WEIGHTS")
        if env is not None:
            weights_path = env or None
        elif os.path.exists(DEFAULT_WEIGHTS_PATH):
            weights_path = DEFAULT_WEIGHTS_PATH
    if weights_path and os.path.exists(weights_path):
        print(f'LPIPS: loading weights from "{weights_path}"')
        return load_lpips_params(weights_path)
    print("LPIPS: pixel-pyramid fallback (no converted weights found)")
    return init_pixel_fallback_params()


def _vgg_features(params, x) -> List[jnp.ndarray]:
    """x: [N,3,H,W] in the zhang-normalized domain → tap activations."""
    feats = []
    for name, _cout, pool in _VGG_LAYOUT:
        if pool:
            x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 2, 2),
                                  (1, 1, 2, 2), "VALID")
        w = jnp.transpose(params[name]["w"], (3, 2, 0, 1)).astype(x.dtype)
        x = lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = jnp.maximum(x + params[name]["b"][None, :, None, None].astype(x.dtype), 0)
        if name in _TAPS:
            feats.append(x)
    return feats


def _normalize_channels(x, eps=1e-10):
    return x * lax.rsqrt(jnp.sum(jnp.square(x), axis=1, keepdims=True) + eps)


def _normalize_channels_trunk_dtype(x, eps=1e-10):
    """Channel-normalize WITHOUT materializing a float32 copy of the map.

    The default path casts each tap feature map to f32 before normalizing
    (lpips_features below) — that cast is used twice (sum + multiply), so
    XLA materializes a 2×-wide HBM copy of every VGG tap; the round-4
    profile charges ~8 ms/iter of g_step 'data formatting + loop fusion'
    to these chains. Here the sum-of-squares accumulates in f32 through a
    fused cast (no f32 map is ever written) and the scale is applied in
    the trunk dtype, so maps stay bf16 end-to-end. Precision: the squared
    diffs downstream are bf16 (~1e-3 relative distance deviation vs the
    f32-map path, tested) instead of the default's ~1e-5.
    Opt-in via TrainConfig.lpips_norm="trunk" (CLI --lpips-norm trunk) or,
    for config-less callers, INCLUSIVEGAN_TPU_LPIPS_NORM=trunk (read at
    trace time — see lpips_features);
    default stays the f32-map path pending a matched-seed quality arm."""
    ss = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=1, keepdims=True)
    return x * lax.rsqrt(ss + eps).astype(x.dtype)


def _preprocess(img_255):
    """[0,255] RGB (reference feeds (x+1)*127.5, loss.py:27-30) → zhang domain.
    Non-3-channel inputs are broadcast to RGB."""
    x = img_255.astype(jnp.float32) / 127.5 - 1.0
    if x.shape[1] == 1:
        x = jnp.tile(x, (1, 3, 1, 1))
    elif x.shape[1] != 3:
        x = jnp.tile(jnp.mean(x, axis=1, keepdims=True), (1, 3, 1, 1))
    return (x - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]


def _pixel_pyramid(x) -> List[jnp.ndarray]:
    """[-1,1] images → [x, avgpool2(x), avgpool4(x), ...] raw (no channel
    normalization — the pixel metric's gradient must keep its unique
    minimum at the target)."""
    feats = [x]
    # cap the depth by the (static) spatial size: pooling a 1-px map would
    # yield a zero-size level whose mean is nan (hit by PPL's face crop on
    # tiny test resolutions: 16px -> 8x8 crop -> 5th level is 0x0)
    levels = min(_PIXEL_SCALES, int(min(x.shape[2], x.shape[3])).bit_length())
    for _ in range(levels - 1):
        x = lax.reduce_window(x, 0.0, lax.add, (1, 1, 2, 2), (1, 1, 2, 2),
                              "VALID") * 0.25
        feats.append(x)
    if levels < _PIXEL_SCALES:
        # the lin heads are fixed at 1/_PIXEL_SCALES per level; with fewer
        # levels (<16px inputs) the summed distance would sit on a smaller
        # effective scale than the calibrated 32px one. The distance is
        # quadratic in the features, so scaling each level by
        # sqrt(S/levels) renormalizes per-level weight to 1/levels and
        # keeps cross-resolution distances comparable.
        feats = [f * math.sqrt(_PIXEL_SCALES / levels) for f in feats]
    return feats


def lpips_features(params, img_255, dtype=jnp.float32, norm=None):
    """[N,C,H,W] in [0,255] → list of tap feature maps.

    VGG modes: channel-normalized conv tap activations. Pixel-fallback mode
    (no conv leaves in ``params``): a raw average-pool pyramid.
    ``dtype`` selects the VGG conv compute precision — bfloat16 runs the
    trunk on the MXU at ~2× with the channel-normalization and reductions
    kept in float32 (measured bf16-vs-f32 distance deviation ~1e-5).
    ``norm`` selects the channel-normalization layout: "f32" materializes
    f32 tap maps (default), "trunk" keeps maps in the trunk dtype
    (_normalize_channels_trunk_dtype; only meaningful when dtype≠f32).
    None falls back to the INCLUSIVEGAN_TPU_LPIPS_NORM env var — NOTE this
    is read at TRACE time, so config-carrying callers (TrainConfig.
    lpips_norm) must pass it explicitly rather than toggling the env after
    a step has been jitted.
    Exposed so callers can embed MANY images in one batched VGG call and
    form several distance pairs from slices (training/loss.g_main_loss)."""
    if "conv1_1" not in params:  # pixel-pyramid fallback (trace-static)
        x = img_255.astype(jnp.float32) / 127.5 - 1.0
        if x.shape[1] != 3:
            x = jnp.tile(jnp.mean(x, axis=1, keepdims=True), (1, 3, 1, 1))
        return _pixel_pyramid(x)
    if norm is None:
        norm = os.environ.get("INCLUSIVEGAN_TPU_LPIPS_NORM", "f32")
    feats = _vgg_features(params, _preprocess(img_255).astype(dtype))
    if dtype != jnp.float32 and norm == "trunk":
        return [_normalize_channels_trunk_dtype(f) for f in feats]
    return [_normalize_channels(f.astype(jnp.float32)) for f in feats]


def lpips_distance_from_features(params, f0, f1) -> jnp.ndarray:
    total = 0.0
    for tap, a, b in zip(_TAPS, f0, f1):
        d = jnp.square(a - b)
        lin = params[f"lin_{tap}"][None, :, None, None]
        total = total + jnp.mean(jnp.sum(d * lin, axis=1), axis=(1, 2))
    return total


def lpips_distance(params, img0_255, img1_255, dtype=jnp.float32,
                   norm=None) -> jnp.ndarray:
    """Perceptual distance per pair: [N,C,H,W] in [0,255] → [N] (float32)."""
    return lpips_distance_from_features(
        params, lpips_features(params, img0_255, dtype, norm=norm),
        lpips_features(params, img1_255, dtype, norm=norm))
