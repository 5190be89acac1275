"""upfirdn2d — pad / zero-insert-upsample / FIR filter / downsample.

Capability parity with the reference CUDA op + wrappers
(/root/reference/dnnlib/tflib/ops/upfirdn_2d.cu:65-296,
 /root/reference/dnnlib/tflib/ops/upfirdn_2d.py:19-316).

TPU-native design — NOT a kernel translation:

  * The entire pipeline is ONE ``lax.pad`` (interior dilation = zero-insert
    upsampling, negative edge padding = cropping) followed by ONE depthwise
    ``lax.conv_general_dilated`` with ``window_strides=down``. XLA fuses the
    pad into the convolution and tiles the conv onto the MXU — there is
    nothing left for a hand-written kernel to win on for the general case.
  * ``impl='ref'``: an independent shift-and-sum implementation used as the
    parity oracle (mirroring the reference's pure-TF ``impl='ref'`` fallback
    pattern, upfirdn_2d.py:58-101).
  * ``impl='pallas'``: a Pallas VPU kernel for the hot separable small-filter
    cases (see ops/pallas_kernels.py); falls back to 'conv' otherwise.
  * Gradients: JAX autodiff of pad+conv is exact to any order — the
    reference's hand-derived "gradient is another upfirdn2d with flipped
    filter and swapped up/down" (upfirdn_2d.py:130-140) is what autodiff
    produces automatically, so 2nd-order paths (R1, path-length reg) are
    exact for free.

All functions accept NCHW (reference layout) or NHWC (TPU-preferred) via
``data_format``.
"""

import functools
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Pad = Union[int, Tuple[int, int], Tuple[int, int, int, int]]


def setup_filter(f, normalize: bool = True, flip: bool = False,
                 gain: float = 1.0, separable: Optional[bool] = None) -> np.ndarray:
    """Prepare a FIR filter: 1-D taps are outer-producted to 2-D, normalized
    to unit sum, optionally scaled (reference: upfirdn_2d.py:16-24 _setup_kernel).

    Computed in NUMPY on purpose: every call site passes a static python
    list, and under jit all jnp ops are staged — a jnp version would hand
    the pallas path a tracer where its kernel needs concrete taps. The
    returned np array embeds as an XLA constant on the conv path exactly as
    the jnp constant did."""
    if f is None:
        f = 1
    f = np.asarray(f, dtype=np.float32)
    if f.ndim == 0:
        f = f[np.newaxis]
    assert f.ndim in (1, 2)
    if f.ndim == 1:
        f = np.outer(f, f)
    if normalize:
        f = f / np.sum(f)
    if flip:
        f = f[::-1, ::-1]
    return f * gain


def _parse_padding(pad: Pad) -> Tuple[int, int, int, int]:
    if isinstance(pad, int):
        return pad, pad, pad, pad
    pad = tuple(pad)
    if len(pad) == 2:
        px, py = pad
        return px, px, py, py
    assert len(pad) == 4
    return pad  # (padx0, padx1, pady0, pady1)


def _to_nchw(x, data_format):
    if data_format == "NHWC":
        return jnp.transpose(x, (0, 3, 1, 2))
    assert data_format == "NCHW", data_format
    return x


def _from_nchw(x, data_format):
    if data_format == "NHWC":
        return jnp.transpose(x, (0, 2, 3, 1))
    return x


def upfirdn2d(x, f, up: int = 1, down: int = 1, pad: Pad = 0,
              gain: float = 1.0, data_format: str = "NCHW",
              impl: str = "conv") -> jnp.ndarray:
    """y = downsample(FIR(pad(zero_insert_upsample(x))))

    x: [N,C,H,W] (or NHWC), f: [kh,kw] or [k] separable taps (pre-setup via
    ``setup_filter``). ``pad`` may be negative (crop). Output spatial size:
    ``(in*up + pad0 + pad1 - k) // down + 1`` — identical to the reference op
    (upfirdn_2d.cu shape logic at :232).
    """
    try:  # static taps stay numpy so the pallas kernel sees concrete floats
        f = np.asarray(f, dtype=np.float32)
        if f.ndim == 1:
            f = np.outer(f, f)
    except jax.errors.TracerArrayConversionError:
        # traced filter: conv/ref paths handle it, pallas can't. Anything
        # else (e.g. ragged tap lists) propagates as the real error.
        f = jnp.asarray(f, dtype=jnp.float32)
        if f.ndim == 1:
            f = jnp.outer(f, f)
    assert f.ndim == 2
    x = _to_nchw(x, data_format)
    padx0, padx1, pady0, pady1 = _parse_padding(pad)

    if impl == "ref":
        y = _upfirdn2d_ref(x, f, up, down, (padx0, padx1, pady0, pady1), gain)
    elif impl == "pallas":
        from . import pallas_kernels
        y = pallas_kernels.upfirdn2d_pallas(
            x, f, up, down, (padx0, padx1, pady0, pady1), gain)
    else:
        y = _upfirdn2d_conv(x, f, up, down, (padx0, padx1, pady0, pady1), gain)
    return _from_nchw(y, data_format)


def _upfirdn2d_conv(x, f, up, down, pad, gain):
    """Fast path: lax.pad (interior dilation + edge pad/crop) + depthwise conv."""
    padx0, padx1, pady0, pady1 = pad
    n, c, h, w = x.shape
    kh, kw = f.shape
    # interior dilation of (up-1) zeros between samples; the reference also
    # appends (up-1) trailing zeros after the last sample, which we fold into
    # the high edge pad. Negative pads crop.
    xp = lax.pad(x, jnp.zeros((), x.dtype), [
        (0, 0, 0), (0, 0, 0),
        (pady0, pady1 + (up - 1), up - 1),
        (padx0, padx1 + (up - 1), up - 1),
    ])
    # FIR *convolution* = correlation with flipped taps.
    k = (f * gain)[::-1, ::-1].astype(x.dtype)
    rhs = jnp.tile(k[jnp.newaxis, jnp.newaxis], (c, 1, 1, 1))  # [C,1,kh,kw]
    return lax.conv_general_dilated(
        xp, rhs,
        window_strides=(down, down),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )


def _upfirdn2d_ref(x, f, up, down, pad, gain):
    """Independent oracle: explicit zero-insert, jnp.pad, shift-and-sum FIR,
    strided downsample. Slow but obviously correct; used by tests only."""
    padx0, padx1, pady0, pady1 = pad
    n, c, h, w = x.shape
    kh, kw = f.shape
    # zero-insert upsample to [H*up, W*up] (trailing zeros included)
    if up > 1:
        x = x.reshape(n, c, h, 1, w, 1)
        x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, up - 1), (0, 0), (0, up - 1)])
        x = x.reshape(n, c, h * up, w * up)
    # edge pad / crop
    x = jnp.pad(x, [(0, 0), (0, 0),
                    (max(pady0, 0), max(pady1, 0)),
                    (max(padx0, 0), max(padx1, 0))])
    x = x[:, :,
          max(-pady0, 0): x.shape[2] - max(-pady1, 0),
          max(-padx0, 0): x.shape[3] - max(-padx1, 0)]
    # FIR convolution via shift-and-sum with flipped kernel
    k = np.asarray(f) * gain
    hh, ww = x.shape[2], x.shape[3]
    oh, ow = hh - kh + 1, ww - kw + 1
    y = jnp.zeros((n, c, oh, ow), x.dtype)
    for i in range(kh):
        for j in range(kw):
            y = y + x[:, :, i:i + oh, j:j + ow] * float(k[kh - 1 - i, kw - 1 - j])
    return y[:, :, ::down, ::down]


# ---------------------------------------------------------------------------
# Wrappers mirroring the reference API surface (upfirdn_2d.py:144-316).
# ---------------------------------------------------------------------------

def filter2d(x, f, gain: float = 1.0, data_format: str = "NCHW",
             impl: str = "conv") -> jnp.ndarray:
    """Same-size FIR filtering (reference: filter_2d, upfirdn_2d.py:296-316)."""
    f = setup_filter(f)
    kh, kw = f.shape
    pw, ph = kw - 1, kh - 1
    return upfirdn2d(x, f, pad=((pw + 1) // 2, pw // 2, (ph + 1) // 2, ph // 2),
                     gain=gain, data_format=data_format, impl=impl)


def upsample2d(x, f=None, factor: int = 2, gain: float = 1.0,
               data_format: str = "NCHW", impl: str = "conv") -> jnp.ndarray:
    """Upsample by `factor` with FIR smoothing (reference: upsample_2d,
    upfirdn_2d.py:144-166). Filter gain is scaled by factor**2 to preserve
    mean intensity through the zero-insert."""
    assert factor >= 1
    f = setup_filter(f if f is not None else [1] * factor)
    kh, kw = f.shape
    p = kh - factor
    return upfirdn2d(x, f, up=factor,
                     pad=((p + 1) // 2 + factor - 1, p // 2,
                          (p + 1) // 2 + factor - 1, p // 2),
                     gain=gain * factor * factor,
                     data_format=data_format, impl=impl)


def downsample2d(x, f=None, factor: int = 2, gain: float = 1.0,
                 data_format: str = "NCHW", impl: str = "conv") -> jnp.ndarray:
    """FIR-smoothed downsample (reference: downsample_2d, upfirdn_2d.py:169-199)."""
    assert factor >= 1
    f = setup_filter(f if f is not None else [1] * factor)
    kh, kw = f.shape
    p = kh - factor
    return upfirdn2d(x, f, down=factor,
                     pad=((p + 1) // 2, p // 2, (p + 1) // 2, p // 2),
                     gain=gain, data_format=data_format, impl=impl)


def upsample_conv2d(x, w, f=None, factor: int = 2, gain: float = 1.0,
                    data_format: str = "NCHW", impl: str = "conv") -> jnp.ndarray:
    """Fused transposed-conv upsample + FIR (reference: upsample_conv_2d,
    upfirdn_2d.py:202-231).

    TPU design: grouped transposed conv is expressed as a conv with
    ``lhs_dilation=factor`` (native XLA form; lands on the MXU), then the FIR
    via upfirdn2d. w: [kh, kw, Cin, Cout].
    """
    assert factor >= 1
    kh, kw, cin, cout = w.shape
    f = setup_filter(f if f is not None else [1] * factor,
                     gain=gain * (factor ** 2))
    fh, fw = f.shape
    x = _to_nchw(x, data_format)
    # Transposed conv: flip spatial taps, swap in/out, dilate the input.
    wt = jnp.transpose(w[::-1, ::-1], (3, 2, 0, 1))  # [Cout, Cin, kh, kw]
    pad0 = kh - 1
    y = lax.conv_general_dilated(
        x, wt.astype(x.dtype),
        window_strides=(1, 1),
        padding=[(pad0, pad0), (pad0, pad0)],
        lhs_dilation=(factor, factor),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    # FIR cleanup of the zero-insert artifacts.
    p = fh - factor - (kh - 1)
    y = upfirdn2d(y, f, pad=((p + 1) // 2 + factor - 1, p // 2 + 1,
                             (p + 1) // 2 + factor - 1, p // 2 + 1),
                  impl=impl if impl != "pallas" else "conv")
    return _from_nchw(y, data_format)


def conv_downsample2d(x, w, f=None, factor: int = 2, gain: float = 1.0,
                      data_format: str = "NCHW", impl: str = "conv") -> jnp.ndarray:
    """FIR + strided conv downsample (reference: conv_downsample_2d,
    upfirdn_2d.py:234-258). w: [kh, kw, Cin, Cout]."""
    assert factor >= 1
    kh, kw, cin, cout = w.shape
    f = setup_filter(f if f is not None else [1] * factor, gain=gain)
    fh, fw = f.shape
    p = fh - factor + (kh - 1)
    x = upfirdn2d(x, f, pad=((p + 1) // 2, p // 2, (p + 1) // 2, p // 2),
                  data_format=data_format,
                  impl=impl if impl != "pallas" else "conv")
    x = _to_nchw(x, data_format)
    wc = jnp.transpose(w, (3, 2, 0, 1)).astype(x.dtype)  # [Cout, Cin, kh, kw]
    y = lax.conv_general_dilated(
        x, wc, window_strides=(factor, factor), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return _from_nchw(y, data_format)
