"""Pallas TPU kernels for the hot elementwise/FIR ops.

These are the TPU-native counterparts of the reference's two CUDA kernels
(/root/reference/dnnlib/tflib/ops/fused_bias_act.cu, upfirdn_2d.cu). XLA's
fusion already makes the plain-jnp paths near-optimal, so these kernels exist
to (a) pin the fusion (bias+lrelu+gain in exactly one VPU pass regardless of
surrounding graph), (b) serve as the parity-tested template for deeper fusion
work, and (c) back ``impl='pallas'`` in the op wrappers.

Design notes:
  * bias_act: x is viewed as [M, K] rows with one bias per row (M = N*C for
    NCHW). Grid over row-blocks; a (block_m, 1) bias column broadcasts on the
    VPU. custom_vjp keeps the backward a single kernel-shaped expression that
    is itself differentiable (2nd-order grads are exact: lrelu is piecewise
    linear, matching the reference's grad=2 kernel semantics,
    fused_bias_act.cu:60-100).
  * upfirdn2d: zero-insert upsampling and stride-downsampling are pure data
    movement (XLA relayouts); the FLOPs are the FIR taps. The kernel therefore
    consumes a host-padded/dilated input and does the unrolled shift-and-sum
    per (n,c) image in VMEM, with the downsample as a strided slice of the
    accumulator.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    # Pallas TPU kernels run interpreted on CPU test meshes.
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# bias + lrelu + gain
# ---------------------------------------------------------------------------

def _bias_lrelu_kernel(x_ref, b_ref, y_ref, *, alpha: float, gain: float):
    x = x_ref[:] + b_ref[:]  # (bm, K) + (bm, 1) broadcasts on the VPU
    # v5e Mosaic has no bf16 vector cmpf ("Target does not support this
    # comparison"); compare in f32 — the cast fuses into the same VPU pass
    mask = x.astype(jnp.float32) >= 0
    y_ref[:] = jnp.where(mask, x, x * alpha) * gain


def _bias_lrelu_2d(x2d: jnp.ndarray, brow: jnp.ndarray, alpha: float,
                   gain: float) -> jnp.ndarray:
    vma = jax.typeof(x2d).vma
    if _interpret() and vma:
        # The hlo interpreter evaluates the kernel jaxpr under shard_map's
        # vma checking, where every in-kernel literal (0, alpha, gain) is
        # non-varying and each elementwise op mismatches. Interpret mode
        # exists only for CPU test meshes — run the mathematically
        # identical jnp form there; the real TPU path always compiles the
        # kernel (kernel-body parity is covered by the non-shard_map tests
        # in tests/test_ops.py).
        x = x2d + brow[:, None].astype(x2d.dtype)
        return jnp.where(x >= 0, x, x * alpha) * gain
    m, k = x2d.shape
    bm = 8 if m % 8 == 0 else m
    grid = (pl.cdiv(m, bm),)
    return pl.pallas_call(
        functools.partial(_bias_lrelu_kernel, alpha=alpha, gain=gain),
        # propagate the input's varying-mesh-axes so the kernel traces
        # inside shard_map (check_vma requires an explicit out vma)
        out_shape=jax.ShapeDtypeStruct((m, k), x2d.dtype,
                                       vma=jax.typeof(x2d).vma),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(x2d, brow[:, None].astype(x2d.dtype))


def bias_act_lrelu_pallas(x, b, axis: int = 1, alpha: float = 0.2,
                          gain: float = float(np.sqrt(2))):
    """y = lrelu(x + b[axis]) * gain as one Pallas VPU pass. x: [N,C,H,W].

    Differentiable to every order via custom_jvp: the tangent map is
    ``slope(y) * (dx + db)`` with ``slope = gain·[alpha if y<0 else 1]`` —
    sign(y) == sign(x+b) because lrelu is monotonic with gain>0, the same
    output-only-residual trick as the reference's grad kernels
    (fused_bias_act.py:96-141). The tangent expression is built from
    transposable primitives, so JAX derives reverse mode automatically, and
    slope's own derivative is 0 a.e. — matching the reference's grad=2
    second-order semantics (fused_bias_act.cu:60-100), which R1 and the
    path-length regularizer rely on."""
    if b is None:
        b = jnp.zeros((x.shape[axis],), x.dtype)
    return _bias_act_lrelu_p(x, b, axis, alpha, gain)


@functools.partial(jax.custom_jvp, nondiff_argnums=(2, 3, 4))
def _bias_act_lrelu_p(x, b, axis, alpha, gain):
    return _fwd_impl(x, b, axis, alpha, gain)


def _fwd_impl(x, b, axis, alpha, gain):
    n, c, h, w = x.shape
    assert axis == 1
    x2d = x.reshape(n * c, h * w)
    brow = jnp.tile(b, n)
    y2d = _bias_lrelu_2d(x2d, brow, alpha, gain)
    return y2d.reshape(n, c, h, w)


@_bias_act_lrelu_p.defjvp
def _bias_act_jvp(axis, alpha, gain, primals, tangents):
    x, b = primals
    dx, db = tangents
    y = _bias_act_lrelu_p(x, b, axis, alpha, gain)
    slope = jnp.where(y >= 0, gain, gain * alpha).astype(y.dtype)
    shape = [1] * x.ndim
    shape[axis] = -1
    dy = slope * (dx + db.reshape(shape).astype(dx.dtype))
    return y, dy


# ---------------------------------------------------------------------------
# upfirdn2d FIR core
# ---------------------------------------------------------------------------

def _fir_kernel(x_ref, y_ref, *, taps: Tuple[Tuple[float, ...], ...],
                down: int, oh: int, ow: int):
    """Shift-and-sum FIR over one padded image block, then downsample.

    x_ref: (1, Hp, Wp) padded/dilated input with Hp ≥ oh·down + kh - 1;
    taps already flipped for convolution and scaled by gain. Unrolled at
    trace time (kernels are ≤4×4 in every reference call site:
    resample_kernel=[1,3,3,1], networks_stylegan2.py:339). The downsample is
    a reshape + static index — Mosaic has no lowering for strided slices."""
    xp = x_ref[0]
    kh = len(taps)
    kw = len(taps[0])
    fh, fw = oh * down, ow * down  # full-rate extent (host pads to cover it)
    # Accumulate in float32 regardless of input dtype (ADVICE r3): the conv
    # path this kernel replaces accumulates on the MXU in f32, and the TPU
    # VPU computes in f32 natively anyway — bf16 accumulation saved nothing
    # and drifted. Cast once on store.
    acc = None
    for i in range(kh):
        for j in range(kw):
            t = taps[i][j]
            if t == 0.0:
                continue
            term = xp[i:i + fh, j:j + fw].astype(jnp.float32) * t
            acc = term if acc is None else acc + term
    if acc is None:
        acc = jnp.zeros((fh, fw), jnp.float32)
    if down > 1:
        # Decimation as two 0/1 selection matmuls (MXU-native; Mosaic has no
        # strided slice or rank-changing reshape lowering):
        #   y = R @ acc @ C,  R[o, i] = [i == o*down],  C[j, o] = [j == o*down]
        r_sel = (jax.lax.broadcasted_iota(jnp.int32, (oh, fh), 1) ==
                 jax.lax.broadcasted_iota(jnp.int32, (oh, fh), 0) * down
                 ).astype(jnp.float32)
        c_sel = (jax.lax.broadcasted_iota(jnp.int32, (fw, ow), 0) ==
                 jax.lax.broadcasted_iota(jnp.int32, (fw, ow), 1) * down
                 ).astype(jnp.float32)
        acc = jnp.dot(r_sel, jnp.dot(acc, c_sel,
                                     preferred_element_type=jnp.float32),
                      preferred_element_type=jnp.float32)
    y_ref[0] = acc.astype(y_ref.dtype)


def upfirdn2d_pallas(x, f, up: int, down: int,
                     pad: Tuple[int, int, int, int], gain: float):
    """Pallas-backed upfirdn2d on NCHW input (see ops/upfirdn2d.py for the
    op contract). Host does the zero-insert + edge pad (pure relayout); the
    kernel does the FIR + downsample per (n, c) image.

    Differentiable to every order: the VJP is another upfirdn2d with flipped
    taps and swapped up/down (the reference wrapper's gradient construction,
    upfirdn_2d.py:130-140), so the backward pass reuses this same kernel and
    the second-order path needed by R1 (loss.py:107-111) is exact. The FIR
    taps must be concrete at trace time (they are baked into the kernel as
    static floats); every model call site passes a static resample kernel."""
    if _interpret() and jax.typeof(x).vma:
        # interpret-mode kernels cannot run under shard_map's vma checking
        # (in-kernel literals are non-varying) — same rationale as
        # _bias_lrelu_2d; CPU meshes take the conv fast path instead
        from .upfirdn2d import _upfirdn2d_conv
        return _upfirdn2d_conv(x, jnp.asarray(f, jnp.float32), up, down,
                               pad, gain)
    taps = tuple(tuple(float(v) for v in row)
                 for row in np.asarray(f, np.float32))
    return _upfirdn_core(x, taps, up, down, tuple(pad), float(gain))


def _upfirdn_core(x, taps, up, down, pad, gain):
    """All-order-differentiable Pallas upfirdn. The op is LINEAR in x, so
    ``jax.custom_derivatives.linear_call`` pairs the kernel with its exact
    transpose — flipped taps, swapped up/down, and the pad that reconstructs
    the input extent (the reference wrapper's gradient construction,
    upfirdn_2d.py:130-140; gain carries over UNCHANGED — the up²/down²
    factor in the reference belongs to its public up/downsample wrapper
    gains, not to the raw op transpose — verified against XLA autodiff in
    tests/test_ops.py). Every AD order (R1's double backprop included)
    reduces to linear_calls of the same two kernel invocations."""
    in_h, in_w = x.shape[2], x.shape[3]
    kh, kw = len(taps), len(taps[0])
    padx0, padx1, pady0, pady1 = pad
    out_h = (in_h * up + pady0 + pady1 - kh) // down + 1
    out_w = (in_w * up + padx0 + padx1 - kw) // down + 1
    gpad = (kw - padx0 - 1,
            in_w * up - out_w * down + padx0 - up + 1,
            kh - pady0 - 1,
            in_h * up - out_h * down + pady0 - up + 1)
    ftaps = tuple(tuple(reversed(row)) for row in reversed(taps))

    def fwd(_, v):
        return _upfirdn_core_impl(v, taps, up, down, pad, gain)

    def bwd(_, g):
        return _upfirdn_core_impl(g, ftaps, down, up, gpad, gain)

    return jax.custom_derivatives.linear_call(fwd, bwd, (), x)


def _upfirdn_core_impl(x, taps, up, down, pad, gain):
    padx0, padx1, pady0, pady1 = pad
    n, c, h, w = x.shape
    kh, kw = len(taps), len(taps[0])
    oh = (h * up + pady0 + pady1 - kh) // down + 1
    ow = (w * up + padx0 + padx1 - kw) // down + 1
    # pad so the kernel's full-rate extent oh·down + kh - 1 is covered
    # (the trailing extra zeros contribute only to dropped samples)
    base_h = h * up + pady0 + pady1
    base_w = w * up + padx0 + padx1
    extra_h = max(oh * down + kh - 1 - base_h, 0)
    extra_w = max(ow * down + kw - 1 - base_w, 0)
    xp = lax.pad(x, jnp.zeros((), x.dtype), [
        (0, 0, 0), (0, 0, 0),
        (pady0, pady1 + (up - 1) + extra_h, up - 1),
        (padx0, padx1 + (up - 1) + extra_w, up - 1),
    ])
    hp, wp = xp.shape[2], xp.shape[3]
    # flipped taps * gain, baked in as static python floats
    kf = np.asarray(taps)[::-1, ::-1] * gain
    ktaps = tuple(tuple(float(v) for v in row) for row in kf)
    xp2 = xp.reshape(n * c, hp, wp)
    y = pl.pallas_call(
        functools.partial(_fir_kernel, taps=ktaps, down=down, oh=oh, ow=ow),
        out_shape=jax.ShapeDtypeStruct((n * c, oh, ow), x.dtype,
                                       vma=jax.typeof(xp2).vma),
        grid=(n * c,),
        in_specs=[pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, oh, ow), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(xp2)
    return y.reshape(n, c, oh, ow)


