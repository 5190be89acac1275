"""fused_bias_act — ``y = act(x + b[axis]) * gain`` with 9 activations.

Capability parity with the reference CUDA kernel
(/root/reference/dnnlib/tflib/ops/fused_bias_act.cu:42-186 and wrapper
fused_bias_act.py:34-96): same activation set with the same default alpha/gain.

TPU-native design: the reference needed a fused kernel (plus hand-derived
1st/2nd-order gradient kernels, grad∈{0,1,2}) because TF1 would otherwise
materialize intermediates in HBM. Under XLA the bias-add + activation + gain
is a single fused VPU loop, and autodiff delivers exact gradients of every
order — required by the R1 and path-length regularizers (loss.py:54-111).
We therefore express the op in plain jnp and keep a Pallas implementation
(ops/pallas_kernels.py) for the parity suite and as the template for further
fusion work.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class _Act(NamedTuple):
    fn: callable
    def_alpha: float
    def_gain: float


# Table mirrors fused_bias_act.py:20-31 (names, default alpha/gain).
activation_funcs = {
    "linear":   _Act(lambda x, a: x,                                0.0, 1.0),
    "relu":     _Act(lambda x, a: jnp.maximum(x, 0.0),              0.0, float(np.sqrt(2))),
    "lrelu":    _Act(lambda x, a: jnp.where(x >= 0, x, x * a),      0.2, float(np.sqrt(2))),
    "tanh":     _Act(lambda x, a: jnp.tanh(x),                      0.0, 1.0),
    "sigmoid":  _Act(lambda x, a: jax.nn.sigmoid(x),                0.0, 1.0),
    "elu":      _Act(lambda x, a: jax.nn.elu(x),                    0.0, 1.0),
    "selu":     _Act(lambda x, a: jax.nn.selu(x),                   0.0, 1.0),
    "softplus": _Act(lambda x, a: jax.nn.softplus(x),               0.0, 1.0),
    "swish":    _Act(lambda x, a: jax.nn.swish(x),                  0.0, float(np.sqrt(2))),
}


def fused_bias_act(x, b=None, axis: int = 1, act: str = "linear",
                   alpha: Optional[float] = None, gain: Optional[float] = None,
                   clamp: Optional[float] = None, impl: str = "jax"):
    """Add per-channel bias along ``axis``, apply activation, scale by gain.

    Matches the reference wrapper semantics (fused_bias_act.py:34-68):
    alpha/gain default from the activation table; gain multiplies the output.
    ``clamp`` (not in the 2019 reference, standard in later StyleGAN2 work)
    optionally clips the output to ±clamp; disabled by default.
    """
    spec = activation_funcs[act]
    alpha = spec.def_alpha if alpha is None else float(alpha)
    gain = spec.def_gain if gain is None else float(gain)

    if impl == "pallas" and x.ndim == 4 and act == "lrelu":
        from . import pallas_kernels
        return pallas_kernels.bias_act_lrelu_pallas(x, b, axis, alpha, gain)

    if b is not None:
        assert b.ndim == 1 and b.shape[0] == x.shape[axis]
        shape = [1] * x.ndim
        shape[axis] = -1
        x = x + b.reshape(shape).astype(x.dtype)
    x = spec.fn(x, alpha)
    if gain != 1.0:
        x = x * jnp.asarray(gain, x.dtype)
    if clamp is not None:
        assert clamp >= 0
        x = jnp.clip(x, -clamp, clamp)
    return x
