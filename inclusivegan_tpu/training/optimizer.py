"""Adam with shared moments across training phases + non-finite-gradient skip.

Capability parity with the reference tflib.Optimizer
(/root/reference/dnnlib/tflib/optimizer.py):
  * main and lazy-regularization steps share one set of Adam moments
    (``share=G_opt``, optimizer.py / training_loop.py:254-255);
  * lazy regularization folds ``mb_ratio = interval/(interval+1)`` into the
    lr and betas of BOTH phases (training_loop.py:246-253);
  * the whole update is skipped — moments, counter, params untouched — when
    any gradient is non-finite (optimizer.py:237-239);
  * gradient averaging across devices is a psum in the train step (the
    TPU-native replacement for the NCCL all_sum at optimizer.py:193-201).

Implemented by hand (~40 lines) rather than with optax because optax
transforms pin (b1, b2) at construction, while the reference semantics need
per-phase hyperparameters over shared state.

Loss scaling (optimizer.py:40-49) is intentionally absent: it exists for
fp16 GPUs; TPU bf16 has fp32 dynamic range and needs none (SURVEY.md §2.3).
"""

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    count: jnp.ndarray  # int32 scalar
    m: Any              # first-moment pytree (matches params)
    v: Any              # second-moment pytree


def init_adam(params) -> AdamState:
    zeros = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, jnp.float32), params)
    return AdamState(jnp.zeros((), jnp.int32), zeros,
                     jax.tree_util.tree_map(jnp.copy, zeros))


def grads_finite(grads) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(grads)
    ok = jnp.array(True)
    for g in leaves:
        ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(g)))
    return ok


def adam_apply(params, grads, state: AdamState, *, learning_rate,
               beta1: float = 0.0, beta2: float = 0.99,
               epsilon: float = 1e-8) -> Tuple[Any, AdamState, jnp.ndarray]:
    """One Adam step; returns (new_params, new_state, update_ok)."""
    ok = grads_finite(grads)
    count = state.count + 1
    c = count.astype(jnp.float32)
    bc1 = 1.0 - beta1 ** c
    bc2 = 1.0 - beta2 ** c

    def upd(p, g, m, v):
        g = g.astype(jnp.float32)
        m_new = beta1 * m + (1.0 - beta1) * g
        v_new = beta2 * v + (1.0 - beta2) * jnp.square(g)
        step = learning_rate * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + epsilon)
        p_new = (p.astype(jnp.float32) - step).astype(p.dtype)
        return p_new, m_new, v_new

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.m)
    flat_v = treedef.flatten_up_to(state.v)
    new_p, new_m, new_v = [], [], []
    for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v):
        pn, mn, vn = upd(p, g, m, v)
        # skip entirely on non-finite grads (reference optimizer.py:237-239)
        new_p.append(jnp.where(ok, pn, p))
        new_m.append(jnp.where(ok, mn, m))
        new_v.append(jnp.where(ok, vn, v))
    new_state = AdamState(jnp.where(ok, count, state.count),
                          jax.tree_util.tree_unflatten(treedef, new_m),
                          jax.tree_util.tree_unflatten(treedef, new_v))
    return jax.tree_util.tree_unflatten(treedef, new_p), new_state, ok


def lazy_reg_hparams(learning_rate, beta1, beta2, reg_interval: int):
    """Fold the lazy-regularization minibatch ratio into (lr, β1, β2)
    (reference training_loop.py:246-253). Applied to both the main and reg
    phases of the affected network."""
    mb_ratio = reg_interval / (reg_interval + 1.0)
    return learning_rate * mb_ratio, beta1 ** mb_ratio, beta2 ** mb_ratio
