"""Training state pytree + Gs EMA.

Replaces the reference's mutable-graph state: G/D variables, the Gs clone
updated by ``setup_as_moving_average_of`` (/root/reference/dnnlib/tflib/
network.py:341-351), per-network Adam slots, and the ``pl_mean`` variable
hidden inside the G regularizer (loss.py:70). Everything is explicit and
checkpointable with orbax (reference pkls checkpoint only the weights;
we checkpoint optimizer moments, EMA and counters too — SURVEY.md §5)."""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .optimizer import AdamState, init_adam


class TrainState(NamedTuple):
    step: jnp.ndarray       # int32 global step counter
    g_params: Any           # {'mapping','synthesis','noise','dlatent_avg'}
    d_params: Any
    gs_params: Any          # EMA clone of g_params (reference Gs)
    g_opt: AdamState        # over g trainables only
    d_opt: AdamState
    pl_mean: jnp.ndarray    # float32 scalar


G_NON_TRAINABLE = ("noise", "dlatent_avg")


def g_trainables(g_params):
    return {k: v for k, v in g_params.items() if k not in G_NON_TRAINABLE}


def merge_g(trainables, g_params):
    out = dict(g_params)
    out.update(trainables)
    return out


def create_train_state(rng, G, D) -> TrainState:
    kg, kd = jax.random.split(rng)
    g_params = G.init(kg)
    d_params = D.init(kd)
    gs_params = jax.tree_util.tree_map(jnp.copy, g_params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        gs_params=gs_params,
        g_opt=init_adam(g_trainables(g_params)),
        d_opt=init_adam(d_params),
        pl_mean=jnp.zeros((), jnp.float32),
    )


def update_gs(g_params, gs_params, beta):
    """Gs ← lerp(G, Gs, beta) on trainables; non-trainables copied from G
    (reference setup_as_moving_average_of with beta_nontrainable=0)."""
    new = {}
    for k, v in g_params.items():
        if k in G_NON_TRAINABLE:
            new[k] = jax.tree_util.tree_map(lambda a: a, v)
        else:
            new[k] = jax.tree_util.tree_map(
                lambda a, b: a + (b - a) * beta, v, gs_params[k])
    return new
