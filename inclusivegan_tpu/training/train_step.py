"""The jitted training step — the innermost hot path.

Reference equivalent: four ``session.run`` calls per iteration over a
replicated multi-GPU graph with NCCL gradient all_sum
(/root/reference/training/training_loop.py:474-479, optimizer.py:193-201).

TPU-native design:
  * ONE jitted function per (do_g_reg, do_d_reg) combination — G step,
    lazy G path-length reg, D step (+Gs EMA), lazy D R1 reg fused into a
    single XLA program, so cross-phase scheduling/overlap is the compiler's
    job and per-step dispatch overhead is one call, not four.
  * ``jax.shard_map`` over a 1-D ``data`` mesh: the per-device program is
    explicit, minibatch-stddev groups stay device-local exactly like the
    reference's per-GPU graphs, and gradient averaging is one
    ``lax.pmean`` over ICI.
  * Dataset images arrive as uint8 and are converted + mirror-augmented on
    device (reference process_reals, training_loop.py:40-60) — 4× less
    host→HBM traffic than feeding floats.
  * Per-device RNG: the step key is folded with the device's mesh index, so
    each shard draws independent latents/noise like the per-GPU random ops.
"""

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax, random
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .loss import (d_main_loss, d_r1_reg, fold_dlatent_avg, g_main_loss,
                   g_path_reg)
from .optimizer import adam_apply, lazy_reg_hparams
from .train_state import TrainState, g_trainables, merge_g, update_gs


class TrainConfig(NamedTuple):
    """Static hyperparameters of the step (reference defaults cited in
    BASELINE.md)."""
    NN_rec_lpips_weight: float = 2.5
    gamma: float = 10.0
    pl_minibatch_shrink: int = 2
    pl_decay: float = 0.01
    pl_weight: float = 2.0
    G_reg_interval: int = 4
    D_reg_interval: int = 16
    adam_beta1: float = 0.0
    adam_beta2: float = 0.99
    adam_eps: float = 1e-8
    mirror_augment: bool = False
    drange_data: Tuple[float, float] = (0.0, 255.0)
    lazy_regularization: bool = True


def _process_reals(x, rng, mirror_augment: bool, drange_data):
    """uint8 → drange_net [-1,1] + in-graph mirror augment
    (reference training_loop.py:40-60; LOD paths dropped — config-e has no
    progressive growing)."""
    x = x.astype(jnp.float32)
    lo, hi = drange_data
    x = (x - lo) * (2.0 / (hi - lo)) - 1.0
    if mirror_augment:
        flip = random.uniform(rng, (x.shape[0], 1, 1, 1)) < 0.5
        x = jnp.where(flip, x, x[:, :, :, ::-1])
    return x


def make_train_step(G, D, lpips_params, mesh: Mesh, cfg: TrainConfig):
    """Returns train_step(state, batch, rng, lrates) jitted per static
    (do_g_reg, do_d_reg).

    batch (host, global leading axis, sharded over 'data'):
      reals_rec_1/2: [mb,C,H,W] uint8|float, latents_rec_1/2: [mb,Z],
      labels_rec_1/2: [mb,L], reals: [2*mb,C,H,W], labels: [2*mb,L].
    """
    latent_size = G.mapping.latent_size
    label_size = G.mapping.label_size
    num_dev = mesh.devices.size

    if cfg.lazy_regularization:
        g_lr_mul, g_b1, g_b2 = lazy_reg_hparams(1.0, cfg.adam_beta1,
                                                cfg.adam_beta2,
                                                cfg.G_reg_interval)
        d_lr_mul, d_b1, d_b2 = lazy_reg_hparams(1.0, cfg.adam_beta1,
                                                cfg.adam_beta2,
                                                cfg.D_reg_interval)
    else:
        g_lr_mul = d_lr_mul = 1.0
        g_b1 = d_b1 = cfg.adam_beta1
        g_b2 = d_b2 = cfg.adam_beta2

    def _pmean_tree(tree):
        return jax.tree_util.tree_map(lambda x: lax.pmean(x, "data"), tree)

    def step_local(state: TrainState, batch, rng, g_lrate, d_lrate, gs_beta,
                   do_g_reg: bool, do_d_reg: bool):
        didx = lax.axis_index("data")
        rng = random.fold_in(rng, didx)
        k_aug1, k_aug2, k_augd, k_g, k_greg, k_d, k_arb_g, k_arb_d = (
            random.split(rng, 8))

        scalars: Dict[str, jnp.ndarray] = {}
        local_mb = batch["latents_rec_1"].shape[0]

        reals_rec_1 = _process_reals(batch["reals_rec_1"], k_aug1,
                                     cfg.mirror_augment, cfg.drange_data)
        reals_rec_2 = _process_reals(batch["reals_rec_2"], k_aug2,
                                     cfg.mirror_augment, cfg.drange_data)
        reals = _process_reals(batch["reals"], k_augd,
                               cfg.mirror_augment, cfg.drange_data)

        # ------------------------------------------------ G main phase
        arb_latents = random.normal(k_arb_g, (local_mb, latent_size))
        arb_labels = jnp.zeros((local_mb, label_size), jnp.float32)

        def g_loss_fn(trainables):
            g_params = merge_g(trainables, state.g_params)
            out = g_main_loss(
                g_params, state.d_params, G=G, D=D,
                lpips_params=lpips_params, rng=k_g,
                latents_rec_1=batch["latents_rec_1"],
                reals_rec_1=reals_rec_1, labels_rec_1=batch["labels_rec_1"],
                latents_rec_2=batch["latents_rec_2"],
                reals_rec_2=reals_rec_2, labels_rec_2=batch["labels_rec_2"],
                arb_latents=arb_latents, arb_labels=arb_labels,
                NN_rec_lpips_weight=cfg.NN_rec_lpips_weight)
            return jnp.mean(out.loss), out

        (g_loss, g_out), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_trainables(state.g_params))
        g_grads = _pmean_tree(g_grads)
        scalars.update(g_out.scalars)
        scalars["Loss/G_total"] = g_loss
        batch_avgs = [lax.pmean(a, "data") for a in g_out.dlatent_batch_avgs]

        g_tr, g_opt, _ = adam_apply(
            g_trainables(state.g_params), g_grads, state.g_opt,
            learning_rate=g_lrate * g_lr_mul, beta1=g_b1, beta2=g_b2,
            epsilon=cfg.adam_eps)
        g_params = merge_g(g_tr, state.g_params)
        pl_mean = state.pl_mean

        # ------------------------------------------------ G lazy reg phase
        if do_g_reg:
            def g_reg_fn(trainables):
                gp = merge_g(trainables, g_params)
                reg, new_pl, reg_scalars, ba = g_path_reg(
                    gp, G=G, rng=k_greg, pl_mean=lax.pmean(state.pl_mean, "data"),
                    minibatch_size=local_mb, latent_size=latent_size,
                    label_size=label_size,
                    pl_minibatch_shrink=cfg.pl_minibatch_shrink,
                    pl_decay=cfg.pl_decay, pl_weight=cfg.pl_weight)
                return jnp.mean(reg) * cfg.G_reg_interval, (new_pl, reg_scalars, ba)

            (_, (new_pl, reg_scalars, ba)), reg_grads = jax.value_and_grad(
                g_reg_fn, has_aux=True)(g_trainables(g_params))
            reg_grads = _pmean_tree(reg_grads)
            scalars.update(reg_scalars)
            batch_avgs.append(lax.pmean(ba, "data"))
            g_tr, g_opt, _ = adam_apply(
                g_trainables(g_params), reg_grads, g_opt,
                learning_rate=g_lrate * g_lr_mul, beta1=g_b1, beta2=g_b2,
                epsilon=cfg.adam_eps)
            g_params = merge_g(g_tr, g_params)
            pl_mean = lax.pmean(new_pl, "data")

        # ------------------------------------------------ D main phase (+Gs)
        arb_latents_d = random.normal(k_arb_d, (2 * local_mb, latent_size))
        arb_labels_d = jnp.zeros((2 * local_mb, label_size), jnp.float32)
        labels_d = batch["labels"]

        def d_loss_fn(d_params):
            loss, d_scalars, avgs = d_main_loss(
                d_params, g_params, G=G, D=D, rng=k_d, reals=reals,
                labels=labels_d, arb_latents=arb_latents_d,
                arb_labels=arb_labels_d)
            return jnp.mean(loss), (d_scalars, avgs)

        (d_loss, (d_scalars, d_avgs)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_grads = _pmean_tree(d_grads)
        scalars.update(d_scalars)
        scalars["Loss/D_total"] = d_loss
        batch_avgs.extend(lax.pmean(a, "data") for a in d_avgs)

        d_params, d_opt, _ = adam_apply(
            state.d_params, d_grads, state.d_opt,
            learning_rate=d_lrate * d_lr_mul, beta1=d_b1, beta2=d_b2,
            epsilon=cfg.adam_eps)

        # fold every training-mode G forward into the dlatent_avg EMA
        dlatent_avg = fold_dlatent_avg(g_params["dlatent_avg"], batch_avgs,
                                       G.dlatent_avg_beta)
        g_params = dict(g_params)
        g_params["dlatent_avg"] = dlatent_avg

        gs_params = update_gs(g_params, state.gs_params, gs_beta)

        # ------------------------------------------------ D lazy reg phase
        if do_d_reg:
            def d_reg_fn(d_p):
                reg, reg_scalars = d_r1_reg(d_p, D=D, reals=reals,
                                            labels=labels_d, gamma=cfg.gamma)
                return jnp.mean(reg) * cfg.D_reg_interval, reg_scalars

            (_, reg_scalars), reg_grads = jax.value_and_grad(
                d_reg_fn, has_aux=True)(d_params)
            reg_grads = _pmean_tree(reg_grads)
            scalars.update(reg_scalars)
            d_params, d_opt, _ = adam_apply(
                d_params, reg_grads, d_opt,
                learning_rate=d_lrate * d_lr_mul, beta1=d_b1, beta2=d_b2,
                epsilon=cfg.adam_eps)

        new_state = TrainState(
            step=state.step + 1, g_params=g_params, d_params=d_params,
            gs_params=gs_params, g_opt=g_opt, d_opt=d_opt, pl_mean=pl_mean)
        scalars = {k: lax.pmean(v, "data") for k, v in scalars.items()}
        return new_state, scalars

    @functools.partial(jax.jit, static_argnames=("do_g_reg", "do_d_reg"))
    def train_step(state, batch, rng, g_lrate, d_lrate, gs_beta, *,
                   do_g_reg: bool, do_d_reg: bool):
        fn = functools.partial(step_local, do_g_reg=do_g_reg,
                               do_d_reg=do_d_reg)
        batch_spec = jax.tree_util.tree_map(lambda _: P("data"), batch)
        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(), batch_spec, P(), P(), P(), P()),
            out_specs=(P(), P()),
        )(state, batch, rng, g_lrate, d_lrate, gs_beta)

    return train_step
