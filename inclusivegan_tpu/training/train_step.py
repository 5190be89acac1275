"""The jitted training step — the innermost hot path.

Reference equivalent: four ``session.run`` calls per iteration over a
replicated multi-GPU graph with NCCL gradient all_sum
(/root/reference/training/training_loop.py:474-479, optimizer.py:193-201).

TPU-native design:
  * FOUR phase-level jitted programs — G main, lazy G path-length reg,
    D main (+Gs EMA), lazy D R1 reg — mirroring the reference's op split.
    Each phase compiles once; a fused single-program variant was measured to
    multiply XLA compile time superlinearly (3 cadence variants × a graph
    with ~14 G/D/VGG subgraphs) for <1% steady-state dispatch gain at these
    model sizes.
  * ``jax.shard_map`` over a 1-D ``data`` mesh: the per-device program is
    explicit, minibatch-stddev groups stay device-local exactly like the
    reference's per-GPU graphs, and gradient averaging is one
    ``lax.pmean`` over ICI.
  * Dataset images arrive as uint8 and are converted + mirror-augmented on
    device (reference process_reals, training_loop.py:40-60) — 4× less
    host→HBM traffic than feeding floats.
  * Per-device RNG: the step key is folded with the device's mesh index, so
    each shard draws independent latents/noise like the per-GPU random ops.

Gradient accumulation (the reference Optimizer's minibatch_multiplier
machinery, optimizer.py:208-234; rounds = minibatch_size //
(minibatch_gpu*num_gpus), training_loop.py:221,337,349) is
``TrainConfig.grad_accum_rounds``: each phase splits its per-device batch
into `rounds` microbatches and accumulates gradients with a ``lax.scan``
before the single Adam update — the TPU-native replacement for the
reference's accumulation variables + counter (SURVEY.md §2.3). The
reference's own loop only ever runs the fast path (training_loop.py:467
``assert len(rounds) == 1``); here rounds>1 is live and tested, though on
TPU a larger per-device batch or more chips on the data mesh is usually the
better lever.
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
    lpips_dtype: Any = None  # None → float32; jnp.bfloat16 for MXU-rate VGG
    # Channel-normalization layout for the G-phase LPIPS taps: None/"f32"
    # materializes f32 tap maps; "trunk" keeps them in lpips_dtype
    # (models/lpips.py::_normalize_channels_trunk_dtype — saves the 2×-wide
    # f32 HBM copies the r4 profile charged ~8 ms/iter to). Carried here so
    # a run's normalization mode is captured in its recorded config rather
    # than an env var read at trace time (ADVICE r4).
    lpips_norm: Any = None
    # One synthesis + one VGG call for the whole G phase instead of the
    # reference's 4+6 separate forwards. Round-1 measured it runtime-equal
    # and shelved it; under the round-3 Pallas-FIR default it is +24%
    # reg-cadence throughput at mb6 (the 4x-concatenated batch fills the
    # MXU tiles a per-forward batch of 6 leaves empty — BENCH_NOTES r4
    # A/B, both probe orders) and quality-neutral matched-seed on
    # stacked-MNIST (arm D 954 modes / KL 0.696 vs arm A 938 / 0.738).
    # ADOPTED as the default; False restores the reference-structured
    # per-forward variant.
    g_loss_batched: bool = True
    # Microbatch gradient-accumulation rounds per phase (reference
    # minibatch_multiplier, optimizer.py:208-234): each phase scans over
    # `rounds` microbatches of size per_device_batch/rounds, sums grads,
    # applies Adam once. 1 = fast path (reference training_loop.py:467).
    grad_accum_rounds: int = 1
    # Sharding-invariant randomness: derive every batch-shaped draw (arb
    # latents, mirror flips, interp factor, style-mixing latents2, synthesis
    # noise, path-reg latents/noise) from the GLOBAL example index instead of
    # folding the device index into the phase key, and share batch-scalar
    # draws (mixing decision/cutoff) across devices. The step then computes
    # the same losses/gradients/updated params on ANY data-mesh size for the
    # same global batch, up to float reduction order — n-chip and 1-chip
    # runs follow the same trajectory (asserted by
    # __graft_entry__.dryrun_multichip and tests/test_train_step.py).
    # Requires grad_accum_rounds=1 and, for exact invariance with mbstd
    # enabled, Discriminator(mbstd_contiguous=True) with the per-device
    # batch a multiple of the group size. Off by default: the device-folded
    # scheme matches the reference's independent per-GPU random ops.
    invariant_rng: bool = False
    # Donate the state pytree to each phase program: XLA reuses the input
    # param/moment HBM buffers for the outputs instead of allocating fresh
    # ones (~4 donations/iter at ~1 GB state). Only safe when the caller
    # never touches a state value after passing it in — the training loop
    # threads state linearly so it qualifies; keep False for interactive
    # use / tests that reuse a state across calls.
    donate_state: bool = False


def _microbatch(tree, rounds: int):
    """[n, ...] leaves → [rounds, n//rounds, ...] for lax.scan microbatching."""
    def split(x):
        n = x.shape[0]
        assert n % rounds == 0, (n, rounds)
        return x.reshape((rounds, n // rounds) + x.shape[1:])
    return jax.tree_util.tree_map(split, tree)


def _accum_scan(round_fn, params0, keys, micro=None, carry0=None):
    """Accumulate grads over microbatches (reference accumulation vars +
    counter, optimizer.py:208-234, as one lax.scan).

    round_fn(key, microbatch, carry) -> (aux, grads, new_carry); microbatch
    is None when `micro` is None, and carry threads sequentially through the
    rounds (used for the path-length EMA). Returns
    (mean_grads, aux_stack, final_carry) where aux_stack leaves have a
    leading `rounds` axis.
    """
    rounds = keys.shape[0]

    def body(c, xs):
        acc, carry = c
        key, mb = xs if micro is not None else (xs, None)
        aux, g, carry = round_fn(key, mb, carry)
        acc = jax.tree_util.tree_map(
            lambda a, b: a + b.astype(jnp.float32), acc, g)
        return (acc, carry), aux

    # accumulator and carry become device-varying inside the scan (per-
    # device data/rng) — the replicated initial values must be cast
    def _vary(x):
        return lax.pcast(x, ("data",), to="varying")

    zeros = jax.tree_util.tree_map(
        lambda p: _vary(jnp.zeros(p.shape, jnp.float32)), params0)
    carry0 = jax.tree_util.tree_map(_vary, carry0)
    xs = (keys, micro) if micro is not None else keys
    (acc, carry), aux_stack = lax.scan(body, (zeros, carry0), xs)
    grads = jax.tree_util.tree_map(lambda g: g / rounds, acc)
    return grads, aux_stack, carry


def _process_reals(x, rng, mirror_augment: bool, drange_data,
                   invariant: bool = False):
    """uint8 → drange_net [-1,1] + in-graph mirror augment
    (reference training_loop.py:40-60; LOD paths dropped — config-e has no
    progressive growing). ``invariant``: key each example's flip by its
    global index (rng must then be replicated, not device-folded)."""
    x = x.astype(jnp.float32)
    lo, hi = drange_data
    x = (x - lo) * (2.0 / (hi - lo)) - 1.0
    if mirror_augment:
        if invariant:
            n = x.shape[0]
            idx = lax.axis_index("data") * n + jnp.arange(n)
            u = jax.vmap(
                lambda i: random.uniform(random.fold_in(rng, i)))(idx)
            flip = u.reshape(n, 1, 1, 1) < 0.5
        else:
            flip = random.uniform(rng, (x.shape[0], 1, 1, 1)) < 0.5
        x = jnp.where(flip, x, x[:, :, :, ::-1])
    return x


def make_train_step(G, D, lpips_params, mesh: Mesh, cfg: TrainConfig):
    """Returns train_step(state, batch, rng, g_lr, d_lr, gs_beta,
    do_g_reg=..., do_d_reg=...) dispatching the phase programs in sequence.

    batch (host, global leading axis, sharded over 'data'):
      reals_rec_1/2: [mb,C,H,W] uint8|float, latents_rec_1/2: [mb,Z],
      labels_rec_1/2: [mb,L], reals: [2*mb,C,H,W], labels: [2*mb,L].
    """
    latent_size = G.mapping.latent_size
    label_size = G.mapping.label_size

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

    if cfg.invariant_rng:
        assert cfg.grad_accum_rounds == 1, (
            "invariant_rng guarantees sharding-invariance only for the "
            "rounds=1 fast path: microbatch round boundaries move with the "
            "mesh size, so per-round batch-scalar draws (style-mixing "
            "decisions) would hit different example sets")

    def _pmean_tree(tree):
        return jax.tree_util.tree_map(lambda x: lax.pmean(x, "data"), tree)

    def _device_rng(rng):
        return random.fold_in(rng, lax.axis_index("data"))

    def _global_keys(rng, local_n: int):
        """[local_n] per-example keys folded by GLOBAL example index —
        identical key set over any mesh size (invariant_rng mode)."""
        idx = lax.axis_index("data") * local_n + jnp.arange(local_n)
        return jax.vmap(lambda i: random.fold_in(rng, i))(idx)

    # ------------------------------------------------------------------
    def g_phase_local(state: TrainState, batch, rng, g_lrate, rec_w):
        # rec_w is a TRACED scalar: changing NN_rec_lpips_weight between
        # runs reuses the compiled phase program (a static weight forced a
        # full recompile of the G phase — ~1 h on a cold remote-compile
        # cache — when the mode-coverage watchdog escalated the knob)
        if not cfg.invariant_rng:
            rng = _device_rng(rng)
        k_aug1, k_aug2, k_g, k_arb, k_ex = random.split(rng, 5)
        local_mb = batch["latents_rec_1"].shape[0]
        reals_rec_1 = _process_reals(batch["reals_rec_1"], k_aug1,
                                     cfg.mirror_augment, cfg.drange_data,
                                     invariant=cfg.invariant_rng)
        reals_rec_2 = _process_reals(batch["reals_rec_2"], k_aug2,
                                     cfg.mirror_augment, cfg.drange_data,
                                     invariant=cfg.invariant_rng)
        if cfg.invariant_rng:
            arb_latents = jax.vmap(
                lambda ek: random.normal(ek, (latent_size,)))(
                    _global_keys(k_arb, local_mb))
            example_keys = _global_keys(k_ex, local_mb)
        else:
            arb_latents = random.normal(k_arb, (local_mb, latent_size))
            example_keys = None
        arb_labels = jnp.zeros((local_mb, label_size), jnp.float32)
        trainables0 = g_trainables(state.g_params)
        data = dict(
            latents_rec_1=batch["latents_rec_1"], reals_rec_1=reals_rec_1,
            labels_rec_1=batch["labels_rec_1"],
            latents_rec_2=batch["latents_rec_2"], reals_rec_2=reals_rec_2,
            labels_rec_2=batch["labels_rec_2"],
            arb_latents=arb_latents, arb_labels=arb_labels,
            example_keys=example_keys)

        def round_fn(key, d):
            def loss_fn(trainables):
                g_params = merge_g(trainables, state.g_params)
                out = g_main_loss(
                    g_params, state.d_params, G=G, D=D,
                    lpips_params=lpips_params, rng=key, **d,
                    NN_rec_lpips_weight=rec_w,
                    lpips_dtype=cfg.lpips_dtype or jnp.float32,
                    lpips_norm=cfg.lpips_norm,
                    batched=cfg.g_loss_batched)
                return jnp.mean(out.loss), out

            (g_loss, out), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(trainables0)
            return (g_loss, out.scalars, out.dlatent_batch_avgs), grads

        rounds = cfg.grad_accum_rounds
        if rounds == 1:
            (g_loss, raw_scalars, avgs), grads = round_fn(k_g, data)
            avgs = list(avgs)
        else:
            grads, (losses, scal, avg_stack), _ = _accum_scan(
                lambda k, d, c: round_fn(k, d) + (None,),
                trainables0, random.split(k_g, rounds),
                _microbatch(data, rounds))
            g_loss = jnp.mean(losses)
            raw_scalars = {k: jnp.mean(v) for k, v in scal.items()}
            # fold dlatent EMA per round, in round order (the reference
            # updates the EMA var once per round's forward)
            avgs = [a[r] for r in range(rounds) for a in avg_stack]

        grads = _pmean_tree(grads)
        g_tr, g_opt, _ = adam_apply(
            trainables0, grads, state.g_opt,
            learning_rate=g_lrate * g_lr_mul, beta1=g_b1, beta2=g_b2,
            epsilon=cfg.adam_eps)
        g_params = dict(merge_g(g_tr, state.g_params))
        g_params["dlatent_avg"] = fold_dlatent_avg(
            g_params["dlatent_avg"], [lax.pmean(a, "data") for a in avgs],
            G.dlatent_avg_beta)
        scalars = {k: lax.pmean(v, "data") for k, v in raw_scalars.items()}
        scalars["Loss/G_total"] = lax.pmean(g_loss, "data")
        return state._replace(g_params=g_params, g_opt=g_opt), scalars

    # ------------------------------------------------------------------
    def g_reg_phase_local(state: TrainState, rng, g_lrate, local_mb):
        if cfg.invariant_rng:
            rng, k_ex = random.split(rng)
            local_pl = max(local_mb // cfg.pl_minibatch_shrink, 1)
            pl_example_keys = _global_keys(k_ex, local_pl)
        else:
            rng = _device_rng(rng)
            pl_example_keys = None
        trainables0 = g_trainables(state.g_params)
        rounds = cfg.grad_accum_rounds
        mb_round = local_mb // max(rounds, 1)

        def round_fn(key, pl_mean):
            def reg_fn(trainables):
                gp = merge_g(trainables, state.g_params)
                reg, new_pl, reg_scalars, ba = g_path_reg(
                    gp, G=G, rng=key, pl_mean=pl_mean,
                    minibatch_size=mb_round, latent_size=latent_size,
                    label_size=label_size,
                    pl_minibatch_shrink=cfg.pl_minibatch_shrink,
                    pl_decay=cfg.pl_decay, pl_weight=cfg.pl_weight,
                    example_keys=pl_example_keys,
                    mean_fn=((lambda x: lax.pmean(jnp.mean(x), "data"))
                             if cfg.invariant_rng else None))
                return (jnp.mean(reg) * cfg.G_reg_interval,
                        (new_pl, reg_scalars, ba))

            (_, aux), grads = jax.value_and_grad(
                reg_fn, has_aux=True)(trainables0)
            return aux, grads

        if rounds == 1:
            (new_pl, reg_scalars, ba), grads = round_fn(rng, state.pl_mean)
            bas = [ba]
        else:
            # pl_mean EMA threads through the rounds sequentially (scan
            # carry), like the reference's per-round assign of the pl_mean
            # var (loss.py:76-79)
            def scan_fn(key, _mb, pl):
                (new_pl, scal, ba), g = round_fn(key, pl)
                return (scal, ba), g, new_pl

            grads, (scal_stack, ba_stack), new_pl = _accum_scan(
                scan_fn, trainables0, random.split(rng, rounds),
                carry0=state.pl_mean)
            reg_scalars = {k: jnp.mean(v) for k, v in scal_stack.items()}
            bas = [ba_stack[r] for r in range(rounds)]

        grads = _pmean_tree(grads)
        g_tr, g_opt, _ = adam_apply(
            trainables0, grads, state.g_opt,
            learning_rate=g_lrate * g_lr_mul, beta1=g_b1, beta2=g_b2,
            epsilon=cfg.adam_eps)
        g_params = dict(merge_g(g_tr, state.g_params))
        g_params["dlatent_avg"] = fold_dlatent_avg(
            g_params["dlatent_avg"], [lax.pmean(b, "data") for b in bas],
            G.dlatent_avg_beta)
        scalars = {k: lax.pmean(v, "data") for k, v in reg_scalars.items()}
        return state._replace(g_params=g_params, g_opt=g_opt,
                              pl_mean=lax.pmean(new_pl, "data")), scalars

    # ------------------------------------------------------------------
    def d_phase_local(state: TrainState, batch, rng, d_lrate, gs_beta):
        if not cfg.invariant_rng:
            rng = _device_rng(rng)
        k_aug, k_d, k_arb, k_ex = random.split(rng, 4)
        reals = _process_reals(batch["reals"], k_aug, cfg.mirror_augment,
                               cfg.drange_data, invariant=cfg.invariant_rng)
        n2 = reals.shape[0]
        if cfg.invariant_rng:
            arb_latents = jax.vmap(
                lambda ek: random.normal(ek, (latent_size,)))(
                    _global_keys(k_arb, n2))
            example_keys = _global_keys(k_ex, n2)
        else:
            arb_latents = random.normal(k_arb, (n2, latent_size))
            example_keys = None
        arb_labels = jnp.zeros((n2, label_size), jnp.float32)
        data = dict(reals=reals, labels=batch["labels"],
                    arb_latents=arb_latents, arb_labels=arb_labels,
                    example_keys=example_keys)

        def round_fn(key, d):
            def loss_fn(d_params):
                loss, scalars, avgs = d_main_loss(
                    d_params, state.g_params, G=G, D=D, rng=key, **d)
                return jnp.mean(loss), (scalars, avgs)

            (d_loss, (scalars, avgs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.d_params)
            return (d_loss, scalars, avgs), grads

        rounds = cfg.grad_accum_rounds
        if rounds == 1:
            (d_loss, d_scalars, avgs), grads = round_fn(k_d, data)
            avgs = list(avgs)
        else:
            grads, (losses, scal, avg_stack), _ = _accum_scan(
                lambda k, d, c: round_fn(k, d) + (None,),
                state.d_params, random.split(k_d, rounds),
                _microbatch(data, rounds))
            d_loss = jnp.mean(losses)
            d_scalars = {k: jnp.mean(v) for k, v in scal.items()}
            avgs = [a[r] for r in range(rounds) for a in avg_stack]
        grads = _pmean_tree(grads)
        d_params, d_opt, _ = adam_apply(
            state.d_params, grads, state.d_opt,
            learning_rate=d_lrate * d_lr_mul, beta1=d_b1, beta2=d_b2,
            epsilon=cfg.adam_eps)

        g_params = dict(state.g_params)
        g_params["dlatent_avg"] = fold_dlatent_avg(
            g_params["dlatent_avg"],
            [lax.pmean(a, "data") for a in avgs], G.dlatent_avg_beta)
        gs_params = update_gs(g_params, state.gs_params, gs_beta)
        scalars = {k: lax.pmean(v, "data") for k, v in d_scalars.items()}
        scalars["Loss/D_total"] = lax.pmean(d_loss, "data")
        return state._replace(step=state.step + 1, g_params=g_params,
                              d_params=d_params, d_opt=d_opt,
                              gs_params=gs_params), scalars

    # ------------------------------------------------------------------
    def d_reg_phase_local(state: TrainState, batch, rng, d_lrate, gamma):
        # gamma traced for the same compile-cache reason as rec_w above
        if not cfg.invariant_rng:
            rng = _device_rng(rng)
        reals = _process_reals(batch["reals"], rng, cfg.mirror_augment,
                               cfg.drange_data, invariant=cfg.invariant_rng)
        data = dict(reals=reals, labels=batch["labels"])

        def round_fn(key, d):
            del key  # R1 draws no randomness

            def reg_fn(d_params):
                reg, scalars = d_r1_reg(d_params, D=D, gamma=gamma, **d)
                return jnp.mean(reg) * cfg.D_reg_interval, scalars

            (_, scalars), grads = jax.value_and_grad(
                reg_fn, has_aux=True)(state.d_params)
            return scalars, grads

        rounds = cfg.grad_accum_rounds
        if rounds == 1:
            reg_scalars, grads = round_fn(None, data)
        else:
            grads, scal, _ = _accum_scan(
                lambda k, d, c: round_fn(k, d) + (None,),
                state.d_params, random.split(rng, rounds),
                _microbatch(data, rounds))
            reg_scalars = {k: jnp.mean(v) for k, v in scal.items()}
        grads = _pmean_tree(grads)
        d_params, d_opt, _ = adam_apply(
            state.d_params, grads, state.d_opt,
            learning_rate=d_lrate * d_lr_mul, beta1=d_b1, beta2=d_b2,
            epsilon=cfg.adam_eps)
        scalars = {k: lax.pmean(v, "data") for k, v in reg_scalars.items()}
        return state._replace(d_params=d_params, d_opt=d_opt), scalars

    # ------------------------------------------------------------------
    def _smap(fn, batch_tree, n_extra):
        """shard_map wrapper: state replicated, batch sharded, scalars
        replicated."""
        batch_spec = jax.tree_util.tree_map(lambda _: P("data"), batch_tree)
        specs = (P(), batch_spec) + (P(),) * n_extra
        return jax.shard_map(fn, mesh=mesh, in_specs=specs,
                             out_specs=(P(), P()))

    # cfg.donate_state lets XLA write each phase's updated params/moments
    # in place of the input buffers (the caller must thread state linearly)
    donate = (0,) if cfg.donate_state else ()

    @functools.partial(jax.jit, donate_argnums=donate)
    def g_step(state, batch_g, rng, g_lrate, rec_w):
        return _smap(g_phase_local, batch_g, 3)(state, batch_g, rng, g_lrate,
                                                rec_w)

    @functools.partial(jax.jit, static_argnums=(3,), donate_argnums=donate)
    def g_reg_step(state, rng, g_lrate, local_mb):
        fn = functools.partial(g_reg_phase_local, local_mb=local_mb)
        return jax.shard_map(fn, mesh=mesh, in_specs=(P(), P(), P()),
                             out_specs=(P(), P()))(state, rng, g_lrate)

    @functools.partial(jax.jit, donate_argnums=donate)
    def d_step(state, batch_d, rng, d_lrate, gs_beta):
        return _smap(d_phase_local, batch_d, 3)(state, batch_d, rng, d_lrate,
                                                gs_beta)

    @functools.partial(jax.jit, donate_argnums=donate)
    def d_reg_step(state, batch_d, rng, d_lrate, gamma):
        return _smap(d_reg_phase_local, batch_d, 3)(state, batch_d, rng,
                                                    d_lrate, gamma)

    num_dev = mesh.devices.size

    _scalar_cache: dict = {}

    def _dev_scalar(v):
        """Memoized device f32 for the per-iteration loss weights. A fresh
        ``jnp.float32(x)`` every call costs one relay RTT per phase on a
        remote-attached TPU (VERDICT r3 #4 — same fix as the lr/beta
        memoization in training_loop._dev_scalar); rec_weight is constant
        outside ramps and gamma is constant always, so the cache is tiny.
        Already-device values (traced or committed arrays) pass through."""
        if not isinstance(v, (int, float)):
            return v
        v = float(v)
        c = _scalar_cache.get(v)
        if c is None:
            if len(_scalar_cache) > 4096:  # rec ramps mint fresh values
                _scalar_cache.clear()
            c = _scalar_cache[v] = jnp.float32(v)
        return c

    def train_step(state, batch, rng, g_lrate, d_lrate, gs_beta, *,
                   do_g_reg: bool, do_d_reg: bool, rec_weight=None):
        """One full iteration = the reference's four session.run calls
        (training_loop.py:474-479). ``rec_weight`` overrides
        cfg.NN_rec_lpips_weight per call; it feeds a traced scalar so a
        schedule (e.g. ramping the IMLE anchor up late in training) costs
        no recompiles."""
        k1, k2, k3, k4 = random.split(rng, 4)
        batch_g = {k: batch[k] for k in
                   ("reals_rec_1", "labels_rec_1", "latents_rec_1",
                    "reals_rec_2", "labels_rec_2", "latents_rec_2")}
        batch_d = {"reals": batch["reals"], "labels": batch["labels"]}
        scalars = {}
        rec_w = (cfg.NN_rec_lpips_weight if rec_weight is None
                 else rec_weight)
        state, s = g_step(state, batch_g, k1, g_lrate, _dev_scalar(rec_w))
        scalars.update(s)
        if do_g_reg:
            local_mb = batch["latents_rec_1"].shape[0] // num_dev
            state, s = g_reg_step(state, k2, g_lrate, local_mb)
            scalars.update(s)
        state, s = d_step(state, batch_d, k3, d_lrate, gs_beta)
        scalars.update(s)
        if do_d_reg:
            state, s = d_reg_step(state, batch_d, k4, d_lrate,
                                  _dev_scalar(cfg.gamma))
            scalars.update(s)
        return state, scalars

    train_step.phases = dict(g_step=g_step, g_reg_step=g_reg_step,
                             d_step=d_step, d_reg_step=d_reg_step)
    return train_step
