"""Main training loop — capability parity with
/root/reference/training/training_loop.py:123-537, rebuilt around a fused
jitted TPU step.

Artifacts produced in the run dir match the reference layout: ``log.txt``,
``arb-reals.png`` / ``arb-fakes-%06d.png`` / ``rec-reals.png`` /
``rec-fakes-%06d.png`` grids (:172,507-515), ``network-snapshot-%06d.pkl``
(:516-518) and ``network-final.pkl`` (:530), ``stats.jsonl`` (autosummary
equivalent), per-tick console lines with kimg/time/sec-per-kimg (:494-505),
``abort.txt`` cooperative stop (:333), and metric files via the metrics
package.

Structural differences (TPU-first, documented):
  * one fused jitted train step per (G-reg?, D-reg?) cadence combination
    instead of four session.run calls (see train_step.py);
  * the IMLE rebuild generates candidates with jitted TPU batches and runs
    DCI projections as TPU matmuls (see imle.py);
  * checkpoints carry params + optimizer moments + EMA + counters (the
    reference pkls carry only weights, losing Adam/pl_mean state on resume).
"""

import os
import pickle
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import Prefetcher, load_dataset
from ..data.dataset_tool import load_celeba_attributes
from ..models import Discriminator, GMain
from ..models.lpips import get_lpips_params
from ..parallel import make_data_mesh, shard_batch
from ..utils import misc
from ..utils.easydict import EasyDict
from ..utils.run_harness import RunContext
from ..utils.stats import StatsCollector
from .imle import IMLEOrchestrator
from .schedule import resume_rampup_scale, training_schedule
from .train_state import create_train_state
from .train_step import TrainConfig, make_train_step


def setup_snapshot_image_grid(dataset, size="1080p"):
    """Reference misc.setup_snapshot_image_grid (:95-143), 'random' layout."""
    gw, gh = 8, 4
    if size == "1080p":
        gw = np.clip(1920 // dataset.shape[2], 3, 32)
        gh = np.clip(1080 // dataset.shape[1], 2, 32)
    if size == "4k":
        gw = np.clip(3840 // dataset.shape[2], 7, 32)
        gh = np.clip(2160 // dataset.shape[1], 4, 32)
    if size == "8k":
        gw = np.clip(7680 // dataset.shape[2], 7, 32)
        gh = np.clip(4320 // dataset.shape[1], 4, 32)
    reals, labels = dataset.get_minibatch_np(gw * gh)
    return (gw, gh), reals, labels


def snapshot_dict(G, D, state) -> dict:
    """Documented snapshot layout: the reference's (G, D, Gs) triple
    (training_loop.py:516) as config+params dicts instead of
    source-embedding pickles (network.py:255-299)."""

    def net(model, params):
        import dataclasses
        cfg = dataclasses.asdict(model) if dataclasses.is_dataclass(model) else dict(model)
        return {"config": cfg,
                "params": jax.tree_util.tree_map(np.asarray, params)}

    return {
        "format": "inclusivegan_tpu.network_snapshot.v1",
        "G": net(G, state.g_params),
        "D": net(D, state.d_params),
        "Gs": net(G, state.gs_params),
    }


def load_snapshot(path: str):
    """→ (G, D, state_params dict with g/d/gs params)."""
    with open(path, "rb") as f:
        snap = pickle.load(f)
    assert snap.get("format", "").startswith("inclusivegan_tpu.network_snapshot")

    def to_jnp(tree):
        return jax.tree_util.tree_map(jnp.asarray, tree)

    g_cfg = dict(snap["G"]["config"])
    mapping_cfg = g_cfg.pop("mapping")
    synthesis_cfg = g_cfg.pop("synthesis")
    from ..models.stylegan2 import GMapping, GSynthesis
    for c in (mapping_cfg, synthesis_cfg):
        c.pop("dtype", None)
    G = GMain(mapping=GMapping(**mapping_cfg),
              synthesis=GSynthesis(**{k: (tuple(v) if k == "resample_kernel" else v)
                                      for k, v in synthesis_cfg.items()}),
              **g_cfg)
    d_cfg = dict(snap["D"]["config"])
    d_cfg.pop("dtype", None)
    d_cfg["resample_kernel"] = tuple(d_cfg.get("resample_kernel", (1, 3, 3, 1)))
    D = Discriminator(**d_cfg)
    return G, D, {
        "g_params": to_jnp(snap["G"]["params"]),
        "d_params": to_jnp(snap["D"]["params"]),
        "gs_params": to_jnp(snap["Gs"]["params"]),
    }


_DEV_SCALARS: dict = {}


def _dev_scalar(x):
    """Memoized jnp.float32 constant. Lrates and the EMA beta change only at
    tick boundaries (or per-iteration only during a resume lr ramp), so
    re-uploading the same scalar every iteration is pure relay overhead —
    on a remote-attached TPU each tiny H2D transfer rides the same RTT as a
    big one."""
    x = float(x)
    v = _DEV_SCALARS.get(x)
    if v is None:
        if len(_DEV_SCALARS) > 4096:  # resume ramps mint fresh values
            _DEV_SCALARS.clear()
        v = _DEV_SCALARS[x] = jnp.float32(x)
    return v


def training_loop(
    submit_config=None,
    G_args: dict = {},
    D_args: dict = {},
    G_opt_args: dict = {},
    D_opt_args: dict = {},
    G_loss_args: dict = {},
    D_loss_args: dict = {},
    dataset_args: dict = {},
    sched_args: dict = {},
    grid_args: dict = {},
    metric_arg_list: list = [],
    data_dir: Optional[str] = None,
    G_smoothing_kimg: float = 10.0,
    minibatch_repeats: int = 4,
    lazy_regularization: bool = True,
    G_reg_interval: int = 4,
    D_reg_interval: int = 16,
    total_kimg: int = 25000,
    mirror_augment: bool = False,
    drange_net=(-1, 1),
    resume_pkl: Optional[str] = None,
    resume_checkpoint: Optional[str] = None,  # orbax full state (step dir,
    # a checkpoints/ dir, or a run dir containing checkpoints/)
    resume_staleness: Optional[int] = None,  # override the restored IMLE
    # staleness on resume (reference has no full-state resume; this keeps
    # re-retrieval cadence a free knob when continuing a run)
    resume_lrate_rampup_kimg: float = 0.0,  # warm Adam back up after a
    # weights-only --resume-pkl (fresh moments): linear lr ramp over this
    # many kimg past the resume point (schedule.resume_rampup_scale).
    # Also slows the Gs EMA by the same ramp (beta**ramp): without it the
    # EMA average — the eval-quality asset of the snapshot — decays to the
    # raw G within ~3 half-lives while G is still warming up (measured
    # 959→878 modes in 60 kimg at near-zero lr)
    resume_g_from_gs: bool = False,  # start training G from the Gs (EMA)
    # weights of the snapshot: the averaged point is the better model, and
    # resuming the raw G just re-derives it over ~10 kimg of EMA decay
    data_size: int = 3000,
    num_epochs: int = 10000,
    init_proj_dim: Optional[int] = None,
    init_staleness: int = 10,
    num_samples_factor: int = 25,
    knn_perturb_factor: float = 0.1,
    knn_backend: str = "auto",
    candidate_batch_size: int = 256,
    exclusive_retrieved_code: int = 0,
    rec_weight_final: Optional[float] = None,  # schedule the IMLE anchor
    # NN_rec_lpips_weight from its base (G_loss_args) toward this value,
    # linearly over [rec_weight_ramp_start_kimg, rec_weight_ramp_end_kimg].
    # rec weight is a traced scalar (train_step.py), so the ramp costs no
    # recompiles. Ramping the anchor UP late counters the measured late-
    # training mode decay (BENCH_NOTES mode-coverage post-mortems).
    rec_weight_ramp_start_kimg: float = 0.0,
    rec_weight_ramp_end_kimg: float = 0.0,
    dist_thres_percentile: float = 100.0,
    attr_interesting: Optional[str] = None,
    lpips_weights_path: Optional[str] = None,
    lpips_norm: Optional[str] = None,  # "f32" (default) or "trunk" — LPIPS
    # tap channel-normalization layout (TrainConfig.lpips_norm; ADVICE r4:
    # config-carried, not env-carried, so the run records it)
    image_snapshot_ticks: Optional[int] = None,
    network_snapshot_ticks: Optional[int] = None,
    num_devices: Optional[int] = None,
    seed: int = 1000,
    smoke_test_max_iters: Optional[int] = None,
    prefetch_depth: int = 2,  # host batch-assembly lookahead (0 = inline);
    # overlaps IMLE gather + TFRecord decode + H2D with the device step
    # (reference overlapped via tf.data prefetch, dataset.py:97-120)
    enable_profiler: bool = False,   # jax.profiler trace of iters 8-16
    save_full_checkpoints: bool = True,  # orbax state (params+opt+EMA)
    invariant_rng: bool = False,  # sharding-invariant per-example RNG:
    # an n-chip run computes the SAME training trajectory as a 1-chip run
    # of the same global batch (train_step.py TrainConfig.invariant_rng;
    # asserted by dryrun_multichip + tests/test_train_step.py). Costs
    # per-example fold_in vmaps in every phase — see BENCH_NOTES for the
    # measured on-chip price at production config before enabling on pods.
):
    run_dir = submit_config.run_dir if submit_config is not None else "."
    stats = StatsCollector(run_dir)
    from ..utils.tfevents import EventWriter
    events = EventWriter(run_dir)
    ctx = RunContext(submit_config) if submit_config is not None else None
    np.random.seed(seed)

    if image_snapshot_ticks is None:
        image_snapshot_ticks = max(data_size // 1000, 1)
    if network_snapshot_ticks is None:
        network_snapshot_ticks = max(data_size // 1000 * 5, 1)

    # ------------------------------------------------------------ datasets
    # Both streams iterate deterministically: the IMLE cursor arithmetic
    # depends on fixed epoch order (reference loads with shuffle_mb=0).
    training_set = load_dataset(data_dir=data_dir, verbose=True,
                                shuffle=False, **dataset_args)
    training_set_rec = load_dataset(data_dir=data_dir, verbose=False,
                                    shuffle=False, **dataset_args)
    grid_size, grid_reals, grid_labels = setup_snapshot_image_grid(
        training_set, **grid_args)
    misc.save_image_grid(grid_reals, os.path.join(run_dir, "arb-reals.png"),
                         drange=training_set.dynamic_range, grid_size=grid_size)

    attr_names = None
    if attr_interesting is not None:
        attr_file = "celeba/Anno/list_attr_celeba.txt"
        assert os.path.isfile(attr_file), attr_file
        attr_names, _ = load_celeba_attributes(attr_file)

    # ------------------------------------------------------------ networks
    resume_kimg = 0.0
    resume_time = 0.0  # prior wall-clock seconds (reference misc.py:147-161)
    resume_state_params = None
    if resume_pkl is None:
        print("Constructing networks...")
        G = GMain.create(num_channels=training_set.shape[0],
                         resolution=training_set.shape[1],
                         label_size=training_set.label_size, **G_args)
        D = Discriminator(num_channels=training_set.shape[0],
                          resolution=training_set.shape[1],
                          label_size=training_set.label_size,
                          **{k: v for k, v in D_args.items()})
    else:
        print(f'Loading networks from "{resume_pkl}"...')
        G, D, resume_state_params = load_snapshot(resume_pkl)
        resume_kimg, resume_time = misc.parse_kimg_time_from_log(
            os.path.join(os.path.dirname(resume_pkl), "log.txt"))

    lpips_params = get_lpips_params(lpips_weights_path)

    mesh = make_data_mesh(num_devices)
    state = create_train_state(jax.random.key(seed), G, D)
    if resume_state_params is not None:
        state = state._replace(**resume_state_params)
        if resume_g_from_gs:
            print("Resume: initializing G from the Gs (EMA) weights")
            # deep-copy: g_params and gs_params are both donated train-step
            # arguments, so they must not alias the same device buffers
            # ("Attempt to donate the same buffer twice in Execute()")
            state = state._replace(
                g_params=jax.tree.map(lambda x: jnp.array(x, copy=True),
                                      state.gs_params))

    imle_restore = {}
    if resume_checkpoint is not None:
        # full-state resume: params + Adam moments + Gs EMA + pl_mean +
        # IMLE counters (unlike the reference's weight-only pkls,
        # SURVEY.md §5 'Checkpoint / resume')
        from .checkpoint import latest_checkpoint, load_checkpoint
        ckpt = resume_checkpoint
        if os.path.isdir(ckpt) and not os.path.basename(
                ckpt.rstrip("/")).startswith("step_"):
            ckpt = (latest_checkpoint(ckpt) or
                    latest_checkpoint(os.path.join(resume_checkpoint,
                                                   "checkpoints")))
        assert ckpt, f"no orbax checkpoint under {resume_checkpoint}"
        print(f'Restoring full training state from "{ckpt}"...')
        state, imle_restore = load_checkpoint(ckpt, state)
        # checkpoint dirs are named step_<cur_nimg>
        resume_kimg = int(os.path.basename(ckpt)[len("step_"):]) / 1000.0

    if resume_state_params is not None and resume_lrate_rampup_kimg > 0:
        print(f"Resume lr rampup: 0 -> base over {resume_lrate_rampup_kimg:g}"
              f" kimg past {resume_kimg:.1f} (fresh Adam moments)")

    from ..utils.network_util import print_layers
    print_layers({"mapping": state.g_params["mapping"],
                  "synthesis": state.g_params["synthesis"]}, "G")
    print_layers(state.d_params, "D")
    print(f"devices: {mesh.devices.size}")

    # ------------------------------------------------------------ IMLE
    image_dim = int(np.prod(training_set.shape))
    imle = IMLEOrchestrator(
        data_size=data_size, num_samples_factor=num_samples_factor,
        latent_size=G.mapping.latent_size, image_dim=image_dim,
        init_proj_dim=init_proj_dim, init_staleness=init_staleness,
        knn_perturb_factor=knn_perturb_factor, knn_backend=knn_backend,
        candidate_batch_size=candidate_batch_size,
        exclusive_retrieved_code=bool(exclusive_retrieved_code),
        dist_thres_percentile=dist_thres_percentile,
        attr_interesting=attr_interesting, attr_names=attr_names,
        drange_data=training_set.dynamic_range, drange_net=drange_net,
        projector_cache_dir=run_dir, seed=seed)
    if imle_restore:
        imle.cursor = int(imle_restore.get("cursor", imle.cursor))
        imle.staleness = int(imle_restore.get("staleness", imle.staleness))
    if resume_staleness is not None and resume_checkpoint is not None:
        print(f"IMLE staleness override on resume: {imle.staleness} -> "
              f"{resume_staleness}")
        imle.staleness = int(resume_staleness)

    # jitted eval-mode G for candidate generation / snapshots
    @jax.jit
    def g_sample(params, latents, rng):
        return G.apply(params, latents,
                       jnp.zeros((latents.shape[0], G.mapping.label_size)),
                       rng=rng, truncation_psi=None)

    # candidate features with the flatten(+projector) fused on device: only
    # proj_dim floats per candidate cross the device→host link
    projector_dev = (jnp.asarray(imle.projector, jnp.float32)
                     if imle.projector is not None else None)

    @jax.jit
    def g_sample_features(params, latents, rng):
        img = G.apply(params, latents,
                      jnp.zeros((latents.shape[0], G.mapping.label_size)),
                      rng=rng, truncation_psi=None)
        flat = img.astype(jnp.float32).reshape(img.shape[0], -1)
        if projector_dev is None:
            return flat
        return jnp.dot(flat, projector_dev, preferred_element_type=jnp.float32)

    _sample_key = [jax.random.key(seed + 7)]

    def _batched(fn, latents_np):
        n = latents_np.shape[0]
        bs = candidate_batch_size
        if n < bs:  # pad to the jitted shape
            pad = np.zeros((bs - n, latents_np.shape[1]), latents_np.dtype)
            latents_np = np.concatenate([latents_np, pad])
        _sample_key[0], k = jax.random.split(_sample_key[0])
        out = fn(state.g_params, jnp.asarray(latents_np), k)
        # return the (async) device array — the IMLE rebuild overlaps the
        # device→host fetch of batch i with the compute of batch i+1
        return out[:n]

    def generate_images(latents_np):
        return _batched(g_sample, latents_np)

    def generate_features(latents_np):
        return _batched(g_sample_features, latents_np)

    import functools

    @functools.partial(jax.jit, static_argnames=("psi",))
    def gs_sample(params, latents, labels, rng, psi):
        return G.apply(params, latents, labels, rng=rng, truncation_psi=psi)

    # ------------------------------------------------------------ train step
    # Gradient-accumulation rounds = minibatch_size / (minibatch_gpu ×
    # num_devices) (reference training_loop.py:221,349). The resolution is
    # fixed (no progressive growing in config-e/f) so this is static.
    sched0 = training_schedule(cur_nimg=int(resume_kimg * 1000),
                               resolution_log2=training_set.resolution_log2,
                               **sched_args)
    num_dev = mesh.devices.size
    per_dev = sched0.minibatch_size // num_dev
    grad_accum_rounds = max(per_dev // sched0.minibatch_gpu, 1)
    if grad_accum_rounds > 1:
        # reference training_loop.py:337
        assert sched0.minibatch_size % (sched0.minibatch_gpu * num_dev) == 0, \
            (sched0.minibatch_size, sched0.minibatch_gpu, num_dev)
        print(f"gradient accumulation: {grad_accum_rounds} rounds of "
              f"{sched0.minibatch_gpu}/device")

    cfg = TrainConfig(
        grad_accum_rounds=grad_accum_rounds,
        NN_rec_lpips_weight=G_loss_args.get("NN_rec_lpips_weight", 2.5),
        # One fused G forward + one LPIPS pass instead of four + six
        # (loss.py::g_main_loss batched=True): +24% reg-cadence throughput
        # on-chip under the FIR default (BENCH_NOTES r4) — the concatenated
        # batch (4*mb) fills MXU tiles the per-forward batch of 6 leaves
        # empty. Quality gate: matched-seed stacked-MNIST arm D (954 modes
        # / KL 0.696 vs arm A 938 / 0.738). The default lives ONLY on
        # TrainConfig.g_loss_batched; G_loss_args overrides when present.
        **({"g_loss_batched": G_loss_args["batched"]}
           if "batched" in G_loss_args else {}),
        lpips_norm=lpips_norm,
        gamma=D_loss_args.get("gamma", 10.0),
        G_reg_interval=G_reg_interval, D_reg_interval=D_reg_interval,
        adam_beta1=G_opt_args.get("beta1", 0.0),
        adam_beta2=G_opt_args.get("beta2", 0.99),
        adam_eps=G_opt_args.get("epsilon", 1e-8),
        mirror_augment=mirror_augment,
        drange_data=tuple(float(v) for v in training_set.dynamic_range),
        lazy_regularization=lazy_regularization,
        # match the LPIPS trunk dtype to the networks' activation dtype
        # (bf16 G/D + bf16 VGG is the measured TPU-native configuration)
        lpips_dtype=G_args.get("dtype"),
        invariant_rng=invariant_rng,
        # the loop threads state linearly (state = train_step(state, ...)),
        # so each phase may write params/moments in place of its input
        donate_state=True)
    train_step = make_train_step(G, D, lpips_params, mesh, cfg)

    grid_latents = np.random.default_rng().standard_normal(
        (int(np.prod(grid_size)), G.mapping.latent_size), dtype=np.float32)

    print(f"Training for {total_kimg} kimg...\n")
    cur_nimg = int(resume_kimg * 1000)
    cur_tick = -1
    tick_start_nimg = cur_nimg
    tick_start_time = time.time()
    # offset by the prior run's elapsed seconds so the printed `time`
    # column continues across resumes (reference training_loop.py:330)
    train_start_time = tick_start_time - resume_time
    running_mb_counter = 0
    base_key = jax.random.key(seed + 11)
    iters_done = 0

    def _assemble_batch(mb):
        """One iteration's host work: IMLE rec gather + real minibatch
        decode + uint8 H2D. Runs either inline or on the Prefetcher thread
        (sole consumer of both dataset iterators while the prefetcher is
        open; see data.dataset.Prefetcher)."""
        r1, l1, z1, r2, l2, z2 = imle.next_rec_batch(training_set_rec, mb)
        reals, labels = training_set.get_minibatch_np(mb * 2)
        return shard_batch(mesh, {
            "reals_rec_1": r1, "labels_rec_1": l1, "latents_rec_1": z1,
            "reals_rec_2": r2, "labels_rec_2": l2, "latents_rec_2": z2,
            "reals": reals, "labels": labels,
        })

    prefetcher = None
    prefetch_mb = None

    def _stop_prefetcher():
        nonlocal prefetcher
        if prefetcher is not None:
            prefetcher.close()
            prefetcher = None

    while cur_nimg < total_kimg * 1000:
        if ctx is not None and ctx.should_stop():
            break
        sched = training_schedule(cur_nimg=cur_nimg,
                                  resolution_log2=training_set.resolution_log2,
                                  **sched_args)
        if resume_state_params is not None and resume_lrate_rampup_kimg > 0:
            ramp = resume_rampup_scale(cur_nimg / 1000.0, resume_kimg,
                                       resume_lrate_rampup_kimg)
            sched.G_lrate *= ramp
            sched.D_lrate *= ramp
        mb = sched.minibatch_size
        assert data_size % (mb * 2) == 0, (data_size, mb)

        for _repeat in range(minibatch_repeats):
            run_G_reg = (lazy_regularization and
                         running_mb_counter % G_reg_interval == 0)
            run_D_reg = (lazy_regularization and
                         running_mb_counter % D_reg_interval == 0)

            if imle.needs_rebuild(cur_nimg, mb * 2):
                # join the worker first: rebuild mutates the IMLE pool the
                # assembly closure reads (queued stale-pool batches drop)
                _stop_prefetcher()
                t0 = time.time()
                imle.rebuild(generate_images, training_set_rec,
                             generate_features=generate_features)
                stats.report("Timing/dci_rebuild_sec", time.time() - t0)

            if prefetch_mb != mb:  # minibatch changed: closure is stale
                _stop_prefetcher()
                prefetch_mb = mb
            if prefetch_depth > 0 and prefetcher is None:
                prefetcher = Prefetcher(lambda m=mb: _assemble_batch(m),
                                        depth=prefetch_depth)
            batch = (prefetcher.get() if prefetcher is not None
                     else _assemble_batch(mb))
            base_key, step_key = jax.random.split(base_key)
            gs_beta = (0.5 ** (mb / (G_smoothing_kimg * 1000.0))
                       if G_smoothing_kimg > 0 else 0.0)
            if resume_state_params is not None \
                    and resume_lrate_rampup_kimg > 0 and G_smoothing_kimg > 0:
                # beta**ramp: frozen EMA at ramp 0, half-life stretched
                # 1/ramp× until the lr warmup completes
                gs_beta = gs_beta ** resume_rampup_scale(
                    cur_nimg / 1000.0, resume_kimg, resume_lrate_rampup_kimg)
            rec_w = None
            if rec_weight_final is not None:
                lo, hi = rec_weight_ramp_start_kimg, rec_weight_ramp_end_kimg
                t = 1.0 if hi <= lo else float(np.clip(
                    (cur_nimg / 1000.0 - lo) / (hi - lo), 0.0, 1.0))
                rec_w = (1.0 - t) * cfg.NN_rec_lpips_weight \
                    + t * rec_weight_final
            state, scalars = train_step(
                state, batch, step_key, _dev_scalar(sched.G_lrate),
                _dev_scalar(sched.D_lrate), _dev_scalar(gs_beta),
                do_g_reg=run_G_reg, do_d_reg=run_D_reg, rec_weight=rec_w)

            cur_nimg += mb
            running_mb_counter += 1
            iters_done += 1
            if enable_profiler and iters_done == 8:
                jax.profiler.start_trace(os.path.join(run_dir, "profile"))
            if enable_profiler and iters_done == 16:
                jax.profiler.stop_trace()
            if iters_done % 8 == 0 or iters_done <= 2:
                # ONE parallel device_get instead of len(scalars) serial
                # float() round-trips — through the relay each blocking
                # fetch costs a full RTT, which dominated the
                # production-vs-bench step-time gap (BENCH_NOTES r3)
                host_scalars = jax.device_get(scalars)
                stats.report_dict({k: float(v)
                                   for k, v in host_scalars.items()})
            if smoke_test_max_iters and iters_done >= smoke_test_max_iters:
                break
        if smoke_test_max_iters and iters_done >= smoke_test_max_iters:
            break

        # ------------------------------------------------------------ ticks
        done = cur_nimg >= total_kimg * 1000
        if cur_nimg >= tick_start_nimg + sched.tick_kimg * 1000 or done:
            cur_tick += 1
            tick_kimg = (cur_nimg - tick_start_nimg) / 1000.0
            tick_time = time.time() - tick_start_time
            total_time = time.time() - train_start_time
            print(f"tick {cur_tick:<5d} kimg {cur_nimg / 1000.0:<8.1f} "
                  f"lod 0.00 minibatch {mb:<4d} "
                  f"time {misc.format_time(total_time):<12s} "
                  f"sec/tick {tick_time:<7.1f} "
                  f"sec/kimg {tick_time / max(tick_kimg, 1e-8):<7.2f}")
            stats.report("Progress/G_lrate", sched.G_lrate)
            stats.report("Progress/D_lrate", sched.D_lrate)
            stats.report("Timing/sec_per_tick", tick_time)
            stats.report("Timing/sec_per_kimg", tick_time / max(tick_kimg, 1e-8))
            # device memory telemetry (reference peak-GPU-mem autosummary,
            # training_loop.py:301-305,503); memory_stats() is backend-
            # dependent — absent on CPU and some relay clients
            try:
                ms = jax.local_devices()[0].memory_stats() or {}
                peak = ms.get("peak_bytes_in_use", ms.get("bytes_in_use"))
                if peak is not None:
                    stats.report("Resources/peak_device_mem_gb",
                                 peak / 2.0 ** 30)
            except Exception:
                pass
            events.add_scalars(stats.flush(step=cur_nimg), step=cur_nimg)
            events.flush()
            tick_start_nimg = cur_nimg
            tick_start_time = time.time()
            if ctx is not None:
                ctx.update(cur_epoch=cur_nimg / 1000.0, max_epoch=total_kimg)

            if cur_tick % image_snapshot_ticks == 0 or done:
                _save_image_snapshots(G, state, gs_sample, grid_latents,
                                      grid_size, imle, run_dir, cur_nimg,
                                      training_set, drange_net, base_key)
            if cur_tick % network_snapshot_ticks == 0 or done:
                path = os.path.join(run_dir,
                                    f"network-snapshot-{cur_nimg // 1000:06d}.pkl")
                misc.save_pkl(snapshot_dict(G, D, state), path)
                if save_full_checkpoints:
                    from .checkpoint import save_checkpoint
                    save_checkpoint(
                        os.path.join(run_dir, "checkpoints"), state,
                        imle_state={"cursor": int(imle.cursor),
                                    "staleness": int(imle.staleness)},
                        step=cur_nimg)
                _run_metrics(metric_arg_list, path, dataset_args, data_dir,
                             run_dir, mesh, mirror_augment)

    _stop_prefetcher()
    misc.save_pkl(snapshot_dict(G, D, state),
                  os.path.join(run_dir, "network-final.pkl"))
    events.add_scalars(stats.flush(step=cur_nimg), step=cur_nimg)
    events.close()
    stats.close()
    if ctx is not None:
        ctx.close()
    return state


def _save_image_snapshots(G, state, gs_sample, grid_latents, grid_size, imle,
                          run_dir, cur_nimg, training_set, drange_net,
                          base_key):
    bs = 64
    outs = []
    for i in range(0, grid_latents.shape[0], bs):
        z = grid_latents[i:i + bs]
        pad = bs - z.shape[0]
        if pad:
            z = np.concatenate([z, np.zeros((pad, z.shape[1]), z.dtype)])
        img = gs_sample(state.gs_params, jnp.asarray(z),
                        jnp.zeros((bs, G.mapping.label_size)),
                        jax.random.fold_in(base_key, i), 0.6)
        outs.append(np.asarray(img)[:bs - pad if pad else bs])
    fakes = np.concatenate(outs)[:grid_latents.shape[0]]
    misc.save_image_grid(fakes,
                         os.path.join(run_dir, f"arb-fakes-{cur_nimg // 1000:06d}.png"),
                         drange=drange_net, grid_size=grid_size)
    if imle.tick_rec_batch is not None:
        reals, labels, latents = imle.tick_rec_batch
        misc.save_image_grid(
            misc.adjust_dynamic_range(reals.astype(np.float32),
                                      training_set.dynamic_range, drange_net),
            os.path.join(run_dir, "rec-reals.png"), drange=drange_net)
        n = latents.shape[0]
        z = jnp.asarray(latents)
        img = gs_sample(state.gs_params, z, jnp.zeros((n, G.mapping.label_size)),
                        jax.random.fold_in(base_key, 1), 1.0)
        misc.save_image_grid(np.asarray(img),
                             os.path.join(run_dir, f"rec-fakes-{cur_nimg // 1000:06d}.png"),
                             drange=drange_net)


def _run_metrics(metric_arg_list, snapshot_path, dataset_args, data_dir,
                 run_dir, mesh, mirror_augment=False):
    if not metric_arg_list:
        return
    from ..metrics import metric_base
    for args in metric_arg_list:
        try:
            metric_base.run_metric(args, network_pkl=snapshot_path,
                                   dataset_args=dataset_args,
                                   data_dir=data_dir, run_dir=run_dir,
                                   mirror_augment=mirror_augment,
                                   num_devices=mesh.devices.size)
        except Exception as e:  # metrics must not kill training
            print(f"metric {args.get('name', '?')} failed: {e}")
