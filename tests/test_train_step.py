"""End-to-end train-step tests on the virtual 8-device CPU mesh: the fused
G/G-reg/D/D-reg/Gs step compiles under shard_map, updates parameters, keeps
losses finite, and threads EMA state (SURVEY.md §7 item 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inclusivegan_tpu.models import GMain, Discriminator
from inclusivegan_tpu.models.lpips import init_lpips_params
from inclusivegan_tpu.parallel import make_data_mesh
from inclusivegan_tpu.training.train_state import create_train_state, g_trainables
from inclusivegan_tpu.training.train_step import TrainConfig, make_train_step

RES = 16
ZDIM = 32
MB = 16  # global; 2 per device


@pytest.fixture(scope="module")
def setup():
    G = GMain.create(resolution=RES, num_channels=3, latent_size=ZDIM,
                     dlatent_size=ZDIM, fmap_base=256, fmap_max=32,
                     mapping_layers=2, mapping_fmaps=32)
    D = Discriminator(resolution=RES, num_channels=3, fmap_base=256,
                      fmap_max=32, mbstd_group_size=2)
    lpips_params = init_lpips_params(seed=7)
    mesh = make_data_mesh()
    state = create_train_state(jax.random.key(0), G, D)
    cfg = TrainConfig(mirror_augment=True)
    step = make_train_step(G, D, lpips_params, mesh, cfg)
    return G, D, mesh, state, step


def _batch(seed=0):
    r = np.random.RandomState(seed)
    return {
        "reals_rec_1": r.randint(0, 256, (MB, 3, RES, RES)).astype(np.uint8),
        "latents_rec_1": r.randn(MB, ZDIM).astype(np.float32),
        "labels_rec_1": np.zeros((MB, 0), np.float32),
        "reals_rec_2": r.randint(0, 256, (MB, 3, RES, RES)).astype(np.uint8),
        "latents_rec_2": r.randn(MB, ZDIM).astype(np.float32),
        "labels_rec_2": np.zeros((MB, 0), np.float32),
        "reals": r.randint(0, 256, (2 * MB, 3, RES, RES)).astype(np.uint8),
        "labels": np.zeros((2 * MB, 0), np.float32),
    }


def test_train_step_runs_and_updates(setup):
    G, D, mesh, state, step = setup
    batch = _batch()
    new_state, scalars = step(state, batch, jax.random.key(1),
                              jnp.float32(0.002), jnp.float32(0.002),
                              jnp.float32(0.99),
                              do_g_reg=True, do_d_reg=True)
    assert int(new_state.step) == 1
    for name in ["Loss/G_total", "Loss/D_total", "Loss/loss_NN_rec_lpips",
                 "Loss/loss_NN_interp_lpips", "Loss/loss_G_arb",
                 "Loss/pl_penalty", "Loss/gradient_penalty_D"]:
        assert name in scalars, name
        assert np.isfinite(float(scalars[name])), name

    # params actually moved
    old_w = state.g_params["synthesis"]["4x4"]["Conv"]["weight"]
    new_w = new_state.g_params["synthesis"]["4x4"]["Conv"]["weight"]
    assert float(jnp.abs(new_w - old_w).max()) > 0
    old_d = state.d_params["4x4"]["Conv"]["weight"]
    new_d = new_state.d_params["4x4"]["Conv"]["weight"]
    assert float(jnp.abs(new_d - old_d).max()) > 0

    # Gs moved toward G, dlatent_avg and pl_mean updated
    assert float(jnp.abs(new_state.gs_params["synthesis"]["4x4"]["Conv"]["weight"]
                         - old_w).max()) > 0
    assert float(jnp.abs(new_state.g_params["dlatent_avg"]).max()) > 0
    assert float(new_state.pl_mean) != 0.0


def test_train_step_no_reg_variant(setup):
    G, D, mesh, state, step = setup
    new_state, scalars = step(state, _batch(1), jax.random.key(2),
                              jnp.float32(0.002), jnp.float32(0.002),
                              jnp.float32(0.99),
                              do_g_reg=False, do_d_reg=False)
    assert "Loss/pl_penalty" not in scalars
    assert "Loss/gradient_penalty_D" not in scalars
    assert float(new_state.pl_mean) == float(state.pl_mean)


def test_two_steps_progress_and_finite(setup):
    G, D, mesh, state, step = setup
    s = state
    for i in range(2):
        s, scalars = step(s, _batch(i), jax.random.key(i),
                          jnp.float32(0.002), jnp.float32(0.002),
                          jnp.float32(0.99), do_g_reg=(i % 2 == 0),
                          do_d_reg=False)
        assert np.isfinite(float(scalars["Loss/G_total"]))
    assert int(s.step) == 2


def test_unbatched_g_loss_variant(setup):
    """g_loss_batched=False — the reference-structured four-forward G phase
    (loss.py:119-146). Batched=True became the default after the round-4
    on-chip A/B (+24%) and the matched-seed quality arm (BENCH_NOTES r4),
    so every other step test now exercises the fused variant; this one
    keeps the reference-structured path covered."""
    from inclusivegan_tpu.models.lpips import init_lpips_params
    G, D, mesh, state, _ = setup
    cfg = TrainConfig(mirror_augment=False, g_loss_batched=False)
    step = make_train_step(G, D, init_lpips_params(seed=7), mesh, cfg)
    new_state, scalars = step(state, _batch(9), jax.random.key(9),
                              jnp.float32(0.002), jnp.float32(0.002),
                              jnp.float32(0.99),
                              do_g_reg=False, do_d_reg=False)
    for name in ("Loss/G_total", "Loss/loss_NN_rec_lpips",
                 "Loss/loss_NN_interp_lpips", "Loss/loss_G_arb"):
        assert np.isfinite(float(scalars[name])), name
    old_w = state.g_params["synthesis"]["4x4"]["Conv"]["weight"]
    new_w = new_state.g_params["synthesis"]["4x4"]["Conv"]["weight"]
    assert float(jnp.abs(new_w - old_w).max()) > 0


def test_donate_state_invalidates_input_and_computes(setup):
    """VERDICT r3 weak #7: ``donate_state=True`` is the production/bench
    default (training_loop.py) — XLA writes each phase's updated params in
    place of the input buffers. A refactor that re-reads state after handing
    it to a phase must fail HERE at the unit level, not as a crash deep in
    the e2e loop. Asserts (a) two linearly-threaded phase calls compute
    finite scalars, (b) the donated input buffers are actually invalidated,
    (c) reusing a donated state raises."""
    from inclusivegan_tpu.models.lpips import init_pixel_fallback_params
    G, D, mesh, _state, _step = setup
    step = make_train_step(G, D, init_pixel_fallback_params(), mesh,
                           TrainConfig(mirror_augment=True,
                                       donate_state=True))
    state0 = create_train_state(jax.random.key(5), G, D)
    batch = _batch(3)
    from inclusivegan_tpu.parallel import shard_batch
    b = shard_batch(mesh, batch)
    bg = {k: b[k] for k in ("reals_rec_1", "labels_rec_1", "latents_rec_1",
                            "reals_rec_2", "labels_rec_2", "latents_rec_2")}
    bd = {"reals": b["reals"], "labels": b["labels"]}
    key, lr = jax.random.key(2), jnp.float32(0.002)

    s1, sc1 = step.phases["g_step"](state0, bg, key, lr, jnp.float32(2.5))
    s2, sc2 = step.phases["d_step"](s1, bd, key, lr, jnp.float32(0.99))
    jax.block_until_ready(s2)
    assert np.isfinite(float(sc1["Loss/G_total"]))
    assert np.isfinite(float(sc2["Loss/D_total"]))

    # the donated inputs are gone: the original state entirely; for the
    # intermediate state ANY deleted leaf proves d_step donated too (XLA
    # keeps donated buffers it merely passes through, e.g. g_params)
    assert all(x.is_deleted() for x in jax.tree.leaves(state0)
               if isinstance(x, jax.Array))
    assert any(x.is_deleted() for x in jax.tree.leaves(s1)
               if isinstance(x, jax.Array))
    # and accidental reuse surfaces as an immediate error, not silence
    with pytest.raises((RuntimeError, ValueError)):
        jax.block_until_ready(
            step.phases["g_step"](state0, bg, key, lr, jnp.float32(2.5)))


def test_adam_nan_skip():
    from inclusivegan_tpu.training.optimizer import adam_apply, init_adam
    params = {"w": jnp.ones((4,))}
    st = init_adam(params)
    bad = {"w": jnp.full((4,), jnp.nan)}
    p2, st2, ok = adam_apply(params, bad, st, learning_rate=0.1)
    assert not bool(ok)
    np.testing.assert_array_equal(np.asarray(p2["w"]), np.ones(4))
    assert int(st2.count) == 0
    good = {"w": jnp.ones((4,))}
    p3, st3, ok = adam_apply(params, good, st, learning_rate=0.1)
    assert bool(ok) and int(st3.count) == 1
    assert float(jnp.abs(p3["w"] - params["w"]).max()) > 0


def test_grad_accumulation_runs(setup):
    """grad_accum_rounds=2 (reference minibatch_multiplier machinery,
    optimizer.py:208-234): lax.scan microbatching compiles under shard_map,
    produces finite losses, moves params, and threads pl_mean through the
    rounds."""
    from inclusivegan_tpu.models.lpips import init_lpips_params
    G, D, mesh, state, _ = setup
    cfg = TrainConfig(mirror_augment=False, grad_accum_rounds=2)
    step = make_train_step(G, D, init_lpips_params(seed=7), mesh, cfg)
    new_state, scalars = step(state, _batch(3), jax.random.key(3),
                              jnp.float32(0.002), jnp.float32(0.002),
                              jnp.float32(0.99),
                              do_g_reg=True, do_d_reg=True)
    for name in ("Loss/G_total", "Loss/D_total", "Loss/pl_penalty",
                 "Loss/gradient_penalty_D"):
        assert np.isfinite(float(scalars[name])), name
    old_w = state.g_params["synthesis"]["4x4"]["Conv"]["weight"]
    assert float(jnp.abs(new_state.g_params["synthesis"]["4x4"]["Conv"]["weight"]
                         - old_w).max()) > 0
    assert float(new_state.pl_mean) != 0.0
    assert float(jnp.abs(new_state.g_params["dlatent_avg"]).max()) > 0


def test_grad_accumulation_r1_matches_full_batch():
    """With mbstd disabled, the R1 phase is deterministic and per-sample
    independent, so scan-accumulated microbatch grads == full-batch grads:
    the D-reg update must match between rounds=1 and rounds=2 to fp
    tolerance. (With mbstd on, groups are strided over the batch — reference
    networks_stylegan2.py:132-144 — so the split legitimately changes the
    stats; that path is covered by test_grad_accumulation_runs.)"""
    from inclusivegan_tpu.models.lpips import init_lpips_params
    from inclusivegan_tpu.training.train_state import create_train_state
    from inclusivegan_tpu.parallel import make_data_mesh
    G = GMain.create(resolution=RES, num_channels=3, latent_size=ZDIM,
                     dlatent_size=ZDIM, fmap_base=256, fmap_max=32,
                     mapping_layers=2, mapping_fmaps=32)
    D = Discriminator(resolution=RES, num_channels=3, fmap_base=256,
                      fmap_max=32, mbstd_group_size=1)
    mesh = make_data_mesh()
    state = create_train_state(jax.random.key(0), G, D)
    lpips = init_lpips_params(seed=7)
    step1 = make_train_step(G, D, lpips, mesh,
                            TrainConfig(grad_accum_rounds=1))
    step2 = make_train_step(G, D, lpips, mesh,
                            TrainConfig(grad_accum_rounds=2))
    batch = _batch(5)
    batch_d = {"reals": batch["reals"], "labels": batch["labels"]}
    rng = jax.random.key(5)
    s1, _ = step1.phases["d_reg_step"](state, batch_d, rng, jnp.float32(0.002),
                                       jnp.float32(10.0))
    s2, _ = step2.phases["d_reg_step"](state, batch_d, rng, jnp.float32(0.002),
                                       jnp.float32(10.0))
    w1 = np.asarray(s1.d_params["4x4"]["Conv"]["weight"])
    w2 = np.asarray(s2.d_params["4x4"]["Conv"]["weight"])
    assert float(np.abs(w1 - np.asarray(state.d_params["4x4"]["Conv"]["weight"])).max()) > 0
    np.testing.assert_allclose(w1, w2, rtol=2e-4, atol=2e-6)


def test_invariant_rng_sharding_semantics():
    """TrainConfig.invariant_rng: the SAME global batch + step key compute
    the same thing on a 1-device and an 8-device data mesh — per-example
    draws are keyed by global example index, batch-scalar draws by the
    replicated phase key, and mbstd uses contiguous (shard-aligned)
    grouping.

    Two levels of claim:
      1. Phase-level (tight): every phase evaluated from the same state
         yields identical scalars — including the second-order
         gradient_penalty_D and pl_penalty — up to float reduction order.
      2. Full-step trajectory (bounded): after all four sequential phases,
         scalars agree to ~1% and every updated parameter is within the
         Adam first-step bound. Exact equality is impossible through Adam
         with beta1=0: the first update is lr*g/(|g|+eps) ≈ lr*sign(g), so
         reduction-order noise on near-zero gradients flips single-param
         updates by ±lr — an optimizer discontinuity, not a sharding
         semantics difference (the phase-level check above is the
         semantics)."""
    G = GMain.create(resolution=RES, num_channels=3, latent_size=ZDIM,
                     dlatent_size=ZDIM, fmap_base=256, fmap_max=32,
                     mapping_layers=2, mapping_fmaps=32)
    D = Discriminator(resolution=RES, num_channels=3, fmap_base=256,
                      fmap_max=32, mbstd_group_size=2, mbstd_contiguous=True)
    lp = init_lpips_params(seed=7)
    state0 = create_train_state(jax.random.key(0), G, D)
    batch = _batch(3)
    cfg = TrainConfig(mirror_augment=True, invariant_rng=True)
    lr = jnp.float32(0.002)
    key = jax.random.key(5)

    phase_scalars = {}
    full = {}
    for n_dev in (1, 8):
        mesh = make_data_mesh(n_dev)
        from inclusivegan_tpu.parallel import shard_batch
        b = shard_batch(mesh, batch)
        step = make_train_step(G, D, lp, mesh, cfg)
        bg = {k: b[k] for k in ("reals_rec_1", "labels_rec_1",
                                "latents_rec_1", "reals_rec_2",
                                "labels_rec_2", "latents_rec_2")}
        bd = {"reals": b["reals"], "labels": b["labels"]}
        ph = step.phases
        sc = {}
        _, s = ph["g_step"](state0, bg, key, lr, jnp.float32(2.5))
        sc.update(s)
        _, s = ph["g_reg_step"](state0, key, lr, MB // n_dev)
        sc.update(s)
        _, s = ph["d_step"](state0, bd, key, lr, jnp.float32(0.99))
        sc.update(s)
        _, s = ph["d_reg_step"](state0, bd, key, lr, jnp.float32(10.0))
        sc.update(s)
        phase_scalars[n_dev] = jax.device_get(sc)

        st, scalars = step(state0, b, key, lr, lr, jnp.float32(0.99),
                           do_g_reg=True, do_d_reg=True)
        full[n_dev] = (jax.device_get(st), jax.device_get(scalars))

    # 1. phase-level: tight (pure reduction-order tolerance)
    sc1, sc8 = phase_scalars[1], phase_scalars[8]
    assert set(sc1) == set(sc8) and len(sc1) >= 10
    for name in sorted(sc1):
        np.testing.assert_allclose(sc1[name], sc8[name], rtol=2e-4,
                                   atol=2e-5, err_msg=name)

    # 2. full-step trajectory: bounded by the Adam discontinuity
    (s1, f1), (s8, f8) = full[1], full[8]
    for name in sorted(f1):
        np.testing.assert_allclose(f1[name], f8[name], rtol=1.5e-2,
                                   atol=1e-3, err_msg=name)
    lookup8 = {jax.tree_util.keystr(k): v
               for k, v in jax.tree_util.tree_leaves_with_path(s8.g_params)}
    # lazy-reg folding scales the G lr by 1/interval cadence factors; 3*lr
    # comfortably bounds two phase updates of ±lr(*lr_mul) each
    bound = 3 * float(lr)
    diffs = []
    for k, v in jax.tree_util.tree_leaves_with_path(s1.g_params):
        d = np.abs(v - lookup8[jax.tree_util.keystr(k)])
        assert d.max() <= bound, (jax.tree_util.keystr(k), d.max())
        diffs.append(d.ravel())
    # ...and the flips are rare: the typical parameter agrees to <1e-5
    assert np.median(np.concatenate(diffs)) < 1e-5
    np.testing.assert_allclose(s1.pl_mean, s8.pl_mean, rtol=1e-3)


def test_device_folded_rng_differs_across_mesh_sizes():
    """Sanity contrast: the default device-folded RNG (reference-style
    independent per-device draws) does NOT reproduce across mesh sizes —
    the invariance above is a property of invariant_rng, not a tautology."""
    G = GMain.create(resolution=RES, num_channels=3, latent_size=ZDIM,
                     dlatent_size=ZDIM, fmap_base=256, fmap_max=32,
                     mapping_layers=2, mapping_fmaps=32)
    D = Discriminator(resolution=RES, num_channels=3, fmap_base=256,
                      fmap_max=32, mbstd_group_size=2)
    lp = init_lpips_params(seed=7)
    state0 = create_train_state(jax.random.key(0), G, D)
    batch = _batch(3)
    cfg = TrainConfig(mirror_augment=True)

    vals = []
    for n_dev in (1, 8):
        mesh = make_data_mesh(n_dev)
        step = make_train_step(G, D, lp, mesh, cfg)
        _, scalars = step(state0, batch, jax.random.key(5),
                          jnp.float32(0.002), jnp.float32(0.002),
                          jnp.float32(0.99), do_g_reg=False, do_d_reg=False)
        vals.append(float(scalars["Loss/G_total"]))
    assert abs(vals[0] - vals[1]) > 1e-6


def test_batched_g_loss_matches_unbatched_per_sample(setup):
    """VERDICT r4 item 3: the fused G phase's "per-sample semantics
    unchanged" claim (loss.py::g_main_loss batched=True), tested at the
    unit level rather than distributionally.

    With ``example_keys`` supplied, every per-example draw routes through
    fold_in(example_key, salt) identically in both variants — interp t
    (_EK_T), the style-mixing latents2 (_EK_MIX via the per-forward
    _EK_FWD_BASE+fid parents), and the per-layer synthesis noise — and the
    batch-scalar mixing decision/cutoff come from the same per-group key
    split (k1..k4) in both, so the two variants must agree per sample to
    float tolerance, not just in distribution. Without example_keys they
    genuinely differ (unbatched draws synthesis noise from each forward's
    own key, batched from one k_noise), which is why the adoption gate in
    round 4 had to be distributional; this pins the aligned case exactly.
    Reference anchor: the four forwards being fused,
    /root/reference/training/loss.py:25-48."""
    from inclusivegan_tpu.training.loss import g_main_loss

    G, D, mesh, state, _ = setup
    r = np.random.RandomState(42)
    kwargs = dict(
        G=G, D=D, lpips_params=init_lpips_params(seed=7),
        rng=jax.random.key(11),
        latents_rec_1=jnp.asarray(r.randn(MB, ZDIM), jnp.float32),
        reals_rec_1=jnp.asarray(r.uniform(-1, 1, (MB, 3, RES, RES)),
                                jnp.float32),
        labels_rec_1=jnp.zeros((MB, 0), jnp.float32),
        latents_rec_2=jnp.asarray(r.randn(MB, ZDIM), jnp.float32),
        reals_rec_2=jnp.asarray(r.uniform(-1, 1, (MB, 3, RES, RES)),
                                jnp.float32),
        labels_rec_2=jnp.zeros((MB, 0), jnp.float32),
        arb_latents=jnp.asarray(r.randn(MB, ZDIM), jnp.float32),
        arb_labels=jnp.zeros((MB, 0), jnp.float32),
        example_keys=jax.vmap(
            lambda i: jax.random.fold_in(jax.random.key(77), i)
        )(jnp.arange(MB)),
    )
    un = g_main_loss(state.g_params, state.d_params, batched=False, **kwargs)
    ba = g_main_loss(state.g_params, state.d_params, batched=True, **kwargs)

    assert un.loss.shape == ba.loss.shape == (MB,)
    np.testing.assert_allclose(np.asarray(ba.loss), np.asarray(un.loss),
                               rtol=2e-5, atol=2e-6)
    for name in un.scalars:
        np.testing.assert_allclose(float(ba.scalars[name]),
                                   float(un.scalars[name]),
                                   rtol=2e-5, atol=2e-6, err_msg=name)
    assert len(un.dlatent_batch_avgs) == len(ba.dlatent_batch_avgs) == 4
    for a, b in zip(un.dlatent_batch_avgs, ba.dlatent_batch_avgs):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-6)
