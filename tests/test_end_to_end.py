"""Golden end-to-end smoke run at tiny resolution (SURVEY.md §4 item 5):
dataset creation → full training loop with the IMLE/DCI path → run-dir
artifacts → snapshot reload → generation → metric machinery → projector."""

import glob
import os
import pickle

import numpy as np
import pytest

from inclusivegan_tpu.data.dataset_tool import TFRecordExporter
from inclusivegan_tpu.utils.easydict import EasyDict

RES = 16
DATA_SIZE = 64
MB = 8  # global minibatch


@pytest.fixture(scope="module")
def toy_dataset(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("data") / "toy")
    r = np.random.RandomState(0)
    images = r.randint(0, 256, (DATA_SIZE, 3, RES, RES)).astype(np.uint8)
    labels = np.zeros((DATA_SIZE, 4), np.float32)
    labels[np.arange(DATA_SIZE), r.randint(4, size=DATA_SIZE)] = 1.0
    with TFRecordExporter(d, DATA_SIZE, print_progress=False) as tfr:
        for img in images:
            tfr.add_image(img)
        tfr.add_labels(labels)
    return d


@pytest.fixture(scope="module")
def trained_run(toy_dataset, tmp_path_factory):
    """Run the full training loop for a handful of iterations."""
    from inclusivegan_tpu.training.training_loop import training_loop
    from inclusivegan_tpu.utils.run_harness import SubmitConfig, submit_run

    result_root = str(tmp_path_factory.mktemp("results"))
    sc = SubmitConfig(run_dir_root=result_root, run_desc="smoke")
    state = submit_run(
        sc, "inclusivegan_tpu.training.training_loop.training_loop",
        G_args=dict(fmap_base=256, fmap_max=32, latent_size=32,
                    dlatent_size=32, mapping_layers=2, mapping_fmaps=32),
        D_args=dict(fmap_base=256, fmap_max=32, mbstd_group_size=2),
        G_loss_args=dict(NN_rec_lpips_weight=2.5),
        D_loss_args=dict(gamma=10.0),
        dataset_args=dict(tfrecord_dir=os.path.basename(toy_dataset),
                          max_label_size="full"),
        sched_args=dict(minibatch_size_base=MB, minibatch_gpu_base=MB // 8,
                        tick_kimg_base=0.001),
        data_dir=os.path.dirname(toy_dataset),
        total_kimg=1,
        data_size=DATA_SIZE, num_epochs=1, num_samples_factor=2,
        init_staleness=10, candidate_batch_size=32,
        knn_perturb_factor=0.05, init_proj_dim=16,
        metric_arg_list=[], minibatch_repeats=2,
        smoke_test_max_iters=3, seed=5)
    run_dir = glob.glob(os.path.join(result_root, "00000-smoke"))[0]
    return run_dir, state


def test_run_dir_artifacts(trained_run):
    run_dir, _ = trained_run
    names = set(os.listdir(run_dir))
    for expected in ["log.txt", "run.txt", "submit_config.pkl",
                     "submit_config.txt", "arb-reals.png", "_finished.txt",
                     "network-final.pkl", "stats.jsonl"]:
        assert expected in names, (expected, names)


def test_training_made_progress(trained_run):
    _, state = trained_run
    assert int(state.step) == 3
    assert float(np.abs(np.asarray(state.g_params["dlatent_avg"])).max()) > 0


def test_snapshot_roundtrip_and_generation(trained_run):
    import jax
    import jax.numpy as jnp
    from inclusivegan_tpu.training.training_loop import load_snapshot
    run_dir, _ = trained_run
    G, D, params = load_snapshot(os.path.join(run_dir, "network-final.pkl"))
    z = np.random.RandomState(0).randn(4, 32).astype(np.float32)
    img = G.apply(params["gs_params"], jnp.asarray(z),
                  jnp.zeros((4, G.mapping.label_size)),
                  rng=jax.random.key(0), truncation_psi=0.7)
    assert img.shape == (4, 3, RES, RES)
    assert np.isfinite(np.asarray(img)).all()
    scores, feats = D.apply(params["d_params"], img)
    assert scores.shape == (4,)


def test_metrics_machinery_on_snapshot(trained_run, toy_dataset):
    from inclusivegan_tpu.metrics import metric_base
    run_dir, _ = trained_run
    snapshot = os.path.join(run_dir, "network-final.pkl")
    dataset_args = dict(tfrecord_dir=os.path.basename(toy_dataset),
                        max_label_size="full")
    res = metric_base.run_metric(
        EasyDict(name="fid_small",
                 func_name="inclusivegan_tpu.metrics.frechet_inception_distance.FID",
                 num_images=32, minibatch_per_gpu=16,
                 feature_net="vgg16"),  # inception path covered by test_inception
        network_pkl=snapshot, dataset_args=dataset_args,
        data_dir=os.path.dirname(toy_dataset), run_dir=run_dir)
    assert np.isfinite(res["fid_small"])
    assert os.path.exists(os.path.join(run_dir, "metric-fid_small.txt"))

    res = metric_base.run_metric(
        EasyDict(name="pr_small",
                 func_name="inclusivegan_tpu.metrics.precision_recall.PR",
                 num_images=32, nhood_size=3, minibatch_per_gpu=16),
        network_pkl=snapshot, dataset_args=dataset_args,
        data_dir=os.path.dirname(toy_dataset), run_dir=run_dir)
    assert 0.0 <= res["pr_small_precision"] <= 1.0

    res = metric_base.run_metric(
        EasyDict(name="ppl_small",
                 func_name="inclusivegan_tpu.metrics.perceptual_path_length.PPL",
                 num_samples=8, epsilon=1e-4, space="w", sampling="full",
                 minibatch_per_gpu=4),
        network_pkl=snapshot, dataset_args=dataset_args,
        data_dir=os.path.dirname(toy_dataset), run_dir=run_dir)
    assert np.isfinite(res["ppl_small"])


def test_projector_reduces_distance(trained_run):
    import jax.numpy as jnp
    from inclusivegan_tpu.projector import Projector
    from inclusivegan_tpu.training.training_loop import load_snapshot
    run_dir, _ = trained_run
    G, _D, params = load_snapshot(os.path.join(run_dir, "network-final.pkl"))
    proj = Projector(num_steps=30)
    proj.set_network(G, params["gs_params"], minibatch_size=2, num_steps=30)
    # project images G can actually produce: its own samples
    z_true = np.random.RandomState(3).randn(2, 32).astype(np.float32)
    targets = np.asarray(G.apply(params["gs_params"], jnp.asarray(z_true),
                                 jnp.zeros((2, G.mapping.label_size)),
                                 truncation_psi=1.0, randomize_noise=False))
    proj.start(targets)
    d0 = proj.get_dist().mean()
    while proj.get_cur_step() < proj.num_steps:
        proj.step()
    d1 = proj.get_dist().mean()
    assert np.isfinite(d1)
    assert d1 < d0  # optimizing its own samples must reduce the distance


def test_gs_sampler_sharded_matches_single_device(trained_run):
    """num_devices>1 GsSampler (the TPU equivalent of Network.run's per-GPU
    replication, reference network.py:403-428) is value-identical to the
    single-device path: params replicated, latents sharded, same rng."""
    from inclusivegan_tpu.metrics.metric_base import GsSampler
    run_dir, _ = trained_run
    pkl = os.path.join(run_dir, "network-final.pkl")
    s1 = GsSampler(pkl, minibatch_size=8, seed=3)
    s8 = GsSampler(pkl, minibatch_size=8, seed=3, num_devices=8)
    assert s8.minibatch == 8
    z = np.random.RandomState(1).randn(12, s1.latent_size).astype(np.float32)
    a = s1.run(z)
    b = s8.run(z)
    assert a.shape == b.shape == (12, s1.num_channels, RES, RES)
    assert a.dtype == b.dtype == np.uint8
    # uint8-quantized on device; allow rint boundary flips of one count
    # from SPMD partitioning numerics
    assert np.abs(a.astype(np.int16) - b.astype(np.int16)).max() <= 1


def test_gs_sampler_random_images_chunking(trained_run):
    """random_images draws one contiguous seeded latent stream and
    generates in fixed minibatch-sized jitted batches regardless of chunk
    partitioning, so the concatenated yield equals a direct run() of the
    same stream."""
    from inclusivegan_tpu.metrics.metric_base import GsSampler
    run_dir, _ = trained_run
    pkl = os.path.join(run_dir, "network-final.pkl")
    n = 20
    s = GsSampler(pkl, minibatch_size=8, seed=3)
    got = np.concatenate(list(s.random_images(n, seed=5)))
    s2 = GsSampler(pkl, minibatch_size=8, seed=3)
    want = s2.run(np.random.Generator(np.random.PCG64(5))
                  .standard_normal((n, s2.latent_size), dtype=np.float32))
    np.testing.assert_array_equal(got, want)


def test_resume_from_snapshot(trained_run, toy_dataset, tmp_path_factory):
    """--resume-pkl path: reload the (G, D, Gs) snapshot triple and recover
    kimg from the previous run's log.txt (reference training_loop.py:191-194
    + misc.resume_kimg_time)."""
    import jax.numpy as jnp
    from inclusivegan_tpu.training.training_loop import load_snapshot
    from inclusivegan_tpu.utils.run_harness import SubmitConfig, submit_run

    run_dir, _ = trained_run
    pkl = os.path.join(run_dir, "network-final.pkl")
    _G, _D, snap_params = load_snapshot(pkl)
    snap_w = np.asarray(snap_params["g_params"]["synthesis"]["4x4"]["Conv"]["weight"])

    result_root = str(tmp_path_factory.mktemp("resume_results"))
    sc = SubmitConfig(run_dir_root=result_root, run_desc="resume")
    state = submit_run(
        sc, "inclusivegan_tpu.training.training_loop.training_loop",
        G_args=dict(fmap_base=256, fmap_max=32, latent_size=32,
                    dlatent_size=32, mapping_layers=2, mapping_fmaps=32),
        D_args=dict(fmap_base=256, fmap_max=32, mbstd_group_size=2),
        G_loss_args=dict(NN_rec_lpips_weight=2.5),
        D_loss_args=dict(gamma=10.0),
        dataset_args=dict(tfrecord_dir=os.path.basename(toy_dataset),
                          max_label_size="full"),
        sched_args=dict(minibatch_size_base=MB, minibatch_gpu_base=MB // 8,
                        tick_kimg_base=0.001),
        data_dir=os.path.dirname(toy_dataset),
        total_kimg=1, data_size=DATA_SIZE, num_epochs=1,
        num_samples_factor=2, init_staleness=10, candidate_batch_size=32,
        knn_perturb_factor=0.05, init_proj_dim=16, metric_arg_list=[],
        minibatch_repeats=2, smoke_test_max_iters=2, seed=99,
        resume_pkl=pkl, save_full_checkpoints=False)

    new_run_dir = os.path.join(result_root, "00000-resume")
    log = open(os.path.join(new_run_dir, "log.txt")).read()
    assert "Loading networks from" in log
    # resumed weights start from the snapshot (2 tiny Adam steps away),
    # not from a fresh seed-99 init
    w = np.asarray(state.g_params["synthesis"]["4x4"]["Conv"]["weight"])
    assert 0.0 < float(np.abs(w - snap_w).max()) < 0.2
    assert int(state.step) == 2


def test_resume_from_full_checkpoint(trained_run, toy_dataset,
                                     tmp_path_factory):
    """Orbax full-state resume: Adam moments, Gs EMA, pl_mean and the IMLE
    counters survive (unlike the reference's weight-only pkls, SURVEY.md §5
    'Checkpoint / resume'); --resume-checkpoint accepts the run dir."""
    from inclusivegan_tpu.utils.run_harness import SubmitConfig, submit_run

    run_dir, prev_state = trained_run
    assert glob.glob(os.path.join(run_dir, "checkpoints", "step_*"))

    result_root = str(tmp_path_factory.mktemp("ckpt_resume"))
    sc = SubmitConfig(run_dir_root=result_root, run_desc="ckptresume")
    state = submit_run(
        sc, "inclusivegan_tpu.training.training_loop.training_loop",
        G_args=dict(fmap_base=256, fmap_max=32, latent_size=32,
                    dlatent_size=32, mapping_layers=2, mapping_fmaps=32),
        D_args=dict(fmap_base=256, fmap_max=32, mbstd_group_size=2),
        G_loss_args=dict(NN_rec_lpips_weight=2.5),
        D_loss_args=dict(gamma=10.0),
        dataset_args=dict(tfrecord_dir=os.path.basename(toy_dataset),
                          max_label_size="full"),
        sched_args=dict(minibatch_size_base=MB, minibatch_gpu_base=MB // 8,
                        tick_kimg_base=0.001),
        data_dir=os.path.dirname(toy_dataset),
        total_kimg=1, data_size=DATA_SIZE, num_epochs=1,
        num_samples_factor=2, init_staleness=10, candidate_batch_size=32,
        knn_perturb_factor=0.05, init_proj_dim=16, metric_arg_list=[],
        minibatch_repeats=2, smoke_test_max_iters=1, seed=123,
        resume_checkpoint=run_dir, save_full_checkpoints=False)

    log = open(os.path.join(result_root, "00000-ckptresume",
                            "log.txt")).read()
    assert "Restoring full training state" in log

    # compare against the checkpoint itself (the last checkpoint is written
    # at a tick, which may precede the fixture's final returned state)
    import jax
    from inclusivegan_tpu.models import Discriminator, GMain
    from inclusivegan_tpu.training.checkpoint import (latest_checkpoint,
                                                      load_checkpoint)
    from inclusivegan_tpu.training.train_state import create_train_state
    G = GMain.create(resolution=RES, num_channels=3, latent_size=32,
                     dlatent_size=32, fmap_base=256, fmap_max=32,
                     mapping_layers=2, mapping_fmaps=32, label_size=4)
    D = Discriminator(resolution=RES, num_channels=3, fmap_base=256,
                      fmap_max=32, mbstd_group_size=2, label_size=4)
    template = create_train_state(jax.random.key(0), G, D)
    ck = latest_checkpoint(os.path.join(run_dir, "checkpoints"))
    ck_state, imle_d = load_checkpoint(ck, template)
    # Adam moment counter and step counter continue from the checkpoint
    # (a fresh run would restart at 0). The one resumed iteration runs the
    # G main phase AND the G path-reg phase (counter 0 → reg fires), and
    # both bump the shared moment counter — the reference's share=G_opt
    # semantics (training_loop.py:254-255).
    assert int(ck_state.g_opt.count) > 0
    assert int(state.g_opt.count) == int(ck_state.g_opt.count) + 2
    assert int(state.step) == int(ck_state.step) + 1
    # IMLE counters were checkpointed alongside
    assert "staleness" in imle_d and int(imle_d["staleness"]) >= 10


def test_run_generator_cli_function(trained_run, tmp_path):
    """run_generator.py generate-images inner function (reference
    run_generator.py:19-37): per-batch noise re-randomization from
    RandomState(0), truncation, %06d.png artifacts."""
    import run_generator

    run_dir, _ = trained_run
    pkl = os.path.join(run_dir, "network-final.pkl")
    sc = EasyDict(run_dir=str(tmp_path))
    run_generator.generate_images(sc, pkl, num_images=3, minibatch_size=2,
                                  truncation_psi=0.6)
    import PIL.Image
    files = sorted(glob.glob(os.path.join(str(tmp_path), "*.png")))
    assert [os.path.basename(f) for f in files] == [
        "000000.png", "000001.png", "000002.png"]
    img = np.asarray(PIL.Image.open(files[0]))
    assert img.shape == (RES, RES, 3) and img.dtype == np.uint8


def test_run_projector_cli_function(trained_run, toy_dataset, tmp_path):
    """run_projector.py project-real-images inner function (reference
    run_projector.py:23-57): target/final/step snapshots + ivom.txt with
    the mean/std LPIPS report."""
    import run_projector

    run_dir, _ = trained_run
    pkl = os.path.join(run_dir, "network-final.pkl")
    sc = EasyDict(run_dir=str(tmp_path))
    mean, std = run_projector.project_real_images(
        sc, pkl, os.path.basename(toy_dataset),
        os.path.dirname(toy_dataset), num_images=2, num_steps=6,
        minibatch_size=2, num_snapshots=2)
    assert np.isfinite(mean) and np.isfinite(std)
    for i in range(2):
        assert os.path.isfile(
            os.path.join(str(tmp_path), f"image{i:04d}-target.png"))
        assert os.path.isfile(
            os.path.join(str(tmp_path), f"image{i:04d}-final.png"))
    with open(os.path.join(str(tmp_path), "ivom.txt")) as f:
        parts = f.read().split()
    assert float(parts[0]) == pytest.approx(mean, abs=1e-5)
    assert int(parts[2]) == 2


def test_ls_metric_with_default_scorer(trained_run, toy_dataset):
    """LS runs end-to-end with its DEFAULT attribute scorer (the 40-head
    CNN, feature_nets.CelebAAttrClassifier) — VERDICT r1 item 6: the
    registry 'ls' entry must actually produce a number. No trained npz in
    the test env, so the result carries the untrained-classifier tag, same
    convention as mode_counts."""
    from inclusivegan_tpu.metrics import metric_base
    run_dir, _ = trained_run
    snapshot = os.path.join(run_dir, "network-final.pkl")
    dataset_args = dict(tfrecord_dir=os.path.basename(toy_dataset),
                        max_label_size="full")
    res = metric_base.run_metric(
        EasyDict(name="ls_small",
                 func_name="inclusivegan_tpu.metrics.linear_separability.LS",
                 num_samples=64, num_keep=32, attrib_indices=range(3),
                 minibatch_per_gpu=8,
                 # hermetic: force the random-init scorer even when a
                 # trained metrics_weights/ npz exists in the repo
                 classifier_weights=os.path.join(run_dir, "no_such.npz")),
        network_pkl=snapshot, dataset_args=dataset_args,
        data_dir=os.path.dirname(toy_dataset), run_dir=run_dir)
    # exp2 of summed conditional entropies over 3 attrs in [0,1] bits each
    for space in ("z", "w"):
        v = res[f"ls_small_{space}"]
        assert np.isfinite(v) and 1.0 <= v <= 2.0 ** 3 + 1e-6, (space, v)
    assert "ls_small_untrained_classifier" in res


def test_gs_sampler_transform_hooks(trained_run):
    """input/output transform hooks — the TPU-native Network.run transform
    kwargs (reference network.py:380-393). The raw-float output transform
    must quantize to exactly the default uint8 path's output."""
    from inclusivegan_tpu.metrics.metric_base import GsSampler
    run_dir, _ = trained_run
    pkl = os.path.join(run_dir, "network-final.pkl")
    z = np.random.RandomState(4).randn(6, 32).astype(np.float32)

    s_u8 = GsSampler(pkl, minibatch_size=8, seed=3)
    s_raw = GsSampler(pkl, minibatch_size=8, seed=3,
                      output_transform=lambda img: img)
    a = s_u8.run(z)
    b = s_raw.run(z)
    assert a.dtype == np.uint8 and b.dtype == np.float32
    np.testing.assert_array_equal(
        a, np.rint(np.clip((b + 1.0) * 127.5, 0, 255)).astype(np.uint8))

    # input transform: a fixed latent negation applied on device. Fresh
    # samplers on both sides — each run() advances the instance noise key
    s_neg = GsSampler(pkl, minibatch_size=8, seed=3,
                      input_transform=lambda z: -z)
    s_ref = GsSampler(pkl, minibatch_size=8, seed=3)
    np.testing.assert_array_equal(s_neg.run(z), s_ref.run(-z))
