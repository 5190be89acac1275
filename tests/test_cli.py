"""CLI argument assembly tests (no training): config-table semantics,
run-desc encoding, vestigial-preset rejection — per the reference
run_training.py behaviors."""

import sys

import pytest

import run_training


def test_vestigial_configs_rejected(tmp_path):
    with pytest.raises(SystemExit) as e:
        run_training.run(
            dataset="toy", data_dir=str(tmp_path), result_dir=str(tmp_path),
            config_id="config-a", num_devices=1, gamma=None,
            mirror_augment=False, metrics=[], resume_pkl=None,
            minibatch_gpu=4, data_size=64, num_epochs=1, init_proj_dim=None,
            init_staleness=10, num_samples_factor=2, knn_perturb_factor=0.05,
            candidate_batch_size=16, exclusive_retrieved_code=0,
            NN_rec_lpips_weight=2.5, dist_thres_percentile=100.0,
            attr_interesting=None, init_mul=1.0)
    assert "vestigial" in str(e.value)


def test_config_table_and_desc(monkeypatch, tmp_path):
    captured = {}

    def fake_submit(sc, fn, **kwargs):
        captured["sc"] = sc
        captured["fn"] = fn
        captured["kwargs"] = kwargs
        return None

    monkeypatch.setattr(run_training, "submit_run", fake_submit)
    run_training.run(
        dataset="toy", data_dir=str(tmp_path), result_dir=str(tmp_path),
        config_id="config-e-Gresnet-Dskip", num_devices=2, gamma=None,
        mirror_augment=True, metrics=[], resume_pkl=None,
        minibatch_gpu=6, data_size=3000, num_epochs=100, init_proj_dim=512,
        init_staleness=10, num_samples_factor=10, knn_perturb_factor=0.05,
        candidate_batch_size=256, exclusive_retrieved_code=0,
        NN_rec_lpips_weight=2.5, dist_thres_percentile=100.0,
        attr_interesting="Male,Young", init_mul=1.0)
    kw = captured["kwargs"]
    # config-e: gamma 100, fmaps shrunk, arch overrides applied
    assert kw["D_loss_args"]["gamma"] == 100
    assert kw["G_args"]["fmap_base"] == 8 << 10
    assert kw["G_args"]["architecture"] == "resnet"
    assert kw["D_args"]["architecture"] == "skip"
    assert kw["total_kimg"] == 3000 * 100 // 1000
    assert kw["mirror_augment"] is True
    assert kw["attr_interesting"] == "Male,Young"
    sc = captured["sc"]
    # run-desc knob encoding (reference run_training.py:84-113)
    assert "stylegan2-toy-2dev-config-e-Gresnet-Dskip" in sc.run_desc
    assert "_512Proj" in sc.run_desc
    assert "Male_and_Young" in sc.run_desc
    assert sc.run_desc.endswith("_scratch")


def test_invariant_rng_flag_plumbs_to_loop(monkeypatch, tmp_path):
    """--invariant-rng reaches training_loop(invariant_rng=True) (VERDICT
    r3 #7: the sharding-invariance mode was reachable only from tests)."""
    captured = {}

    def fake_submit(sc, fn, **kwargs):
        captured["kwargs"] = kwargs
        return None

    monkeypatch.setattr(run_training, "submit_run", fake_submit)
    common = dict(
        dataset="toy", data_dir=str(tmp_path), result_dir=str(tmp_path),
        config_id="config-e-Gskip-Dresnet", num_devices=2, gamma=None,
        mirror_augment=False, metrics=[], resume_pkl=None,
        minibatch_gpu=6, data_size=3000, num_epochs=100, init_proj_dim=None,
        init_staleness=10, num_samples_factor=10, knn_perturb_factor=0.05,
        candidate_batch_size=256, exclusive_retrieved_code=0,
        NN_rec_lpips_weight=2.5, dist_thres_percentile=100.0,
        attr_interesting=None, init_mul=1.0)
    run_training.run(invariant_rng=True, **common)
    assert captured["kwargs"]["invariant_rng"] is True
    run_training.run(**common)
    assert "invariant_rng" not in captured["kwargs"]  # loop default (False)


def test_g_loss_batched_and_profiler_flags_plumb(monkeypatch, tmp_path):
    """--g-loss-batched false reaches G_loss_args.batched=False (the
    reference-structured G phase; batched became the default in r4) and
    --enable-profiler reaches training_loop(enable_profiler=True)."""
    captured = {}

    def fake_submit(sc, fn, **kwargs):
        captured["kwargs"] = kwargs
        return None

    monkeypatch.setattr(run_training, "submit_run", fake_submit)
    common = dict(
        dataset="toy", data_dir=str(tmp_path), result_dir=str(tmp_path),
        config_id="config-e-Gskip-Dresnet", num_devices=1, gamma=None,
        mirror_augment=False, metrics=[], resume_pkl=None,
        minibatch_gpu=6, data_size=3000, num_epochs=100, init_proj_dim=None,
        init_staleness=10, num_samples_factor=10, knn_perturb_factor=0.05,
        candidate_batch_size=256, exclusive_retrieved_code=0,
        NN_rec_lpips_weight=2.5, dist_thres_percentile=100.0,
        attr_interesting=None, init_mul=1.0)
    run_training.run(g_loss_batched=False, enable_profiler=True, **common)
    assert captured["kwargs"]["G_loss_args"]["batched"] is False
    assert captured["kwargs"]["enable_profiler"] is True
    run_training.run(**common)
    # unset flag -> loop decides (TrainConfig default True, r4 adoption)
    assert "batched" not in captured["kwargs"]["G_loss_args"]
    assert "enable_profiler" not in captured["kwargs"]


def test_config_f_keeps_big_fmaps(monkeypatch, tmp_path):
    captured = {}
    monkeypatch.setattr(run_training, "submit_run",
                        lambda sc, fn, **kw: captured.update(kw))
    run_training.run(
        dataset="toy", data_dir=str(tmp_path), result_dir=str(tmp_path),
        config_id="config-f", num_devices=1, gamma=12.5,
        mirror_augment=False, metrics=[], resume_pkl=None,
        minibatch_gpu=4, data_size=64, num_epochs=1, init_proj_dim=None,
        init_staleness=10, num_samples_factor=2, knn_perturb_factor=0.05,
        candidate_batch_size=16, exclusive_retrieved_code=0,
        NN_rec_lpips_weight=2.5, dist_thres_percentile=100.0,
        attr_interesting=None, init_mul=1.0)
    assert "fmap_base" not in captured["G_args"]  # config-f default 16<<10
    assert captured["D_loss_args"]["gamma"] == 12.5  # --gamma override


def test_bench_yield_chip_drops_abort_sentinels(monkeypatch, tmp_path):
    """bench.py must cooperatively stop live runs before benchmarking (the
    axon backend serves one jax client at a time): abort.txt lands in every
    unfinished run dir, finished dirs are left alone."""
    import bench

    live = tmp_path / "results" / "00000-live"
    done = tmp_path / "results" / "00001-done"
    for d in (live, done):
        d.mkdir(parents=True)
        (d / "run.txt").write_text("x")
    (done / "_finished.txt").write_text("ok")
    monkeypatch.chdir(tmp_path)
    # timeout 0: even if a real trainer happens to be alive on this box,
    # return immediately after dropping the sentinels
    bench._yield_chip(timeout_sec=0.0)
    assert (live / "abort.txt").exists()
    assert not (done / "abort.txt").exists()


def test_run_metrics_classifier_weights_plumbing(monkeypatch, tmp_path):
    """--classifier-weights must reach mode_counts_*/KL* metric args (and
    only those); --lpips-weights reaches only ppl_*."""
    import run_metrics

    seen = []

    def fake_run_metric(args, **kwargs):
        seen.append(dict(args))
        return {args["name"]: 0.0}

    from inclusivegan_tpu.metrics import metric_base
    monkeypatch.setattr(metric_base, "run_metric", fake_run_metric)
    from inclusivegan_tpu.metrics.metric_defaults import metric_defaults
    metrics = [metric_defaults[n] for n in ("mode_counts_24k", "KL24k",
                                            "ppl_wend", "is50k")]

    class SC:
        run_dir = str(tmp_path)
        num_devices = 1

    run_metrics.run(SC(), network_pkl="net.pkl", metrics=metrics,
                    dataset="toy", data_dir=str(tmp_path),
                    lpips_weights="lp.npz", classifier_weights="clf.npz")
    by_name = {a["name"]: a for a in seen}
    assert by_name["mode_counts_24k"]["classifier_weights"] == "clf.npz"
    assert by_name["KL24k"]["classifier_weights"] == "clf.npz"
    assert "classifier_weights" not in by_name["ppl_wend"]
    assert "classifier_weights" not in by_name["is50k"]
    assert by_name["ppl_wend"]["lpips_weights"] == "lp.npz"
    assert "lpips_weights" not in by_name["is50k"]


def test_select_best_snapshot(tmp_path):
    """The quality loop evaluates the lowest-FID snapshot whose pkl is still
    on disk, skipping deleted ones, and falls back to network-final.pkl."""
    sys.path.insert(0, "scripts")
    try:
        from select_best_snapshot import best_snapshot
    finally:
        sys.path.pop(0)

    run_dir = tmp_path / "00000-run"
    run_dir.mkdir()
    (run_dir / "metric-fid30k.txt").write_text(
        "network-snapshot-000040        time 115.2       fid30k 195.9000  \n"
        "network-snapshot-000152        time 114.8       fid30k 2.0600    \n"
        "network-snapshot-000240        time 116.0       fid30k 21.4400   \n")
    for name in ("network-snapshot-000040", "network-snapshot-000152",
                 "network-snapshot-000240", "network-final"):
        (run_dir / f"{name}.pkl").write_bytes(b"x")

    pkl, value = best_snapshot(str(run_dir))
    assert pkl.endswith("network-snapshot-000152.pkl") and value == 2.06

    # the best pkl was pruned -> next-best surviving snapshot wins
    (run_dir / "network-snapshot-000152.pkl").unlink()
    pkl, value = best_snapshot(str(run_dir))
    assert pkl.endswith("network-snapshot-000240.pkl") and value == 21.44

    # no trajectory at all -> final snapshot (if it exists), no value
    empty = tmp_path / "00001-empty"
    empty.mkdir()
    (empty / "network-final.pkl").write_bytes(b"x")
    pkl, value = best_snapshot(str(empty))
    assert pkl.endswith("network-final.pkl") and value is None

    # bad run dir (no trajectory AND no final pkl) -> hard error at
    # selection time, not a dangling path for run_metrics to trip over
    bogus = tmp_path / "00002-bogus"
    bogus.mkdir()
    with pytest.raises(SystemExit):
        best_snapshot(str(bogus))

    # suffixed-only metric files (pr50k3 writes only _precision/_recall
    # columns) must not silently pick the final snapshot for the bare name
    (run_dir / "metric-pr50k3.txt").write_text(
        "network-snapshot-000040   time 1.0   "
        "pr50k3_precision 0.7000 pr50k3_recall 0.5000\n")
    pkl, value = best_snapshot(str(run_dir), metric="pr50k3")
    assert value is None  # warned fallback to final
    # ...but the suffixed column itself is selectable (file-name fallback)
    pkl, value = best_snapshot(str(run_dir), metric="pr50k3_recall",
                               lower_is_better=False)
    assert pkl.endswith("network-snapshot-000040.pkl") and value == 0.5

    # higher-is-better metrics pick the max
    (run_dir / "metric-rec30k.txt").write_text(
        "network-snapshot-000040        time 1.0 rec30k 0.1000\n"
        "network-snapshot-000240        time 1.0 rec30k 0.9000\n")
    pkl, value = best_snapshot(str(run_dir), metric="rec30k",
                               lower_is_better=False)
    assert pkl.endswith("network-snapshot-000240.pkl") and value == 0.9


def test_seed_and_lpips_norm_flags_plumb(monkeypatch, tmp_path):
    """--seed N reaches training_loop(seed=N) (the seed-noise/lottery knob;
    runs at identical knobs are deterministic, BENCH_NOTES) and
    --lpips-norm trunk reaches training_loop(lpips_norm='trunk')
    (config-carried normalization mode, ADVICE r4). Unset flags leave the
    loop defaults (seed 1000, f32 norm) undisturbed."""
    captured = {}

    def fake_submit(sc, fn, **kwargs):
        captured["kwargs"] = kwargs
        return None

    monkeypatch.setattr(run_training, "submit_run", fake_submit)
    common = dict(
        dataset="toy", data_dir=str(tmp_path), result_dir=str(tmp_path),
        config_id="config-e-Gskip-Dresnet", num_devices=1, gamma=None,
        mirror_augment=False, metrics=[], resume_pkl=None,
        minibatch_gpu=6, data_size=3000, num_epochs=100, init_proj_dim=None,
        init_staleness=10, num_samples_factor=10, knn_perturb_factor=0.05,
        candidate_batch_size=256, exclusive_retrieved_code=0,
        NN_rec_lpips_weight=2.5, dist_thres_percentile=100.0,
        attr_interesting=None, init_mul=1.0)
    run_training.run(seed=1001, lpips_norm="trunk", **common)
    assert captured["kwargs"]["seed"] == 1001
    assert captured["kwargs"]["lpips_norm"] == "trunk"
    run_training.run(**common)
    assert "seed" not in captured["kwargs"]
    assert "lpips_norm" not in captured["kwargs"]
