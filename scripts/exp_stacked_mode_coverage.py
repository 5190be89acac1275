#!/usr/bin/env python3
"""Stacked-"MNIST" mode-coverage experiment on the real TPU chip.

The BASELINE.md north star is Stacked-MNIST mode count ≥997/1000, but this
container has no egress for the real MNIST files. This runs the FULL
production pipeline on a synthetic substitute (scripts/make_synthetic_mnist.py
renders the 10 digit classes with per-sample variation):

  make_synthetic_mnist → dataset_tool create_mnistrgb (1000 modes)
  → train_mnist_classifier (100% held-out digit accuracy)
  → run-harness training: config-e-Gskip-Dresnet semantics at 32px, bf16,
    full IMLE (DCI rebuilds w/ staleness doubling, rec+interp LPIPS losses)
  → in-training mode_counts_24k / KL24k every network snapshot.

Everything goes through the same code paths as the reference's documented
stacked-MNIST run (reference README.md:71-80); only the digit images are
synthetic. Expects the dataset + classifier already built (see module
docstrings); results land in --result-root.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="/tmp/exp/datasets")
    p.add_argument("--dataset", default="stacked_synth_16k")
    p.add_argument("--data-size", type=int, default=16384)
    p.add_argument("--classifier", default="/tmp/exp/stacked_mnist_classifier.npz")
    p.add_argument("--result-root", default="results")
    p.add_argument("--num-epochs", type=int, default=200)
    p.add_argument("--minibatch", type=int, default=32)
    p.add_argument("--num-samples-factor", type=int, default=10)
    p.add_argument("--init-proj-dim", type=int, default=512,
                   help="DCI random-projection dim (reference CLI knob; "
                        "None-equivalent is 0 here meaning no projection). "
                        "512 cuts the per-candidate device->host fetch 6x "
                        "vs raw 3072-dim features on relay-attached TPUs")
    p.add_argument("--candidate-batch-size", type=int, default=1024)
    p.add_argument("--smoke", type=int, default=0,
                   help="if >0, stop after this many iterations")
    p.add_argument("--image-snapshot-ticks", type=int, default=5)
    p.add_argument("--network-snapshot-ticks", type=int, default=10,
                   help="snapshot+metric cadence; each event costs a pkl + "
                        "orbax save + two 24k-sample metric evals, so coarsen "
                        "for wall-clock-bounded runs")
    p.add_argument("--resume-checkpoint", default=None,
                   help="orbax step dir / checkpoints dir / run dir to "
                        "resume full state from")
    p.add_argument("--resume-pkl", default=None,
                   help="weights-only (G,D,Gs) snapshot to resume from — "
                        "e.g. the output of scripts/restore_best_weights.py "
                        "after a VM wipe destroyed the orbax copies "
                        "(restarts optimizer state, reference "
                        "--resume-pkl semantics)")
    p.add_argument("--resume-rampup-kimg", type=float, default=0.0,
                   help="warm Adam back up after --resume-pkl: linear lr "
                        "ramp over this many kimg past the resume point "
                        "(weights-only resumes restart the moments; a "
                        "full-lr first step collapses modes — BENCH_NOTES)")
    p.add_argument("--resume-g-from-gs", action="store_true",
                   help="start training G from the snapshot's Gs (EMA) "
                        "weights — the averaged point is the better model; "
                        "without it the EMA decays to the raw G's quality "
                        "within ~3 half-lives after a resume")
    p.add_argument("--resume-staleness", type=int, default=None,
                   help="override restored IMLE staleness on resume "
                        "(smaller = more frequent re-anchoring retrievals)")
    p.add_argument("--g-lrate", type=float, default=0.002)
    p.add_argument("--d-lrate", type=float, default=0.002)
    p.add_argument("--gamma", type=float, default=100.0,
                   help="R1 gradient-penalty weight")
    p.add_argument("--rec-weight", type=float, default=2.5,
                   help="NN_rec_lpips_weight")
    p.add_argument("--rec-weight-final", type=float, default=None,
                   help="ramp NN_rec_lpips_weight linearly from --rec-weight "
                        "to this value over [--rec-weight-ramp-start, "
                        "--rec-weight-ramp-end] kimg (traced scalar: no "
                        "recompiles). Ramping the IMLE anchor up late "
                        "counters the measured late-training mode decay")
    p.add_argument("--rec-weight-ramp-start", type=float, default=0.0)
    p.add_argument("--rec-weight-ramp-end", type=float, default=0.0)
    p.add_argument("--exclusive-retrieved-code", type=int, default=0,
                   help="reference training_loop.py:382-396 — each real "
                        "gets a DIFFERENT retrieved candidate latent "
                        "(greedy exclusive assignment over the top-k), "
                        "forcing candidate diversity in the IMLE anchor")
    p.add_argument("--seed", type=int, default=1000,
                   help="training_loop seed (np + all jax keys). Fresh runs "
                        "at identical knobs are DETERMINISTIC, so restart "
                        "lotteries must vary this")
    p.add_argument("--lpips-weights", default=None,
                   help="npz for models/lpips.py::load_lpips_params — e.g. "
                        "the domain perceptual net from "
                        "scripts/train_perceptual_vgg.py. Default (None) "
                        "falls back to the pixel-pyramid metric, which has "
                        "no perceptual separation pressure (BENCH_NOTES "
                        "mode-collapse post-mortem)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=("bfloat16", "float32"),
                   help="activation dtype (params/optimizer stay fp32). "
                        "float32 exists for matched-seed dtype-parity runs "
                        "(VERDICT r2 item 5); bfloat16 is the TPU-native "
                        "production configuration")
    p.add_argument("--g-loss-batched", type=int, default=1,
                   help="1 (default, matches TrainConfig.g_loss_batched) = "
                        "fuse the four G forwards + six LPIPS passes into "
                        "one of each (loss.py::g_main_loss batched); same "
                        "losses per sample, -26%% plain-step time / +24%% "
                        "reg-cadence throughput at mb6 (BENCH_NOTES r4). "
                        "0 = the reference-structured per-forward variant")
    p.add_argument("--ema-kimg", type=float, default=10.0,
                   help="G_smoothing_kimg (reference training_loop.py:137). "
                        "Large-batch recipes keep the EMA horizon in kimg "
                        "constant, which shortens it in STEPS as minibatch "
                        "grows")
    args = p.parse_args()

    import jax.numpy as jnp

    from inclusivegan_tpu.utils.compilation_cache import enable_compilation_cache
    from inclusivegan_tpu.utils.easydict import EasyDict
    from inclusivegan_tpu.utils.run_harness import SubmitConfig, submit_run

    enable_compilation_cache()

    metrics = []
    from inclusivegan_tpu.metrics.metric_defaults import metric_defaults
    # mode_counts_24k reports the KL from the same 24k sampling pass
    # (mode_counts.py), so the separate KL24k metric would only double the
    # ~2-min relay-bound eval per snapshot.
    for name in ("mode_counts_24k",):
        m = EasyDict(metric_defaults[name])
        m.classifier_weights = args.classifier
        metrics.append(m)

    sc = SubmitConfig()
    sc.run_dir_root = args.result_root
    sc.run_desc = f"stacked-synth-{args.data_size // 1024}k-mode-coverage"
    sc.num_devices = 1

    submit_run(
        sc, "inclusivegan_tpu.training.training_loop.training_loop",
        # config-e-Gskip-Dresnet semantics (reference run_training.py:19-32)
        G_args=EasyDict(fmap_base=8 << 10, architecture="skip",
                        dtype=jnp.dtype(args.dtype).type),
        D_args=EasyDict(fmap_base=8 << 10, architecture="resnet",
                        mbstd_group_size=8, dtype=jnp.dtype(args.dtype).type),
        G_opt_args=EasyDict(beta1=0.0, beta2=0.99, epsilon=1e-8),
        D_opt_args=EasyDict(beta1=0.0, beta2=0.99, epsilon=1e-8),
        G_loss_args=EasyDict(NN_rec_lpips_weight=args.rec_weight,
                             batched=bool(args.g_loss_batched)),
        D_loss_args=EasyDict(gamma=args.gamma),
        dataset_args=EasyDict(tfrecord_dir=args.dataset, max_label_size=0),
        sched_args=EasyDict(G_lrate_base=args.g_lrate,
                            D_lrate_base=args.d_lrate,
                            minibatch_size_base=args.minibatch,
                            minibatch_gpu_base=args.minibatch,
                            tick_kimg_base=20),
        grid_args=EasyDict(size="1080p"),
        metric_arg_list=metrics,
        data_dir=args.data_dir,
        seed=args.seed,
        G_smoothing_kimg=args.ema_kimg,
        total_kimg=args.data_size * args.num_epochs // 1000,
        mirror_augment=False,
        data_size=args.data_size,
        num_epochs=args.num_epochs,
        init_proj_dim=args.init_proj_dim or None,
        init_staleness=10,
        num_samples_factor=args.num_samples_factor,
        knn_perturb_factor=0.05,
        candidate_batch_size=args.candidate_batch_size,
        exclusive_retrieved_code=args.exclusive_retrieved_code,
        rec_weight_final=args.rec_weight_final,
        rec_weight_ramp_start_kimg=args.rec_weight_ramp_start,
        rec_weight_ramp_end_kimg=args.rec_weight_ramp_end,
        dist_thres_percentile=100.0,
        attr_interesting=None,
        lpips_weights_path=args.lpips_weights,
        image_snapshot_ticks=args.image_snapshot_ticks,
        network_snapshot_ticks=args.network_snapshot_ticks,
        resume_pkl=args.resume_pkl,
        resume_checkpoint=args.resume_checkpoint,
        resume_staleness=args.resume_staleness,
        resume_lrate_rampup_kimg=args.resume_rampup_kimg,
        resume_g_from_gs=args.resume_g_from_gs,
        num_devices=1,
        smoke_test_max_iters=args.smoke or None,
        save_full_checkpoints=True,
    )


if __name__ == "__main__":
    main()
