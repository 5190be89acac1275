#!/usr/bin/env python3
"""Training CLI — flag-compatible surface with /root/reference/run_training.py
(argparse table :186-230, config presets :19-32,118-153), driving the
TPU-native training loop.

Config semantics: only the config-e*/config-f families are runnable in the
reference fork (configs a–d reference functions that don't exist there,
SURVEY.md §5 'Vestigial/broken presets'); we accept the same ids and reject
a–d with a clear message instead of failing at name resolution."""

import argparse
import os
import sys

from inclusivegan_tpu.metrics.metric_defaults import metric_defaults
from inclusivegan_tpu.utils.easydict import EasyDict
from inclusivegan_tpu.utils.run_harness import SubmitConfig, submit_run
from inclusivegan_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()  # persistent XLA cache: warm starts across processes

_valid_configs = [
    "config-a", "config-b", "config-c", "config-d", "config-e", "config-f",
    "config-e-Gorig-Dorig", "config-e-Gorig-Dskip", "config-e-Gorig-Dresnet",
    "config-e-Gskip-Dorig", "config-e-Gskip-Dskip", "config-e-Gskip-Dresnet",
    "config-e-Gresnet-Dorig", "config-e-Gresnet-Dskip",
    "config-e-Gresnet-Dresnet",
]


def run(dataset, data_dir, result_dir, config_id, num_devices, gamma,
        mirror_augment, metrics, resume_pkl, minibatch_gpu, data_size,
        num_epochs, init_proj_dim, init_staleness, num_samples_factor,
        knn_perturb_factor, candidate_batch_size, exclusive_retrieved_code,
        NN_rec_lpips_weight, dist_thres_percentile, attr_interesting,
        init_mul, total_kimg=None, smoke_test_max_iters=None,
        resume_checkpoint=None, dtype="float32", knn_backend="auto",
        lpips_weights=None, image_snapshot_ticks=None,
        network_snapshot_ticks=None, invariant_rng=False,
        enable_profiler=False, g_loss_batched=None, lpips_norm=None,
        seed=None):
    train = EasyDict()
    G = EasyDict(init_mul=init_mul)
    D = EasyDict(init_mul=init_mul)
    if dtype != "float32":
        # bf16 activations (fp32 params/optimizer/reductions) — the
        # TPU-native training configuration (BENCH_NOTES.md)
        G.dtype = D.dtype = dtype
    G_opt = EasyDict(beta1=0.0, beta2=0.99, epsilon=1e-8)
    D_opt = EasyDict(beta1=0.0, beta2=0.99, epsilon=1e-8)
    G_loss = EasyDict(NN_rec_lpips_weight=NN_rec_lpips_weight)
    if g_loss_batched is not None:
        G_loss.batched = g_loss_batched
    D_loss = EasyDict(gamma=10.0)
    sched = EasyDict()
    grid = EasyDict(size="1080p")
    sc = SubmitConfig()

    train.total_kimg = total_kimg if total_kimg is not None else \
        (data_size * num_epochs) // 1000
    train.mirror_augment = mirror_augment
    sched.G_lrate_base = sched.D_lrate_base = 0.002
    sched.minibatch_gpu_base = minibatch_gpu
    sched.minibatch_size_base = minibatch_gpu * num_devices
    metrics = [metric_defaults[x] for x in metrics]
    train.resume_pkl = resume_pkl
    if resume_checkpoint is not None:
        train.resume_checkpoint = resume_checkpoint
    if lpips_weights is not None:
        train.lpips_weights_path = lpips_weights
    if lpips_norm is not None:
        train.lpips_norm = lpips_norm
    if seed is not None:
        train.seed = seed
    train.update(data_size=data_size, num_epochs=num_epochs,
                 init_proj_dim=init_proj_dim, init_staleness=init_staleness,
                 num_samples_factor=num_samples_factor,
                 knn_perturb_factor=knn_perturb_factor,
                 candidate_batch_size=candidate_batch_size,
                 exclusive_retrieved_code=exclusive_retrieved_code,
                 dist_thres_percentile=dist_thres_percentile,
                 attr_interesting=attr_interesting,
                 knn_backend=knn_backend)
    if invariant_rng:
        train.invariant_rng = True
    if enable_profiler:
        train.enable_profiler = True
    if smoke_test_max_iters:
        train.smoke_test_max_iters = smoke_test_max_iters
    if image_snapshot_ticks is not None:
        train.image_snapshot_ticks = image_snapshot_ticks
    if network_snapshot_ticks is not None:
        train.network_snapshot_ticks = network_snapshot_ticks

    desc = "stylegan2"
    desc += "-" + dataset
    dataset_args = EasyDict(tfrecord_dir=dataset, max_label_size="full")
    sc.num_devices = num_devices
    desc += f"-{num_devices}dev"

    assert config_id in _valid_configs
    if config_id in ("config-a", "config-b", "config-c", "config-d"):
        raise SystemExit(
            f"{config_id} is a vestigial preset: the reference fork ships "
            "neither its networks nor its loss (run_training.py:138-143 "
            "reference functions that do not exist). Use config-e*/config-f.")
    desc += "-" + config_id
    desc += "_noProj" if init_proj_dim is None else f"_{init_proj_dim}Proj"
    desc += f"_init_staleness_{init_staleness}"
    desc += f"_num_samples_factor_{num_samples_factor}"
    desc += f"_knn_perturb_factor_{knn_perturb_factor:f}"
    desc += f"_NN_rec_lpips_weight_{NN_rec_lpips_weight:f}"
    if attr_interesting is not None:
        desc += "_" + attr_interesting.replace(",", "_and_")
    desc += "_scratch" if resume_pkl is None or "_scratch" in resume_pkl else "_finetune"

    # Configs A-E shrink fmaps vs config-f (reference :117)
    if config_id != "config-f":
        G.fmap_base = D.fmap_base = 8 << 10
    if config_id.startswith("config-e"):
        D_loss.gamma = 100
        if "Gorig" in config_id:
            G.architecture = "orig"
        if "Gskip" in config_id:
            G.architecture = "skip"
        if "Gresnet" in config_id:
            G.architecture = "resnet"
        if "Dorig" in config_id:
            D.architecture = "orig"
        if "Dskip" in config_id:
            D.architecture = "skip"
        if "Dresnet" in config_id:
            D.architecture = "resnet"
    if gamma is not None:
        D_loss.gamma = gamma

    kwargs = EasyDict(train)
    kwargs.update(G_args=G, D_args=D, G_opt_args=G_opt, D_opt_args=D_opt,
                  G_loss_args=G_loss, D_loss_args=D_loss,
                  dataset_args=dataset_args, sched_args=sched,
                  grid_args=grid, metric_arg_list=metrics,
                  data_dir=data_dir, num_devices=num_devices)
    sc.run_dir_root = result_dir
    sc.run_desc = desc
    return submit_run(sc, "inclusivegan_tpu.training.training_loop.training_loop",
                      **kwargs)


def _str_to_bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def _parse_comma_sep(s):
    if s is None or s.lower() == "none" or s == "":
        return []
    return s.split(",")


def main():
    parser = argparse.ArgumentParser(
        description="Train StyleGAN2 (TPU-native).",
        formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--result-dir", default="results", metavar="DIR")
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--config", default="config-e", dest="config_id",
                        metavar="CONFIG")
    parser.add_argument("--init-mul", default=1.0, type=float)
    # --num-gpus kept as an alias of --num-devices for script compatibility
    parser.add_argument("--num-gpus", "--num-devices", dest="num_devices",
                        default=1, type=int, metavar="N")
    parser.add_argument("--gamma", default=None, type=float)
    parser.add_argument("--mirror-augment", default=False, metavar="BOOL",
                        type=_str_to_bool)
    parser.add_argument("--metrics", default="fid30k", type=_parse_comma_sep)
    parser.add_argument("--minibatch-gpu", metavar="N", default=6, type=int)
    parser.add_argument("--data-size", metavar="N", default=30000, type=int)
    parser.add_argument("--num-epochs", metavar="N", default=10000, type=int)
    parser.add_argument("--total-kimg", metavar="N", default=None, type=int)
    parser.add_argument("--init-proj-dim", metavar="N", default=None, type=int)
    parser.add_argument("--init-staleness", metavar="N", default=10, type=int)
    parser.add_argument("--num-samples-factor", metavar="N", default=10,
                        type=int)
    parser.add_argument("--knn-perturb-factor", default=0.05, type=float)
    parser.add_argument("--knn-backend", default="auto",
                        choices=("auto", "exact", "dci"),
                        help="IMLE NN retrieval: exact on-device kNN "
                             "(TPU matmuls; default when the candidate "
                             "features fit HBM) or the host-side "
                             "Prioritized-DCI library")
    parser.add_argument("--candidate-batch-size", metavar="N", default=256,
                        type=int)
    parser.add_argument("--exclusive-retrieved-code", metavar="N", default=0,
                        type=int)
    parser.add_argument("--NN-rec-lpips-weight", default=2.5, type=float)
    parser.add_argument("--dist-thres-percentile", default=100.0, type=float)
    parser.add_argument("--attr-interesting", default=None, type=str)
    parser.add_argument("--resume-pkl", default=None, type=str)
    parser.add_argument("--resume-checkpoint", default=None, type=str,
                        help="orbax full-state checkpoint (step dir, checkpoints/ dir, or run dir)")
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="activation dtype (bfloat16 = TPU-native; params/optimizer stay fp32)")
    parser.add_argument("--seed", default=None, type=int, metavar="N",
                        help="training_loop seed (np + all jax keys; "
                             "default 1000). Runs at identical knobs are "
                             "deterministic, so seed-noise measurements "
                             "and restart lotteries must vary this "
                             "(beyond-reference knob; the reference's "
                             "tflib.init_tf seeds are fixed)")
    parser.add_argument("--invariant-rng", default=False, metavar="BOOL",
                        type=_str_to_bool,
                        help="sharding-invariant per-example RNG: an n-chip "
                             "run reproduces the 1-chip trajectory on the "
                             "same global batches (costs per-example "
                             "fold_in vmaps; price measured in BENCH_NOTES)")
    parser.add_argument("--lpips-weights", default=None, type=str,
                        help="LPIPS npz for the rec/interp anchor (reference "
                             "hardcodes vgg16_zhang_perceptual.pkl, "
                             "training_loop.py:195); default: discover "
                             "metrics_weights/vgg16_zhang_perceptual.npz, "
                             "else the pixel-pyramid fallback")
    parser.add_argument("--smoke-test-max-iters", default=None, type=int,
                        help="stop after N iterations (CI smoke runs)")
    parser.add_argument("--g-loss-batched", default=None, metavar="BOOL",
                        type=_str_to_bool,
                        help="fuse the four G forwards + six LPIPS passes "
                             "of the G phase into one of each (same losses "
                             "per sample; -26%% plain-step time / +24%% "
                             "reg-cadence throughput at mb6 on TPU, "
                             "BENCH_NOTES r4). Default: the "
                             "training-loop default")
    parser.add_argument("--lpips-norm", default=None,
                        choices=("f32", "trunk"),
                        help="LPIPS tap channel-normalization layout for "
                             "the G phase (TrainConfig.lpips_norm): f32 "
                             "materializes f32 tap maps (default); trunk "
                             "keeps maps in the LPIPS trunk dtype — saves "
                             "the f32 HBM copies the r4 profile charged "
                             "~8 ms/iter to (BENCH_NOTES r5 A/B)")
    parser.add_argument("--enable-profiler", default=False, metavar="BOOL",
                        type=_str_to_bool,
                        help="record a jax.profiler trace of iterations "
                             "8-16 into <run_dir>/profile (summarize with "
                             "scripts/parse_profile.py)")
    parser.add_argument("--image-snapshot-ticks", default=None, type=int,
                        help="grid-image cadence in ticks (default: derived "
                             "from data size, training_loop.py)")
    parser.add_argument("--network-snapshot-ticks", default=None, type=int,
                        help="snapshot+metric cadence in ticks (default: "
                             "derived from data size; short matched-seed "
                             "runs want a denser fid trajectory)")

    args = parser.parse_args()
    if not os.path.exists(args.data_dir):
        print("Error: dataset root directory does not exist.")
        sys.exit(1)
    if args.config_id not in _valid_configs:
        print("Error: --config value must be one of:",
              ", ".join(_valid_configs))
        sys.exit(1)
    for metric in args.metrics:
        if metric not in metric_defaults:
            print(f"Error: unknown metric '{metric}'")
            sys.exit(1)
    run(**vars(args))


if __name__ == "__main__":
    main()
