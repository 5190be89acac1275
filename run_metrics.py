#!/usr/bin/env python3
"""Metric evaluation CLI — surface parity with
/root/reference/run_metrics.py (:20-27,40-70)."""

import argparse
import sys

from inclusivegan_tpu.metrics.metric_defaults import metric_defaults
from inclusivegan_tpu.utils.run_harness import SubmitConfig, submit_run
from inclusivegan_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()  # persistent XLA cache: warm starts across processes


def run(submit_config, network_pkl, metrics, dataset, data_dir,
        mirror_augment=False, lpips_weights=None, classifier_weights=None):
    from inclusivegan_tpu.metrics import metric_base
    print(f'Evaluating metrics "{",".join(m.name for m in metrics)}" '
          f'for "{network_pkl}"...')
    dataset_args = {"tfrecord_dir": dataset, "max_label_size": "full"}
    results = {}
    for args in metrics:
        if lpips_weights and "perceptual_path_length" in args.get(
                "func_name", ""):
            args = dict(args, lpips_weights=lpips_weights)
        if classifier_weights and ("mode_counts" in args.get("func_name", "")
                                   or args.get("func_name", "").endswith(
                                       "KL.KL")):
            args = dict(args, classifier_weights=classifier_weights)
        results.update(metric_base.run_metric(
            args, network_pkl=network_pkl, dataset_args=dataset_args,
            data_dir=data_dir, run_dir=submit_config.run_dir,
            mirror_augment=mirror_augment,
            num_devices=getattr(submit_config, "num_devices", 1) or 1))
    return results


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
        description="Run StyleGAN2 metrics (TPU-native).")
    parser.add_argument("--result-dir", default="results", metavar="DIR")
    parser.add_argument("--network", dest="network_pkl", required=True)
    parser.add_argument("--metrics", default="fid30k", type=_parse_comma_sep)
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--data-dir", required=True)
    # --num-gpus kept as an alias (reference run_metrics.py:55)
    parser.add_argument("--num-gpus", "--num-devices", dest="num_devices",
                        type=int, default=1, metavar="N",
                        help="devices to shard fake-generation over")
    parser.add_argument("--mirror-augment", default=False, type=_str_to_bool,
                        metavar="BOOL",
                        help="apply mirror augment to reals so their "
                             "statistics match an augmented training run "
                             "(reference run_metrics.py:54)")
    parser.add_argument("--lpips-weights", default=None, type=str,
                        help="LPIPS npz for perceptual metrics (ppl_*); "
                             "default: discover metrics_weights/"
                             "vgg16_zhang_perceptual.npz, else the "
                             "pixel-pyramid fallback")
    parser.add_argument("--classifier-weights", default=None, type=str,
                        help="stacked-MNIST classifier npz for "
                             "mode_counts_*/KL* (scripts/"
                             "train_mnist_classifier.py); default: discover "
                             "metrics_weights/stacked_mnist_classifier.npz, "
                             "else a tagged random-init classifier")
    args = parser.parse_args()

    metrics = []
    for name in args.metrics:
        if name not in metric_defaults:
            print(f"Error: unknown metric '{name}'")
            sys.exit(1)
        metrics.append(metric_defaults[name])

    sc = SubmitConfig()
    sc.run_dir_root = args.result_dir
    sc.run_desc = "run_metrics"
    sc.num_devices = args.num_devices
    submit_run(sc, "run_metrics.run", network_pkl=args.network_pkl,
               metrics=metrics, dataset=args.dataset, data_dir=args.data_dir,
               mirror_augment=args.mirror_augment,
               lpips_weights=args.lpips_weights,
               classifier_weights=args.classifier_weights)


if __name__ == "__main__":
    main()
