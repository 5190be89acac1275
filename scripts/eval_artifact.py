#!/usr/bin/env python3
"""Measure the committed best-weights artifact and record the result in-tree.

Closes the evidence chain on the repo's north-star number: instead of
scraping the in-training eval of the (pre-cast, fp32) snapshot from run
logs, this restores ``artifacts/best_weights_fp16.pkl`` (the bytes that
actually survive VM restarts), evaluates mode_counts_24k + KL24k on the
chip through the production metric CLI, and writes
``artifacts/best_weights_eval.json`` carrying the measured numbers plus the
sha256 of the pkl it measured. bench.py prefers this record over the log
scrape whenever the sha still matches the committed pkl.

Reference north-star metric: /root/reference/metrics/mode_counts.py:44-49
(unique classifier modes of 24k samples, max 1000), BASELINE.json.

Usage:
    python3 scripts/eval_artifact.py                  # restore + eval + record (~25 min chip)
    python3 scripts/eval_artifact.py --record-only RUN_DIR   # parse an existing
        run_metrics run dir (metric-mode_counts_24k.txt) and record it
"""

import argparse
import datetime
import hashlib
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WEIGHTS = os.path.join(REPO, "artifacts", "best_weights_fp16.pkl")
RECORD = os.path.join(REPO, "artifacts", "best_weights_eval.json")


def sha256(path, chunk=1 << 20):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def parse_run_dir(run_dir):
    """metric-mode_counts_24k.txt → (count, kl). The mode_counts metric
    reports KL from the same sampling pass as a _KL suffix column
    (metrics/mode_counts.py)."""
    path = os.path.join(run_dir, "metric-mode_counts_24k.txt")
    count = kl = None
    with open(path) as f:
        for line in f:
            m = re.search(r"\smode_counts_24k\s+(\d+)", line)
            if m:
                count = int(m.group(1))
            m = re.search(r"mode_counts_24k_KL\s+([0-9.eE+-]+)", line)
            if m:
                kl = float(m.group(1))
    if count is None:
        raise SystemExit(f"no mode_counts_24k line in {path}")
    return count, kl


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--record-only", metavar="RUN_DIR", default=None,
                    help="parse an existing run_metrics run dir instead of "
                         "re-running the 25-min chip eval")
    ap.add_argument("--weights-file", default=WEIGHTS)
    ap.add_argument("--classifier",
                    default=os.path.join(REPO, "metrics_weights",
                                         "stacked_mnist_classifier.npz"))
    args = ap.parse_args()

    if args.record_only:
        run_dir = args.record_only
    else:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "restore_best_weights.py"),
             "--weights-file", args.weights_file,
             "--out-dir", "/tmp/exp/restore"],
            check=True, capture_output=True, text=True).stdout
        snap = json.loads(out[:out.index("\n\nresume")])["snapshot"]
        subprocess.run(
            [sys.executable, os.path.join(REPO, "run_metrics.py"),
             "--network", snap, "--metrics", "mode_counts_24k,KL24k",
             "--dataset", "stacked_synth_240k", "--data-dir",
             "/tmp/exp/datasets", "--result-dir", "/tmp/exp/eval_results",
             "--classifier-weights", args.classifier],
            check=True, cwd=REPO)
        runs = sorted(
            d for d in os.listdir("/tmp/exp/eval_results")
            if os.path.isdir(os.path.join("/tmp/exp/eval_results", d)))
        run_dir = os.path.join("/tmp/exp/eval_results", runs[-1])

    count, kl = parse_run_dir(run_dir)
    import pickle
    with open(args.weights_file, "rb") as f:
        meta = pickle.load(f).get("mirror_meta", {})
    record = {
        "artifact": os.path.relpath(args.weights_file, REPO),
        "artifact_sha256": sha256(args.weights_file),
        "mode_counts_24k": count,
        "KL24k": kl,
        "kimg": meta.get("kimg"),
        "src_run": meta.get("src_run"),
        # provenance: was the source run trained under the shipping fused-G
        # default (TrainConfig.g_loss_batched=True)? Stamped into mirror_meta
        # by mirror_best_checkpoint.py from the run's submit_config.txt.
        "g_loss_batched": meta.get("g_loss_batched"),
        "classifier": os.path.relpath(args.classifier, REPO),
        "eval_run_dir": os.path.abspath(run_dir),
        "evaluated_utc": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
        "note": "measured on the restored fp16->fp32 artifact itself "
                "(not a training-log scrape) via run_metrics.py on the "
                "attached TPU",
    }
    with open(RECORD, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(json.dumps(record, indent=1))


if __name__ == "__main__":
    main()
