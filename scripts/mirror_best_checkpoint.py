#!/usr/bin/env python3
"""Continuously mirror the best mode-coverage checkpoint to a survivable dir.

Motivation: the repo's ``results/`` tree is gitignored and was wiped by a VM
restart mid-round (losing the 994/1000 @622 kimg snapshot), while ``/tmp``
persisted. This sidecar polls every run's ``metric-mode_counts_24k.txt``,
tracks the globally best-scoring network snapshot, and rsync-copies its orbax
checkpoint (plus a BEST.json provenance stamp) to ``--backup-dir``. A later
session resumes via::

    scripts/exp_stacked_mode_coverage.py ... \
        --resume-checkpoint <backup-dir>/step_XXXX --resume-staleness 1

Pure host-side file copying — never touches the TPU client.
"""

import argparse
import json
import os
import re
import shutil
import time

LINE_RE = re.compile(
    r"network-snapshot-(\d+)\s+time\s+\S+\s+mode_counts_24k\s+(\d+)"
    r"(?:\s+mode_counts_24k_KL\s+([\d.]+))?")


def scan_runs(result_root):
    """→ list of (count, kl, kimg, run_dir) over all runs' metric files."""
    out = []
    if not os.path.isdir(result_root):
        return out
    for name in sorted(os.listdir(result_root)):
        run_dir = os.path.join(result_root, name)
        metric = os.path.join(run_dir, "metric-mode_counts_24k.txt")
        if not os.path.isfile(metric):
            continue
        with open(metric) as f:
            for ln in f:
                m = LINE_RE.search(ln)
                if m:
                    out.append((int(m.group(2)),
                                float(m.group(3)) if m.group(3) else None,
                                int(m.group(1)), run_dir))
    return out


def checkpoint_for_kimg(run_dir, kimg):
    cdir = os.path.join(run_dir, "checkpoints")
    if not os.path.isdir(cdir):
        return None
    for name in sorted(os.listdir(cdir), reverse=True):
        if name.startswith("step_") and int(name[len("step_"):]) // 1000 == kimg:
            return os.path.join(cdir, name)
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--result-root", default="/root/repo/results")
    p.add_argument("--backup-dir", default="/tmp/exp/ckpt_backup")
    p.add_argument("--record-file",
                   default="/root/repo/artifacts/best_mode_counts.json",
                   help="in-repo (restart-surviving) copy of the best metric "
                        "record; bench.py falls back to it when results/ has "
                        "been wiped")
    p.add_argument("--poll-sec", type=float, default=120.0)
    p.add_argument("--once", action="store_true")
    args = p.parse_args()

    os.makedirs(args.backup_dir, exist_ok=True)
    best_path = os.path.join(args.backup_dir, "BEST.json")
    mirrored = None
    if os.path.isfile(best_path):
        try:
            mirrored = json.load(open(best_path))
        except (OSError, ValueError):
            mirrored = None

    recorded = None
    if os.path.isfile(args.record_file):
        try:
            recorded = json.load(open(args.record_file))
        except (OSError, ValueError):
            recorded = None

    while True:
        entries = scan_runs(args.result_root)
        if entries:
            count, kl, kimg, run_dir = max(entries, key=lambda e: e[0])
            # metric record is durable in-repo and independent of whether the
            # checkpoint copy below succeeds (results/ and /tmp are both wiped
            # by VM restarts; only the git tree survives)
            if count > (recorded or {}).get("count", -1):
                recorded = {"count": count, "kl": kl, "kimg": kimg,
                            "src_run": run_dir, "ts": time.time()}
                try:
                    os.makedirs(os.path.dirname(args.record_file),
                                exist_ok=True)
                    with open(args.record_file, "w") as f:
                        json.dump(recorded, f, indent=1)
                    print(f"recorded best {count} modes @ {kimg} kimg -> "
                          f"{args.record_file}", flush=True)
                except OSError as e:
                    print(f"record write failed ({e})", flush=True)
            already = mirrored and mirrored.get("count", -1) >= count
            if not already:
                ck = checkpoint_for_kimg(run_dir, kimg)
                if ck and os.path.isdir(ck):
                    dst = os.path.join(args.backup_dir, os.path.basename(ck))
                    tmp = dst + ".tmp"
                    shutil.rmtree(tmp, ignore_errors=True)
                    try:
                        shutil.copytree(ck, tmp)
                        # atomic-ish promote: never leave a half checkpoint
                        # at the published name
                        shutil.rmtree(dst, ignore_errors=True)
                        os.rename(tmp, dst)
                        mirrored = {"count": count, "kl": kl, "kimg": kimg,
                                    "src_run": run_dir, "checkpoint": dst,
                                    "ts": time.time()}
                        with open(best_path, "w") as f:
                            json.dump(mirrored, f, indent=1)
                        print(f"mirrored {count} modes @ {kimg} kimg -> {dst}",
                              flush=True)
                        # drop superseded snapshots (keep disk bounded)
                        for name in os.listdir(args.backup_dir):
                            full = os.path.join(args.backup_dir, name)
                            if (name.startswith("step_") and full != dst
                                    and os.path.isdir(full)):
                                shutil.rmtree(full, ignore_errors=True)
                    except OSError as e:
                        print(f"mirror failed ({e}); will retry", flush=True)
                        shutil.rmtree(tmp, ignore_errors=True)
        if args.once:
            return
        time.sleep(args.poll_sec)


if __name__ == "__main__":
    main()
