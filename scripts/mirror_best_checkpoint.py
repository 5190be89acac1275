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
import pickle
import re
import shutil
import subprocess
import time

# must precede the numpy import: on this VM class numpy's hugepage madvise
# makes big first-touch writes stall behind khugepaged (BENCH_NOTES.md;
# same guard as inclusivegan_tpu/__init__.py)
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
import numpy as np  # noqa: E402

try:
    from numpy._core import multiarray as _ma  # np>=2
except ImportError:  # pragma: no cover - older numpy
    from numpy.core import multiarray as _ma  # type: ignore
if hasattr(_ma, "_set_madvise_hugepage"):
    _ma._set_madvise_hugepage(False)

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
        # digit check skips in-progress saves (step_N.orbax-checkpoint-tmp-*)
        if (name.startswith("step_") and name[len("step_"):].isdigit()
                and int(name[len("step_"):]) // 1000 == kimg):
            return os.path.join(cdir, name)
    return None


def _cast_floats(tree, dtype):
    """Recursively cast float arrays in a nested dict/list tree."""
    if isinstance(tree, dict):
        return {k: _cast_floats(v, dtype) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_cast_floats(v, dtype) for v in tree)
    if isinstance(tree, np.ndarray) and tree.dtype.kind == "f":
        return tree.astype(dtype)
    return tree


def run_g_loss_batched(run_dir):
    """True/False/None: the run's G_loss_args.batched flag, parsed from the
    run harness's submit_config.txt (provenance for VERDICT r4 item 1 — the
    headline artifact must be traceable to the shipping fused-G default)."""
    path = os.path.join(run_dir, "submit_config.txt")
    try:
        with open(path) as f:
            txt = f.read()
    except OSError:
        return None
    m = re.search(r"['\"]?batched['\"]?\s*[:=]\s*(True|False)", txt)
    return None if m is None else m.group(1) == "True"


def mirror_weights(run_dir, kimg, count, kl, weights_file):
    """fp16-cast the best network-snapshot pkl into the git tree (the only
    storage that survives VM restarts; the 533 MB orbax full-state copy in
    /tmp does not). scripts/restore_best_weights.py inverts this into a
    --resume-pkl-able snapshot. Safe to read: the metric line that triggers
    us is appended minutes after the pkl is fully written."""
    src = os.path.join(run_dir, f"network-snapshot-{kimg:06d}.pkl")
    if not os.path.isfile(src):
        print(f"weights mirror: {src} missing (pruned?)", flush=True)
        return False
    with open(src, "rb") as f:
        snap = pickle.load(f)
    snap = _cast_floats(snap, np.float16)
    snap["mirror_meta"] = {"count": count, "kl": kl, "kimg": kimg,
                           "src_run": run_dir, "dtype": "float16",
                           "g_loss_batched": run_g_loss_batched(run_dir),
                           "ts": time.time()}
    tmp = weights_file + ".tmp"
    os.makedirs(os.path.dirname(weights_file), exist_ok=True)
    with open(tmp, "wb") as f:
        pickle.dump(snap, f, protocol=4)
    os.replace(tmp, weights_file)
    sz = os.path.getsize(weights_file) // (1 << 20)
    print(f"weights-mirrored {count} modes @ {kimg} kimg -> "
          f"{weights_file} ({sz} MB fp16)", flush=True)
    return True


def commit_mirrors(paths, count, kimg):
    """git-commit the in-repo mirror files (best-effort, never raises).

    Restricted to the given paths so a concurrent interactive commit of
    other work is never swept in.
    """
    paths = [os.path.abspath(p) for p in paths if os.path.isfile(p)]
    if not paths:
        return
    step = "rev-parse"
    try:
        repo = subprocess.run(
            ["git", "-C", os.path.dirname(paths[0]), "rev-parse",
             "--show-toplevel"],
            check=True, capture_output=True, text=True,
            timeout=60).stdout.strip()
        step = "add"
        subprocess.run(["git", "-C", repo, "add", "--"] + paths,
                       check=True, capture_output=True, timeout=60)
        step = "commit"
        r = subprocess.run(
            ["git", "-C", repo, "commit",
             "-m", f"Mirror artifacts: {count}/1000 modes @ {kimg:.0f} kimg",
             "--"] + paths,
            capture_output=True, timeout=60)
        if r.returncode == 0:
            print(f"committed mirror ({count} modes @ {kimg:.0f} kimg)",
                  flush=True)
        # nonzero = nothing to commit or a lock race; both fine to skip
    except (OSError, subprocess.SubprocessError) as e:
        print(f"mirror git {step} failed ({e})", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--result-root", default="/root/repo/results")
    p.add_argument("--backup-dir", default="/tmp/exp/ckpt_backup")
    p.add_argument("--record-file",
                   default="/root/repo/artifacts/best_mode_counts.json",
                   help="in-repo (restart-surviving) copy of the best metric "
                        "record; bench.py falls back to it when results/ has "
                        "been wiped")
    p.add_argument("--weights-file",
                   default="/root/repo/artifacts/best_weights_fp16.pkl",
                   help="in-repo fp16 copy of the best (G,D,Gs) snapshot; "
                        "lets a later session resume near the peak after a "
                        "VM wipe (restore_best_weights.py)")
    p.add_argument("--weights-min-gain", type=int, default=10,
                   help="only rewrite the ~120 MB weights mirror when the "
                        "mode count improves by at least this much (each "
                        "committed rewrite grows git history)")
    p.add_argument("--target", type=int, default=997,
                   help="north-star mode count: any improvement at or above "
                        "this ALWAYS refreshes the weights mirror, min-gain "
                        "notwithstanding (the winning weights must land in "
                        "the git tree)")
    p.add_argument("--poll-sec", type=float, default=120.0)
    p.add_argument("--once", action="store_true")
    p.add_argument("--git-commit", action="store_true",
                   help="git-commit the in-repo mirrors after each refresh "
                        "(results/ and /tmp are wiped by VM restarts; only "
                        "COMMITTED bytes reliably survive)")
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

    weights_stamp = args.weights_file + ".json"
    weights_count, weights_kl = -1, float("inf")
    if os.path.isfile(weights_stamp) and os.path.isfile(args.weights_file):
        try:
            _st = json.load(open(weights_stamp))
            weights_count = int(_st.get("count", -1))
            weights_kl = float(_st.get("kl") or "inf")
        except (OSError, ValueError):
            weights_count = -1

    def _key(count, kl):
        """Ordering: higher count wins; KL (lower better) breaks ties —
        past the north star every snapshot counts 997+, and the 999 @602
        (KL 0.18) beats the 999 @502 (KL 0.28)."""
        return (count, -(kl if kl is not None else float("inf")))

    while True:
        entries = scan_runs(args.result_root)
        if entries:
            count, kl, kimg, run_dir = max(
                entries, key=lambda e: _key(e[0], e[1]))
            # metric record is durable in-repo and independent of whether the
            # checkpoint copy below succeeds (results/ and /tmp are both wiped
            # by VM restarts; only the git tree survives)
            if _key(count, kl) > _key((recorded or {}).get("count", -1),
                                      (recorded or {}).get("kl")):
                recorded = {"count": count, "kl": kl, "kimg": kimg,
                            "src_run": run_dir, "ts": time.time()}
                try:
                    os.makedirs(os.path.dirname(args.record_file),
                                exist_ok=True)
                    with open(args.record_file, "w") as f:
                        json.dump(recorded, f, indent=1)
                    print(f"recorded best {count} modes @ {kimg} kimg -> "
                          f"{args.record_file}", flush=True)
                    # the record is tiny: commit EVERY improvement, not just
                    # the hysteresis-gated weights refreshes below — only
                    # committed bytes survive a VM restart
                    if args.git_commit:
                        commit_mirrors([args.record_file], count, kimg)
                except OSError as e:
                    print(f"record write failed ({e})", flush=True)
            if (count >= weights_count + args.weights_min_gain
                    or (count >= args.target
                        and _key(count, kl) > _key(weights_count,
                                                   weights_kl))):
                try:
                    if mirror_weights(run_dir, kimg, count, kl,
                                      args.weights_file):
                        weights_count = count
                        weights_kl = kl if kl is not None else float("inf")
                        with open(weights_stamp, "w") as f:
                            json.dump({"count": count, "kl": kl,
                                       "kimg": kimg, "src_run": run_dir,
                                       "g_loss_batched":
                                           run_g_loss_batched(run_dir),
                                       "ts": time.time()}, f, indent=1)
                        if args.git_commit:
                            commit_mirrors([args.weights_file, weights_stamp,
                                            args.record_file], count, kimg)
                except (OSError, pickle.PickleError) as e:
                    print(f"weights mirror failed ({e}); will retry",
                          flush=True)
            already = mirrored and _key(mirrored.get("count", -1),
                                        mirrored.get("kl")) >= _key(count, kl)
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
