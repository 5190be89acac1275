#!/usr/bin/env python3
"""Pick the best (lowest-FID) network snapshot from a training run dir.

The in-training metric evaluations append one line per snapshot to
``<run_dir>/metric-<name>.txt`` (metrics/metric_base.py::get_result_str):

    network-snapshot-000152        time 115.2        fid30k 2.0600

The reference's practice — and the paper's reported numbers — evaluate the
best snapshot of a run, not the last one (late-training D overfitting on a
30k corpus can regress final FID by 10x while earlier snapshots are strong;
measured in BENCH_NOTES.md "CelebA-128 quality loop": 2.06 @152 kimg vs
21.4 @240 kimg final). This helper scans the trajectory and prints the path
of the best still-on-disk snapshot pkl, falling back to the final snapshot
when no metric lines or pkls exist.

Usage: python3 scripts/select_best_snapshot.py RUN_DIR [--metric fid30k]
Prints the chosen pkl path on stdout (and the trajectory on stderr).
"""

import argparse
import os
import re
import sys


def best_snapshot(run_dir, metric="fid30k", lower_is_better=True):
    """Return (pkl_path, value) of the best snapshot, or (final, None)."""
    # word boundary before the metric name: without it "--metric recall"
    # would also match the "pr50k3_recall" column of a different metric,
    # and suffix-only metrics (pr50k3 writes pr50k3_precision/_recall,
    # never bare "pr50k3") must NOT silently fall through to the final
    # snapshot — warn below instead
    pattern = re.compile(
        r"^(?P<name>\S+)\s+time\s+\S+.*?\s" + re.escape(metric) +
        r"\s+(?P<value>[-+0-9.eE]+)")
    candidates = []
    path = os.path.join(run_dir, f"metric-{metric}.txt")
    if not os.path.exists(path):
        # suffixed columns live in the base metric's file: pr50k3_recall
        # is a column of metric-pr50k3.txt (metric_base._report_result
        # suffix= path) — fall back to the longest base-name prefix match
        import glob
        bases = [p for p in glob.glob(os.path.join(run_dir, "metric-*.txt"))
                 if metric.startswith(
                     os.path.basename(p)[len("metric-"):-len(".txt")])]
        if bases:
            path = max(bases, key=len)
    if os.path.exists(path):
        n_lines = 0
        with open(path) as f:
            for line in f:
                n_lines += 1
                m = pattern.match(line)
                if not m:
                    continue
                pkl = os.path.join(run_dir, m.group("name") + ".pkl")
                if os.path.exists(pkl):
                    candidates.append((float(m.group("value")), pkl))
                else:
                    print(f"# skipped (pkl gone): {line.strip()}",
                          file=sys.stderr)
        if n_lines and not candidates:
            print(f"# warning: {path} has {n_lines} lines but none parsed "
                  f"as a bare '{metric}' column (suffixed-only metric? "
                  f"pkls deleted?) — falling back to the final snapshot",
                  file=sys.stderr)
    if candidates:
        value, pkl = (min if lower_is_better else max)(candidates)
        return pkl, value
    final = os.path.join(run_dir, "network-final.pkl")
    if not os.path.exists(final):
        raise SystemExit(
            f"error: no usable {metric} trajectory in {run_dir} and the "
            f"final-snapshot fallback {final} does not exist — wrong "
            f"RUN_DIR?")
    return final, None


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("run_dir")
    ap.add_argument("--metric", default="fid30k")
    ap.add_argument("--higher-is-better", action="store_true",
                    help="pick the max instead of the min (e.g. recall)")
    args = ap.parse_args()
    pkl, value = best_snapshot(args.run_dir, args.metric,
                               lower_is_better=not args.higher_is_better)
    if value is not None:
        print(f"# best {args.metric} {value:g}: {pkl}", file=sys.stderr)
    else:
        print(f"# no {args.metric} trajectory; using final snapshot",
              file=sys.stderr)
    print(pkl)


if __name__ == "__main__":
    main()
