#!/usr/bin/env python3
"""Mirror quality-loop metric outputs into the git tree.

results/ is wiped by VM restarts (RUNBOOK.md), so every at-registry-size
metric number must be copied somewhere durable the moment it exists —
round 2 lost its ls number exactly this way (VERDICT r2 "What's weak" #2).
This scans run dirs for ``metric-*.txt`` lines and ``IvOM`` log lines
(reference artifact formats: metrics/metric_base.py::_report_result,
run_projector.py:74) and merges them into a JSON digest under artifacts/,
keyed by metric name; re-runs update in place, and every raw line is kept
with its source so numbers stay attributable.

Usage:
    python3 scripts/record_quality_digest.py results/00001-* results/00002-* \
        [--out artifacts/celeba_quality_digest.json] [--note "..."]
"""

import argparse
import datetime
import glob
import json
import os
import re


def parse_metric_file(path):
    """metric-<name>.txt lines → list of {snapshot, time, columns{}}."""
    rows = []
    with open(path) as f:
        for line in f:
            m = re.match(r"^(\S+)\s+time\s+(\S+)\s+(.*)$", line.strip())
            if not m:
                continue
            cols = {}
            for cm in re.finditer(r"(\S+)\s+([-+0-9.eE]+(?:\b|$))",
                                  m.group(3)):
                try:
                    cols[cm.group(1)] = float(cm.group(2))
                except ValueError:
                    pass
            rows.append({"snapshot": m.group(1), "time": m.group(2),
                         "columns": cols})
    return rows


def parse_ivom(log_path):
    out = []
    with open(log_path) as f:
        for line in f:
            m = re.search(r"IvOM \(LPIPS after (\d+) steps over (\d+).*?:\s*"
                          r"([0-9.eE]+(?:[+-][0-9]+)?)\s*(?:±|\+-)\s*"
                          r"([0-9.eE]+(?:[+-][0-9]+)?)", line)
            if m:
                out.append({"steps": int(m.group(1)),
                            "images": int(m.group(2)),
                            "mean": float(m.group(3)),
                            "std": float(m.group(4))})
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("run_dirs", nargs="+")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "celeba_quality_digest.json"))
    ap.add_argument("--note", default=None)
    args = ap.parse_args()

    digest = {"metrics": {}, "ivom": [], "notes": []}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                digest = json.load(f)
        except ValueError:
            pass
    digest.setdefault("metrics", {})
    digest.setdefault("ivom", [])
    digest.setdefault("notes", [])

    now = datetime.datetime.now(
        datetime.timezone.utc).isoformat(timespec="seconds")
    for pattern in args.run_dirs:
        for run_dir in sorted(glob.glob(pattern)):
            for mf in sorted(glob.glob(os.path.join(run_dir,
                                                    "metric-*.txt"))):
                name = os.path.basename(mf)[len("metric-"):-len(".txt")]
                rows = parse_metric_file(mf)
                if not rows:
                    continue
                entry = digest["metrics"].setdefault(name, {"records": []})
                seen = {(r["source"], r["snapshot"],
                         json.dumps(r["columns"], sort_keys=True))
                        for r in entry["records"]}
                for row in rows:
                    key = (run_dir, row["snapshot"],
                           json.dumps(row["columns"], sort_keys=True))
                    if key in seen:
                        continue
                    entry["records"].append({
                        "source": run_dir, "snapshot": row["snapshot"],
                        "columns": row["columns"], "recorded_utc": now})
            log = os.path.join(run_dir, "log.txt")
            if os.path.exists(log):
                for iv in parse_ivom(log):
                    rec = dict(iv, source=run_dir, recorded_utc=now)
                    if not any(r.get("source") == run_dir
                               and r.get("mean") == iv["mean"]
                               for r in digest["ivom"]):
                        digest["ivom"].append(rec)
    if args.note:
        digest["notes"].append({"note": args.note, "recorded_utc": now})

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out + ".tmp", "w") as f:
        json.dump(digest, f, indent=1)
        f.write("\n")
    os.replace(args.out + ".tmp", args.out)
    n = sum(len(v["records"]) for v in digest["metrics"].values())
    print(f"{args.out}: {len(digest['metrics'])} metrics, {n} records, "
          f"{len(digest['ivom'])} IvOM entries")


if __name__ == "__main__":
    main()
