#!/usr/bin/env python3
"""fp16-mirror any network snapshot pkl into the git tree.

Generalizes the stacked-MNIST mirror sidecar's weights mirror
(scripts/mirror_best_checkpoint.py::mirror_weights) to arbitrary snapshots —
used by the CelebA quality loop to make its best-FID snapshot survive VM
restarts the way the mode-coverage artifact does, so post-hoc metrics
(ls/ppl/is re-runs, bf16-vs-fp32 comparisons) never lose their subject
again. scripts/restore_best_weights.py --weights-file <out> inverts it.

Usage: python3 scripts/mirror_snapshot.py SRC_PKL OUT_PKL [--meta k=v ...]
"""

import argparse
import json
import os
import pickle
import re
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
import numpy as np  # noqa: E402


def _cast_floats(tree, dtype):
    if isinstance(tree, dict):
        return {k: _cast_floats(v, dtype) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_cast_floats(v, dtype) for v in tree)
    if isinstance(tree, np.ndarray) and tree.dtype.kind == "f":
        return tree.astype(dtype)
    return tree


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("src")
    ap.add_argument("out")
    ap.add_argument("--meta", nargs="*", default=[],
                    help="extra k=v pairs recorded in mirror_meta")
    args = ap.parse_args()

    with open(args.src, "rb") as f:
        snap = pickle.load(f)
    snap = _cast_floats(snap, np.float16)
    m = re.search(r"network-snapshot-(\d+)", os.path.basename(args.src))
    meta = {"kimg": int(m.group(1)) if m else 0,
            "src_pkl": os.path.abspath(args.src),
            "src_run": os.path.dirname(os.path.abspath(args.src)),
            "dtype": "float16", "ts": time.time()}
    for kv in args.meta:
        k, _, v = kv.partition("=")
        meta[k] = v
    snap["mirror_meta"] = meta
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out + ".tmp", "wb") as f:
        pickle.dump(snap, f, protocol=4)
    os.replace(args.out + ".tmp", args.out)
    with open(args.out + ".json", "w") as f:
        json.dump(meta, f, indent=1)
        f.write("\n")
    print(f"{args.out}: {os.path.getsize(args.out) >> 20} MB fp16 "
          f"(kimg {meta['kimg']})")


if __name__ == "__main__":
    main()
