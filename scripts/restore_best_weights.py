#!/usr/bin/env python3
"""Rebuild a resumable network snapshot from the in-repo fp16 weights mirror.

Inverse of scripts/mirror_best_checkpoint.py::mirror_weights: reads
``artifacts/best_weights_fp16.pkl`` (the only best-checkpoint copy that
survives VM restarts — results/ and /tmp are both wiped), casts the
(G, D, Gs) params back to float32, and writes a
``network-snapshot-<kimg>.pkl`` plus a stub ``log.txt`` carrying the kimg
so ``training_loop(resume_pkl=...)`` resumes the counter correctly
(utils/misc.py::parse_kimg_time_from_log).

Adam moments / pl_mean / IMLE staleness are NOT in the mirror (they live
only in the 533 MB orbax copy under /tmp); a resume from this restores
weights + EMA + kimg and restarts the optimizer — the same semantics as the
reference's --resume-pkl (reference training_loop.py:191-194). Pair with
``--resume-staleness 1`` for prompt IMLE re-anchoring.

Usage:
    python3 scripts/restore_best_weights.py [--out-dir /tmp/exp/restore]
    # then: scripts/exp_stacked_mode_coverage.py ... \
    #           --resume-pkl <printed path> --resume-staleness 1
"""

import argparse
import json
import os
import pickle

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


def _cast_floats(tree, dtype):
    if isinstance(tree, dict):
        return {k: _cast_floats(v, dtype) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_cast_floats(v, dtype) for v in tree)
    if isinstance(tree, np.ndarray) and tree.dtype.kind == "f":
        return tree.astype(dtype)
    return tree


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights-file",
                   default="/root/repo/artifacts/best_weights_fp16.pkl")
    p.add_argument("--out-dir", default="/tmp/exp/restore")
    args = p.parse_args()

    with open(args.weights_file, "rb") as f:
        snap = pickle.load(f)
    meta = snap.pop("mirror_meta", {})
    kimg = int(meta.get("kimg", 0))
    snap = _cast_floats(snap, np.float32)

    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, f"network-snapshot-{kimg:06d}.pkl")
    with open(out + ".tmp", "wb") as f:
        pickle.dump(snap, f, protocol=4)
    os.replace(out + ".tmp", out)
    # stub tick line so parse_kimg_time_from_log recovers the counter
    with open(os.path.join(args.out_dir, "log.txt"), "w") as f:
        f.write(f"tick 0 kimg {kimg}.0 restored-from-mirror time 0s\n")
    print(json.dumps({"snapshot": out, "kimg": kimg,
                      "count": meta.get("count"), "kl": meta.get("kl"),
                      "src_run": meta.get("src_run")}, indent=1))
    print(f"\nresume with:\n  --resume-pkl {out} --resume-staleness 1")


if __name__ == "__main__":
    main()
