#!/usr/bin/env python3
"""Measure host-DCI index construction cost vs pool size and fit the power
law that `IMLEOrchestrator` uses to gate the `dci` fallback backend.

The exact device backend replaced DCI as the default (training/imle.py
module header), but `knn_backend="dci"` remains for feature pools beyond
the HBM budget — and round-1 measured the 240k-regime rebuild (2.4M x 128)
never finishing inside 50 min on this 1-core host. This script quantifies
that instead of hand-waving it: build times at several n, a fitted
t = c * n**p model, and the extrapolated 2.4M figure.

Usage: python3 scripts/bench_dci_build.py [--dim 128] [--sizes 8192,...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--sizes", default="8192,16384,32768,65536,131072")
    ap.add_argument("--num-comp", type=int, default=3)
    ap.add_argument("--num-simp", type=int, default=15)
    ap.add_argument("--num-levels", type=int, default=2)
    args = ap.parse_args()

    from inclusivegan_tpu.dci import DCI

    sizes = [int(s) for s in args.sizes.split(",")]
    rng = np.random.default_rng(0)
    rows = []
    for n in sizes:
        data = rng.standard_normal((n, args.dim))
        dci = DCI(args.dim, args.num_comp, args.num_simp, seed=1)
        t0 = time.perf_counter()
        dci.add(data, num_levels=args.num_levels)
        dt = time.perf_counter() - t0
        rows.append((n, dt))
        print(f"n={n:>8d}  build {dt:8.2f} s  ({n / dt:,.0f} pts/s)",
              flush=True)

    ns = np.log([r[0] for r in rows])
    ts = np.log([r[1] for r in rows])
    p, logc = np.polyfit(ns, ts, 1)
    c = float(np.exp(logc))
    print(f"\nfit: t = {c:.3e} * n**{p:.3f}")
    for target in (240_000 * 10,):
        est = c * target ** p
        print(f"extrapolated build at n={target:,}: {est:,.0f} s "
              f"({est / 60:.1f} min)")


if __name__ == "__main__":
    main()
