#!/usr/bin/env python3
"""Probe: NCHW vs NHWC conv layout on the real TPU at production G shapes.

BENCH_NOTES.md round-2 backlog lists an "NHWC layout experiment". Before
refactoring the whole model zoo (all tensors, mbstd, feature heads are NCHW),
measure whether XLA-TPU actually pays a transpose tax for logical-NCHW
`lax.conv_general_dilated` at our shapes: the mb-6 CelebA-128 synthesis stack
(3x3 modulated convs 512ch at 8-32px, 256ch at 64, 128ch at 128, bf16).

Timing fences are host fetches of program outputs (block_until_ready is
unreliable through the relay, BENCH_NOTES.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from inclusivegan_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

# (batch, cin, cout, hw) for every 3x3 conv in the 128px fmap_base=8<<10 G
SHAPES = [
    (6, 512, 512, 8), (6, 512, 512, 8),
    (6, 512, 512, 16), (6, 512, 512, 16),
    (6, 512, 512, 32), (6, 512, 512, 32),
    (6, 256, 256, 64), (6, 256, 256, 64),
    (6, 128, 128, 128), (6, 128, 128, 128),
]
DTYPE = jnp.bfloat16
REPS_IN_PROGRAM = 8  # chain convs inside one program to amortize dispatch


def chain(layout):
    dn = (("NCHW", "OIHW", "NCHW") if layout == "NCHW"
          else ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def run(xs, ws):
        outs = []
        for (x, w) in zip(xs, ws):
            for _ in range(REPS_IN_PROGRAM):
                y = lax.conv_general_dilated(
                    x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
                # keep shapes closed (cin != cout): fold back via 1x1 slice
                x = y[..., : x.shape[1], :, :] if layout == "NCHW" \
                    else y[..., : x.shape[3]]
            outs.append(jnp.sum(y.astype(jnp.float32)))
        return jnp.stack(outs)

    r = np.random.RandomState(0)
    xs, ws = [], []
    for (b, ci, co, hw) in SHAPES:
        if layout == "NCHW":
            xs.append(jnp.asarray(r.randn(b, ci, hw, hw), DTYPE))
            ws.append(jnp.asarray(r.randn(co, ci, 3, 3) / np.sqrt(9 * ci), DTYPE))
        else:
            xs.append(jnp.asarray(r.randn(b, hw, hw, ci), DTYPE))
            ws.append(jnp.asarray(r.randn(3, 3, ci, co) / np.sqrt(9 * ci), DTYPE))
    return run, xs, ws


def time_layout(layout, iters=24):
    run, xs, ws = chain(layout)
    out = run(xs, ws)
    np.asarray(out)  # compile + fence
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = run(xs, ws)
        np.asarray(out)
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    print(f"devices: {jax.devices()}")
    flops = sum(2 * b * ci * co * 9 * hw * hw for (b, ci, co, hw) in SHAPES
                ) * REPS_IN_PROGRAM
    for layout in ("NCHW", "NHWC", "NCHW"):  # repeat NCHW to bracket variance
        t = time_layout(layout)
        print(f"{layout}: {t*1e3:7.2f} ms/program  "
              f"{flops / t / 1e12:6.2f} TFLOP/s (bf16)")


if __name__ == "__main__":
    main()
