#!/usr/bin/env python3
"""Probe: d_step MXU tile fill at the production D shapes (VERDICT r4 item 7).

The r4 profile decomposition has d_step 88% conv but only ~0.66 tile fill:
the D trunk runs the fused fakes+reals batch of 24 (loss.d_main_loss shares
one D call) at 4-32px with <=512 channels, shapes the v5e MXU cannot tile
fully. Candidates measured here, adopted-or-declined with data:

  * NCHW vs NHWC logical layout of the exact D-trunk 3x3 chains (the G-shape
    probe, probe_conv_layout.py, found XLA-TPU layout assignment makes this
    irrelevant at mb6 G shapes — re-measured at the D batch/channel mix);
  * batch sensitivity (24 vs 48 vs 96): how much of the missing fill is
    batch-limited (larger per-chip batch = the large-batch recipe lever,
    artifacts/large_batch_recipe.json) vs spatially shape-limited.

D-trunk conv shapes from Discriminator(resolution=128, fmap_base=8<<10,
architecture='resnet') — reference networks_stylegan2.py:408-507.
Timing fences are host fetches (relay-safe, BENCH_NOTES.md).
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

# (cin, cout, hw) of every 3x3 conv in the production D trunk (Conv0 +
# Conv1_down per resnet block, stride handled as post-slice to keep the
# chain simple — FLOP-equivalent for fill purposes), batch supplied per run
SHAPES = [
    (128, 128, 128), (128, 256, 128),
    (256, 256, 64), (256, 512, 64),
    (512, 512, 32), (512, 512, 32),
    (512, 512, 16), (512, 512, 16),
    (512, 512, 8), (512, 512, 8),
    (513, 512, 4),
]
DTYPE = jnp.bfloat16
REPS_IN_PROGRAM = 8
V5E_BF16_PEAK_TFLOPS = 197.0


def chain(layout, batch):
    dn = (("NCHW", "OIHW", "NCHW") if layout == "NCHW"
          else ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def run(xs, ws):
        outs = []
        for (x, w) in zip(xs, ws):
            ci = x.shape[1] if layout == "NCHW" else x.shape[3]
            for _ in range(REPS_IN_PROGRAM):
                y = lax.conv_general_dilated(
                    x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
                # feed y back as the next rep's input: slice when co > ci,
                # channel-pad when co < ci (the 513-in mbstd layer)
                if layout == "NCHW":
                    if y.shape[1] < ci:
                        y_in = jnp.concatenate(
                            [y, y[:, : ci - y.shape[1]]], axis=1)
                    else:
                        y_in = y[:, :ci]
                else:
                    if y.shape[3] < ci:
                        y_in = jnp.concatenate(
                            [y, y[..., : ci - y.shape[3]]], axis=3)
                    else:
                        y_in = y[..., :ci]
                x = y_in
            outs.append(jnp.sum(y.astype(jnp.float32)))
        return jnp.stack(outs)

    r = np.random.RandomState(0)
    xs, ws = [], []
    for (ci, co, hw) in SHAPES:
        if layout == "NCHW":
            xs.append(jnp.asarray(r.randn(batch, ci, hw, hw), DTYPE))
            ws.append(jnp.asarray(r.randn(co, ci, 3, 3) / np.sqrt(9 * ci),
                                  DTYPE))
        else:
            xs.append(jnp.asarray(r.randn(batch, hw, hw, ci), DTYPE))
            ws.append(jnp.asarray(r.randn(3, 3, ci, co) / np.sqrt(9 * ci),
                                  DTYPE))
    return run, xs, ws


def time_chain(layout, batch, iters=16):
    run, xs, ws = chain(layout, batch)
    np.asarray(run(xs, ws))  # compile + fence
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
    for batch in (24, 48, 96):
        flops = sum(2 * batch * ci * co * 9 * hw * hw
                    for (ci, co, hw) in SHAPES) * REPS_IN_PROGRAM
        # NCHW repeated to bracket run-to-run variance
        for layout in ("NCHW", "NHWC", "NCHW"):
            t = time_chain(layout, batch)
            tf = flops / t / 1e12
            print(f"b{batch:3d} {layout}: {t*1e3:7.2f} ms/program  "
                  f"{tf:6.2f} TFLOP/s  ({tf / V5E_BF16_PEAK_TFLOPS:.0%} of "
                  "v5e bf16 peak)", flush=True)


if __name__ == "__main__":
    main()
