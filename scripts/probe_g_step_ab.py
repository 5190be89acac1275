#!/usr/bin/env python3
"""A/B the two candidate g-phase optimizations at the reference batch size
(VERDICT r1 item 4: close the mb6 utilization gap or record why not).

Variants, all at the production CelebA-128 config-e shape (bench.py):
  base     — shipping configuration (plain-jnp bias-act, 4 G forwards)
  batched  — TrainConfig.g_loss_batched=True: rec1/rec2/interp/adv latents
             concatenated into ONE G forward + ONE LPIPS pass
  pallas   — INCLUSIVEGAN_TPU_BIAS_ACT_IMPL=pallas: the Pallas lrelu
             bias-act kernel in every 4-D activation of G and D

Times three iteration kinds per variant (plain, +G-reg, +D-reg) so the
per-phase costs fall out by subtraction, then reports the reg-cadence
throughput (G/4, D/16). Run on an idle chip — the relay serves one client.

Usage: python3 scripts/probe_g_step_ab.py [--variants base,batched,pallas]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from inclusivegan_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()


def bench_variant(name, *, batched, bias_impl, fir_impl="conv", iters=24,
                  mb_per_chip=6, lpips_f32=False, lpips_norm="f32",
                  grad_accum_rounds=1):
    os.environ["INCLUSIVEGAN_TPU_BIAS_ACT_IMPL"] = bias_impl
    os.environ["INCLUSIVEGAN_TPU_UPFIRDN_IMPL"] = fir_impl
    os.environ["INCLUSIVEGAN_TPU_LPIPS_NORM"] = lpips_norm
    import jax
    import jax.numpy as jnp
    from inclusivegan_tpu.models import Discriminator, GMain
    from inclusivegan_tpu.models.lpips import init_lpips_params
    from inclusivegan_tpu.parallel import make_data_mesh, shard_batch
    from inclusivegan_tpu.training.train_state import create_train_state
    from inclusivegan_tpu.training.train_step import (TrainConfig,
                                                      make_train_step)

    res, zdim = 128, 512
    n_dev = len(jax.devices())
    mb = mb_per_chip * n_dev
    dtype = jnp.bfloat16

    G = GMain.create(resolution=res, num_channels=3, latent_size=zdim,
                     dlatent_size=zdim, fmap_base=8 << 10,
                     architecture="skip", dtype=dtype)
    D = Discriminator(resolution=res, num_channels=3, fmap_base=8 << 10,
                      architecture="resnet", mbstd_group_size=6, dtype=dtype)
    mesh = make_data_mesh()
    state = create_train_state(jax.random.key(0), G, D)
    step = make_train_step(G, D, init_lpips_params(seed=1), mesh,
                           TrainConfig(gamma=100.0,
                                       lpips_dtype=(jnp.float32 if lpips_f32
                                                    else dtype),
                                       lpips_norm=lpips_norm,
                                       g_loss_batched=batched,
                                       grad_accum_rounds=grad_accum_rounds,
                                       donate_state=True))

    r = np.random.RandomState(0)

    def batch():
        return shard_batch(mesh, {
            "reals_rec_1": r.randint(0, 256, (mb, 3, res, res), dtype=np.int32).astype(np.uint8),
            "latents_rec_1": r.randn(mb, zdim).astype(np.float32),
            "labels_rec_1": np.zeros((mb, 0), np.float32),
            "reals_rec_2": r.randint(0, 256, (mb, 3, res, res), dtype=np.int32).astype(np.uint8),
            "latents_rec_2": r.randn(mb, zdim).astype(np.float32),
            "labels_rec_2": np.zeros((mb, 0), np.float32),
            "reals": r.randint(0, 256, (2 * mb, 3, res, res), dtype=np.int32).astype(np.uint8),
            "labels": np.zeros((2 * mb, 0), np.float32),
        })

    from inclusivegan_tpu.data.dataset import Prefetcher
    pre = Prefetcher(batch, depth=2)
    key = jax.random.key(1)
    lr = jnp.float32(0.002)
    gs_beta = jnp.float32(0.5 ** (mb / 10000.0))

    def fence(s):
        return float(jnp.sum(s.g_params["synthesis"]["4x4"]["Conv"]["bias"]))

    def run(state, iters, g_reg, d_reg):
        nonlocal key
        for _ in range(iters):
            key, k = jax.random.split(key)
            state, _ = step(state, pre.get(), k, lr, lr, gs_beta,
                            do_g_reg=g_reg, do_d_reg=d_reg)
        fence(state)
        return state

    # compile all 4 phase programs + settle the relay
    t0 = time.time()
    state = run(state, 2, True, True)
    state = run(state, 4, False, False)
    compile_s = time.time() - t0

    out = {"variant": name, "devices": n_dev, "mb_per_chip": mb_per_chip,
           "compile_s": round(compile_s, 1)}
    for kind, g_reg, d_reg in (("plain", False, False),
                               ("greg", True, False),
                               ("dreg", False, True)):
        best = np.inf
        for _ in range(2):
            t0 = time.time()
            state = run(state, iters, g_reg, d_reg)
            best = min(best, (time.time() - t0) / iters)
        out[f"ms_{kind}"] = round(best * 1000, 1)
    # reg-cadence imgs/sec (G/4, D/16 — 16-iteration cycle has 4 g_regs,
    # 1 d_reg, 11 plain)
    cycle = 11 * out["ms_plain"] + 4 * out["ms_greg"] + out["ms_dreg"]
    out["imgs_per_sec_per_chip"] = round(16 * mb / (cycle / 1000) / n_dev, 2)
    pre.close()
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,batched,pallas")
    ap.add_argument("--mb", type=int, default=6,
                    help="minibatch per chip (6 = reference semantics; 24 = "
                         "the large-batch recipe candidate, VERDICT r2 item 3)")
    args = ap.parse_args()
    cfgs = {
        "base": dict(batched=False, bias_impl="jax"),
        "batched": dict(batched=True, bias_impl="jax"),
        "pallas": dict(batched=False, bias_impl="pallas"),
        "batched+pallas": dict(batched=True, bias_impl="pallas"),
        # standalone skip-path FIR resamples through the Pallas kernel
        "pallas-fir": dict(batched=False, bias_impl="jax", fir_impl="pallas"),
        "pallas-all": dict(batched=False, bias_impl="pallas",
                           fir_impl="pallas"),
        # round-4 profile-driven A/Bs, both under the SHIPPING TPU default
        # (pallas FIR) so deltas compose with the adopted kernel:
        # g_loss_batched re-test (VERDICT r3 item 5 candidate)
        "fir+batched": dict(batched=True, bias_impl="jax",
                            fir_impl="pallas"),
        # price of the bf16 LPIPS trunk default (fp32 trunk comparison)
        "fir+lpips-f32": dict(batched=False, bias_impl="jax",
                              fir_impl="pallas", lpips_f32=True),
        # candidate: channel-normalize in the trunk dtype (no f32 map
        # materialization, lpips.py::_normalize_channels_trunk_dtype)
        # on top of the shipping batched+FIR defaults
        "batched+norm-trunk": dict(batched=True, bias_impl="jax",
                                   fir_impl="pallas", lpips_norm="trunk"),
        # control measured in the same process order
        "batched-ctl": dict(batched=True, bias_impl="jax",
                            fir_impl="pallas"),
        # VERDICT r4 item 5: grad_accum_rounds>1 has never touched TPU
        # silicon — lax.scan microbatching over rounds of mb/rounds at the
        # SAME per-chip batch (matched global batch vs the ctl arm's
        # single round). Scalars finite + throughput recorded is the bar.
        "batched+accum2": dict(batched=True, bias_impl="jax",
                               fir_impl="pallas", grad_accum_rounds=2),
        "batched+accum4": dict(batched=True, bias_impl="jax",
                               fir_impl="pallas", grad_accum_rounds=4),
    }
    for v in args.variants.split(","):
        try:
            bench_variant(v, mb_per_chip=args.mb, **cfgs[v])
        except Exception as e:  # keep measuring the remaining variants
            print(json.dumps({"variant": v, "error":
                              f"{type(e).__name__}: {e}"[:300]}), flush=True)


if __name__ == "__main__":
    main()
