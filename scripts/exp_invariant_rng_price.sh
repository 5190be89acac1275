#!/bin/bash
# Clean re-measure of the --invariant-rng price (VERDICT r4 item 6): the r4
# pair carried one relay-noise outlier tick (15.07 s/kimg among 9.6-10.9),
# leaving the price ambiguous between +5% and +17%. Protocol identical to
# BENCH_NOTES r4: the production CelebA-128 recipe (config-e-Gskip-Dresnet,
# bf16, fused-G default, Pallas FIR, mb6), short windows, control first then
# --invariant-rng true, SAME session back-to-back; report every steady tick
# so outliers are visible rather than excluded silently.
#
# Usage: bash scripts/exp_invariant_rng_price.sh   (chip must be idle)
set -euo pipefail
cd "$(dirname "$0")/.."

DATA_DIR=${DATA_DIR:-/tmp/exp/datasets}
DATASET=${DATASET:-celeba_synth_30k}
KIMG=${KIMG:-8}
LPIPS_NPZ=${LPIPS_NPZ:-/tmp/exp/celeba_perceptual_vgg.npz}
RESULT_DIR=${RESULT_DIR:-results}

run_arm () {  # $1 = arm name, $2 = extra flags
  echo "== arm: $1 =="
  # shellcheck disable=SC2086
  python3 run_training.py --data-dir "$DATA_DIR" --dataset "$DATASET" \
    --config config-e-Gskip-Dresnet --num-gpus 1 --data-size 30000 \
    --num-epochs 1 --total-kimg "$KIMG" --metrics "" \
    --mirror-augment true --init-proj-dim 512 --candidate-batch-size 1024 \
    --lpips-weights "$LPIPS_NPZ" --dtype bfloat16 \
    --result-dir "$RESULT_DIR" $2 2>&1 | tail -4
  RUN_DIR=$(ls -d "$RESULT_DIR"/*-celeba_synth_30k* 2>/dev/null | tail -1)
  echo "--- $1 ticks ($RUN_DIR):"
  grep -E "^tick" "$RUN_DIR/log.txt" | awk '{print $1, $2, $(NF-1), $NF}'
}

run_arm control ""
run_arm invariant "--invariant-rng true"
echo "== done: compare sec/kimg of steady ticks (skip tick 0 = compile) =="
