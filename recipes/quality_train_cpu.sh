#!/usr/bin/env bash
# CPU fallback for recipes/quality_train.sh — a tunnel-outage hedge.
#
# When the remote-TPU tunnel is down for hours (observed: >19 h on
# 8/17-18), the full quality recipe (64x2000 x 30k steps, ~6 TFLOP/step)
# is unreachable: this host has ONE CPU core (~20 s per 16k-frame step).
# This script runs the largest fine-tune that fits a workday on that
# core instead of producing nothing:
#
#   * warm-start from the best raw-feature checkpoint (its GRU stack and
#     heads carry 12k steps of training; its input stack is bit-identical
#     to init because of the saturation bug — README "Training results" —
#     so nothing is lost by switching the input transform under it)
#   * both quality fixes at once (log1p compression + linear gain MSE),
#     since there is no budget for two stages
#   * reduced shape (batch 16, seq 1000 = 10 s of context, plenty for
#     PercepNet's sub-second temporal receptive field) and the native
#     C++ prefetch loader (--device-data-mb 0) so RAM stays small
#
# Checkpoints land every 200 steps; gate any of them with
#   python tools/quality_gate.py --weights <ckpt> --log1p ...
# The TPU recipe supersedes this whenever the tunnel returns — different
# out_dir, no interference.
#
# Usage: recipes/quality_train_cpu.sh <workdir> [pretrain_ckpt] [max_steps]
set -uo pipefail

work=${1:?work dir (e.g. work/dns)}
pretrain=${2:-$work/exp8k/checkpoint-12000.npz}
max_steps=${3:-3000}

export PERCEPNET_PLATFORM=cpu
exec python -m percepnet_tpu train \
  --train-filelist "$work/lists/train_filelist.txt" \
  --config configs/dns_log1p_cpu.yaml \
  --out-dir "$work/exp_log1p_cpu" \
  --pretrain "$pretrain" \
  --max-steps "$max_steps" \
  --device-data-mb 0
