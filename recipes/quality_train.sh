#!/usr/bin/env bash
# Two-stage quality training recipe: the reference recipe with both
# measured training pathologies fixed (README "Training results"):
#
# Stage 1  train configs/dns_log1p.yaml        log1p feature compression
#                                              (unfreezes the input stack)
# Stage 2  train configs/dns_log1p_lin.yaml    + linear-gain MSE term,
#                                              warm-started from stage 1
# Stage 3  gate   tools/quality_gate.py        low-SNR dev pairs, f32+bf16
#
# Designed for an unreliable remote-TPU tunnel: each training stage runs
# under a supervisor retry loop (a restart resumes from the last
# checkpoint), and the optional wait-for-TPU prelude blocks until the
# chip answers, so the whole recipe can be launched unattended while the
# tunnel is down.
#
# The resulting models are NOT exportable to the C++ runtime (its
# compute_rnn has no input transform); serve with
# `python -m percepnet_tpu enhance --log1p --raw-scale`.
#
# Usage: recipes/quality_train.sh <workdir> [--wait-tpu]
#   <workdir> must contain feats/ + lists/{train,dev}_filelist.txt and
#   clean/ noisy/ pcm dirs (see recipes/dns_challenge.sh stages 1-3).
set -uo pipefail

work=${1:?work dir (e.g. work/dns)}
shift || true

if [ "${1:-}" = "--wait-tpu" ]; then
  echo "== waiting for the TPU tunnel"
  until timeout 300 python -c '
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
print("TPU OK", jax.devices(), flush=True)'; do
    echo "tunnel down, retry $(date)"
    sleep 120
  done
fi

supervise() {  # supervise <out_dir> <config> [extra args...]
  local out=$1 cfg=$2; shift 2
  local rc=1
  for attempt in $(seq 1 20); do
    echo "== $out attempt $attempt $(date)"
    timeout 14400 python -m percepnet_tpu train \
      --train-filelist "$work/lists/train_filelist.txt" \
      --dev-filelist "$work/lists/dev_filelist.txt" \
      --config "$cfg" --out-dir "$out" \
      --device-data-mb 9216 "$@"
    rc=$?
    [ $rc -eq 0 ] && break
    echo "== $out exited $rc; resuming from last checkpoint"
    sleep 30
  done
  return $rc
}

latest() {
  ls "$1"/checkpoint-*.npz 2>/dev/null \
    | sed 's/.*checkpoint-//; s/\.npz//' | sort -n | tail -1
}

echo "== stage 1: log1p recipe"
supervise "$work/exp_log1p" configs/dns_log1p.yaml || exit 1

s1=$(latest "$work/exp_log1p")
echo "== stage 2: + gain MSE, warm-start from checkpoint-$s1"
supervise "$work/exp_log1p_lin" configs/dns_log1p_lin.yaml \
  --pretrain "$work/exp_log1p/checkpoint-$s1.npz" || exit 1

echo "== stage 3: quality gates (low-SNR dev pairs)"
for exp in exp_log1p exp_log1p_lin; do
  c=$(latest "$work/$exp")
  python tools/quality_gate.py \
    --weights "$work/$exp/checkpoint-$c.npz" \
    --clean-dir "$work/clean" --noisy-dir "$work/noisy" \
    --dev-filelist "$work/lists/dev_filelist.txt" \
    --limit 6 --order snr --log1p | tee "$work/$exp/quality.json"
done
