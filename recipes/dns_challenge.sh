#!/usr/bin/env bash
# End-to-end DNS-Challenge recipe: the TPU-native equivalent of the
# reference utils/run.sh 5-stage pipeline (run.sh:46-151).
#
# Stage 1  prepare:   convert DNS wavs to 48 kHz mono s16 raw (sox)
# Stage 2  featgen:   batched feature/label generation on the accelerator
#                     (replaces the 8-process percepNet binary fan-out)
# Stage 3  split:     80/20 train/dev filelists
# Stage 4  train:     SPMD training (python -m percepnet_tpu train)
# Stage 5  export:    weights -> native .npz + nnet_data.cpp for the C++
#                     runtime (replaces dump_percepnet.py)
#
# Usage: recipes/dns_challenge.sh <dns_clean_dir> <dns_noisy_dir> <workdir> [stage]
set -euo pipefail

clean_dir=${1:?clean wav dir}
noisy_dir=${2:?noisy wav dir}
work=${3:?work dir}
stage=${4:-1}

frames_per_utt=2000     # run.sh:32 (20 s utterances)
mkdir -p "$work"/{pcm,feats,lists,exp}

if [ "$stage" -le 1 ]; then
  echo "== stage 1: wav -> 48k mono s16 raw"
  for d in "$clean_dir" "$noisy_dir"; do
    sub=$(basename "$d")
    mkdir -p "$work/pcm/$sub"
    for f in "$d"/*.wav; do
      out="$work/pcm/$sub/$(basename "${f%.wav}").pcm"
      [ -f "$out" ] || sox "$f" -r 48000 -c 1 -b 16 -t raw "$out"
    done
  done
fi

if [ "$stage" -le 2 ]; then
  echo "== stage 2: feature/label generation"
  : > "$work/pairs.txt"
  for c in "$work/pcm/$(basename "$clean_dir")"/*.pcm; do
    id=$(basename "$c")
    n="$work/pcm/$(basename "$noisy_dir")/$id"
    [ -f "$n" ] && echo "$c $n $frames_per_utt" >> "$work/pairs.txt"
  done
  # AUGMENT=1 adds the per-pair random level gain + biquad channel
  # response (the reference's dormant augmentation, denoise.cpp:670-718);
  # draws are seeded per pair index, so shards stay consistent
  python -m percepnet_tpu featgen --pairs-file "$work/pairs.txt" \
      --out-dir "$work/feats" ${AUGMENT:+--augment}
fi

if [ "$stage" -le 3 ]; then
  echo "== stage 3: train/dev split"
  python -m percepnet_tpu split-dataset "$work/feats" \
      --out-dir "$work/lists" --frac 0.8
fi

if [ "$stage" -le 4 ]; then
  echo "== stage 4: training"
  python -m percepnet_tpu train \
      --train-filelist "$work/lists/train_filelist.txt" \
      --dev-filelist "$work/lists/dev_filelist.txt" \
      --config configs/dns_challenge.yaml \
      --out-dir "$work/exp"
fi

if [ "$stage" -le 5 ]; then
  echo "== stage 5: export"
  ckpt=$(ls -v "$work/exp"/checkpoint-*.npz | tail -1)
  python -m percepnet_tpu export "$ckpt" "$work/exp/percepnet_weights.npz"
  python -m percepnet_tpu export "$ckpt" "$work/exp/nnet_data.cpp"
  echo "weights: $work/exp/percepnet_weights.npz"
fi
