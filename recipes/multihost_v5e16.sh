#!/usr/bin/env bash
# Multi-host training launch for a TPU v5e-16 slice (2 hosts x 8 chips).
#
# The reference's only "distribution" is dead NCCL code
# (rnn_train.py:549-623); this is the working SPMD replacement: one
# process per host, jax.distributed auto-coordination from the TPU env,
# a 16-device dp mesh (gradient all-reduce over ICI, host boundary over
# DCN), host-sharded data loading.  Validated logic-level by
# tests/test_distributed.py (2 real processes, gloo CPU collectives);
# this script is the hardware launcher.
#
# Run ON EACH HOST of the slice (e.g. via gcloud compute tpus tpu-vm ssh
# --worker=all --command="bash recipes/multihost_v5e16.sh ..."):
#
#   recipes/multihost_v5e16.sh <train.lst> <dev.lst> <out_dir> [extra args]
#
# On TPU VMs jax.distributed.initialize() discovers the coordinator and
# process_id from the TPU runtime metadata, so no --coordinator flags are
# needed.  out_dir should be a shared filesystem (GCS fuse / NFS) —
# checkpoints are written by process 0 only.
#
# batch_size below is PER HOST: global batch = 64/host x 2 hosts = 128,
# sharded over all 16 chips (8 utterances per chip).
set -euo pipefail

train_lst=${1:?train filelist}
dev_lst=${2:?dev filelist}
out_dir=${3:?output dir}
shift 3

exec python -m percepnet_tpu train \
  --train-filelist "$train_lst" \
  --dev-filelist "$dev_lst" \
  --out-dir "$out_dir" \
  --distributed \
  --batch-size 64 \
  "$@"
