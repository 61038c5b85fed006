#!/bin/bash
# Self-sufficient TPU execution orchestrator (round-5 revision of
# recipes/r4_tpu_orchestrator.sh): survives a VM replacement that wipes
# work/ and /tmp (observed 8/18 and again 8/19 — compile caches, the
# synthetic corpus, features and all checkpoints deleted mid-round).
# Priority order, one chip holder at a time:
#   0. background CPU corpus regen (tools/synth_dns.py) when clean/noisy
#      are missing — runs while the TPU stages compile, ~4 s/pair on the
#      single host core
#   A. bench.py bf16 + --f32        (driver-verified >=10k audio-s/s)
#   B. tools/check_tpu.py           (Pallas/TPU dispatch re-validation)
#   B2. tools/profile_pipeline.py   (f32 stage profile evidence)
#   C. streaming --report-latency   (<=2.0 ms/frame target, f32 + bf16)
#   D0. featgen on the TPU + train/dev split when feats/lists missing
#       (~0.3 s per 20 s pair batched, vs hours on the CPU)
#   D. quality training: full two-stage recipe if the budget allows,
#      else the combined fast config (configs/dns_log1p_tpu_fast.yaml)
#   E. gate the newest exp_log1p* checkpoint; a PASSING checkpoint is
#      copied into artifacts/ so a later `git add` can make it survive
#      the next wipe
# All output to /tmp/r5_*.{json,log}; safe to re-run (training resumes
# from checkpoints, synth/featgen skip existing files).
set -uo pipefail
cd /root/repo
echo "== orchestrator start $(date -u)"

WORK=${WORK:-work/dns}
SYNTH_PAIRS=${SYNTH_PAIRS:-2000}   # ~2.2 h of background CPU at 4 s/pair
FRAMES_PER_UTT=2000                # 20 s at 48 kHz / 480-sample frames

# Chip is single-tenant and the driver benches at round end: derive the
# round start from the LAST PROGRESS tick's (ts - wall_s) — wall_s resets
# when the driver restarts — and keep a 25 min margin so the chip is free
# for the driver's bench.  Round length via ROUND_SECS (default 5 h).
DEADLINE=$(python3 - <<PY
import json, os, sys, time
round_secs = int(os.environ.get("ROUND_SECS", 5 * 3600))
ticks = [json.loads(l) for l in open("PROGRESS.jsonl")
         if '"round"' in l]
last = ticks[-1]
start = last["ts"] - last["wall_s"]
# A tick written before a driver restart belongs to the PREVIOUS round:
# trusting it would make the budget hugely negative (or stale).  Fall
# back to "now" as the round start when the derived start is too old.
if time.time() - start > round_secs:
    print(f"WARN: stale PROGRESS tick (round start {int(start)} is "
          f"> ROUND_SECS ago); using now as round start", file=sys.stderr)
    start = time.time()
print(int(start) + round_secs - 1500)
PY
)
budget() { echo $(( DEADLINE - $(date +%s) )); }
echo "deadline $(date -u -d @$DEADLINE 2>/dev/null || echo @$DEADLINE), budget $(budget)s"

# run_group <budget_s> <logfile> <cmd...>: own process group, TERM then
# KILL the whole group at the budget (the trainer checkpoints on SIGTERM).
run_group() {
  local bud=$1 logf=$2; shift 2
  setsid "$@" > "$logf" 2>&1 &
  local gpid=$!
  ( sleep "$bud"; kill -TERM -- -"$gpid" 2>/dev/null
    sleep 120;    kill -KILL -- -"$gpid" 2>/dev/null ) &
  local wpid=$!
  wait "$gpid"; local rc=$?
  kill "$wpid" 2>/dev/null; wait "$wpid" 2>/dev/null
  return $rc
}

echo "== 0: corpus (CPU, background)"
SYNTH_PID=""
# A synth killed mid-pair can leave a truncated clean pcm or a clean
# without its noisy twin; drop any incomplete pairs BEFORE counting so
# they are regenerated rather than silently excluded forever, and resume
# from max(fileid)+1 (not the file count) so non-contiguous ids never
# collide with existing pairs.
next_idx=$(python3 - "$WORK" <<'PY'
import glob, os, re, sys
work = sys.argv[1]
hi = -1
for c in glob.glob(os.path.join(work, "clean", "fileid_*.pcm")):
    i = int(re.search(r"fileid_(\d+)\.pcm$", c).group(1))
    n = os.path.join(work, "noisy", f"fileid_{i}.pcm")
    if not (os.path.isfile(n)
            and os.path.getsize(n) == os.path.getsize(c) > 0):
        for p in (c, n):
            if os.path.isfile(p):
                os.remove(p)
        print(f"dropped incomplete pair fileid_{i}", file=sys.stderr)
        continue
    hi = max(hi, i)
print(hi + 1)
PY
)
n_clean=$(ls "$WORK"/clean/fileid_*.pcm 2>/dev/null | wc -l)
if [ "$next_idx" -lt "$SYNTH_PAIRS" ]; then
  mkdir -p "$WORK"
  # seed 0 + start-index keeps draws per-pair deterministic only from 0,
  # so a resumed run reseeds by start index to avoid duplicate pairs.
  setsid nice -n 10 python tools/synth_dns.py "$WORK" \
      --pairs $(( SYNTH_PAIRS - next_idx )) --start-index "$next_idx" \
      --seconds 20 --seed $(( next_idx + 1 )) \
      > /tmp/r5_synth.log 2>&1 &
  SYNTH_PID=$!
  echo "synth regen: $next_idx -> $SYNTH_PAIRS pairs (pgid $SYNTH_PID)"
else
  echo "corpus present ($n_clean pairs, next id $next_idx)"
fi

echo "== A: bench (budget $(budget)s)"
bud_a=$(budget); [ "$bud_a" -gt 2400 ] && bud_a=2400
if [ "$bud_a" -ge 120 ]; then
  timeout $(( bud_a - 60 )) python bench.py > /tmp/r5_bench_bf16.json 2>/tmp/r5_bench_bf16.err
  echo "bench bf16 rc=$? : $(cat /tmp/r5_bench_bf16.json 2>/dev/null)"
else
  echo "budget too small - bench skipped (driver's bench takes priority)"
fi
bud_a=$(budget); [ "$bud_a" -gt 2400 ] && bud_a=2400
if [ "$bud_a" -ge 120 ]; then
  timeout $(( bud_a - 60 )) python bench.py --f32 > /tmp/r5_bench_f32.json 2>/tmp/r5_bench_f32.err
  echo "bench f32 rc=$? : $(cat /tmp/r5_bench_f32.json 2>/dev/null)"
else
  echo "budget too small - f32 bench skipped"
fi

echo "== B: check_tpu (budget $(budget)s)"
if [ "$(budget)" -ge 1200 ]; then
  timeout $(( $(budget) < 3600 ? $(budget) - 300 : 3600 )) \
    python tools/check_tpu.py > /tmp/r5_check_tpu.log 2>&1
  echo "check_tpu rc=$?"; tail -3 /tmp/r5_check_tpu.log
else
  echo "budget too small - check_tpu skipped"
fi

echo "== B2: f32 stage profile"
if [ "$(budget)" -ge 1200 ]; then
  timeout 2400 python tools/profile_pipeline.py > /tmp/r5_profile_f32.log 2>&1
  echo "profile rc=$?"; tail -12 /tmp/r5_profile_f32.log
else
  echo "budget too small - profile skipped"
fi

echo "== C: streaming latency (budget $(budget)s)"
# Latency is weight-value-independent; fall back to init weights when
# the trained checkpoints were lost with the VM.
LAT_W=$WORK/exp8k/checkpoint-12000.npz
[ -f "$LAT_W" ] || LAT_W=work/init_weights.npz
[ -f "$LAT_W" ] || PERCEPNET_PLATFORM=cpu python - <<'PYEOF2'
import jax
jax.config.update("jax_platforms", "cpu")
from percepnet_tpu.models.percepnet import init_params
from percepnet_tpu.train.checkpoint import save_params_npz
save_params_npz("work/init_weights.npz", init_params(jax.random.PRNGKey(0)))
PYEOF2
if [ "$(budget)" -lt 1200 ]; then echo "budget too small - streaming skipped"; else
python - <<'PYEOF'
import numpy as np
rng = np.random.default_rng(0)
x = (0.05 * rng.normal(size=4*48000) * 32768).astype(np.int16)
x.tofile("/tmp/r5_stream_in.pcm")
PYEOF
timeout 2400 python -m percepnet_tpu enhance /tmp/r5_stream_in.pcm \
    /tmp/r5_stream_out.pcm --weights "$LAT_W" \
    --streaming --report-latency \
    > /tmp/r5_stream_latency.log 2>&1
echo "streaming rc=$?"; tail -3 /tmp/r5_stream_latency.log
timeout 2400 python -m percepnet_tpu enhance /tmp/r5_stream_in.pcm \
    /tmp/r5_stream_out_bf16.pcm --weights "$LAT_W" \
    --streaming --bf16 --report-latency \
    > /tmp/r5_stream_latency_bf16.log 2>&1
echo "streaming bf16 rc=$?"; tail -3 /tmp/r5_stream_latency_bf16.log
fi

echo "== D0: features + lists (budget $(budget)s)"
# featgen is incremental (skips existing .f32s), so running it over
# whatever pairs the background synth has produced so far is safe; a
# later pass extends the set.  Keep 2.2 h back for training + gate.
if [ ! -f "$WORK/lists/train_filelist.txt" ] || \
   [ "$(ls "$WORK"/feats/*.f32 2>/dev/null | wc -l)" -lt 100 ]; then
  if [ "$(budget)" -ge 4500 ]; then
    # Let the synth build at least a trainable corpus floor (600 pairs)
    # while the budget allows; poll, don't block past the window.
    while [ -n "$SYNTH_PID" ] && kill -0 "$SYNTH_PID" 2>/dev/null \
          && [ "$(ls "$WORK"/clean/fileid_*.pcm 2>/dev/null | wc -l)" -lt 600 ] \
          && [ "$(budget)" -ge 9000 ]; do
      sleep 60
    done
    : > "$WORK/pairs.txt"
    for c in "$WORK"/clean/fileid_*.pcm; do
      n="$WORK/noisy/$(basename "$c")"
      # skip a pair the synth might be mid-writing
      [ -f "$n" ] && [ "$(stat -c%s "$n")" -eq "$(stat -c%s "$c")" ] && \
        echo "$c $n $FRAMES_PER_UTT" >> "$WORK/pairs.txt"
    done
    echo "featgen over $(wc -l < "$WORK/pairs.txt") pairs"
    run_group $(( $(budget) - 2700 > 3600 ? 3600 : $(budget) - 2700 )) \
      /tmp/r5_featgen.log \
      python -m percepnet_tpu featgen --pairs-file "$WORK/pairs.txt" \
        --out-dir "$WORK/feats" --skip-existing
    echo "featgen rc=$?"; tail -2 /tmp/r5_featgen.log
    python -m percepnet_tpu split-dataset "$WORK/feats" \
      --out-dir "$WORK/lists" --frac 0.8 > /tmp/r5_split.log 2>&1
    echo "split rc=$?"
  else
    echo "budget too small - featgen skipped"
  fi
else
  echo "feats/lists present"
fi

echo "== D: quality training $(date -u), budget $(budget)s"
# Reserve 45 min for stage E (gate the checkpoint) after training.
bud_d=$(( $(budget) - 2700 ))
if [ ! -f "$WORK/lists/train_filelist.txt" ]; then
  echo "no filelists - training skipped"
elif [ "$bud_d" -ge 23400 ]; then
  run_group "$bud_d" /tmp/r5_quality_train.log \
    recipes/quality_train.sh "$WORK" --wait-tpu
  echo "quality_train rc=$?"
elif [ "$bud_d" -ge 1800 ]; then
  # Late start: one combined stage (log1p + gain MSE), warm-started from
  # the best raw checkpoint IF it survived; checkpoint every 500 steps;
  # the deadline kill saves a preemption checkpoint, stage E gates it.
  PRE=()
  [ -f "$WORK/exp8k/checkpoint-12000.npz" ] && \
    PRE=(--pretrain "$WORK/exp8k/checkpoint-12000.npz")
  for attempt in 1 2 3 4 5; do
    [ "$(budget)" -le 2700 ] && break
    echo "== exp_log1p_fast attempt $attempt $(date -u)"
    run_group $(( $(budget) - 2700 )) /tmp/r5_quality_train.log \
      python -m percepnet_tpu train \
        --train-filelist "$WORK/lists/train_filelist.txt" \
        --dev-filelist "$WORK/lists/dev_filelist.txt" \
        --config configs/dns_log1p_tpu_fast.yaml \
        --out-dir "$WORK/exp_log1p_fast" \
        "${PRE[@]}" \
        --device-data-mb 9216
    rc=$?; echo "train rc=$rc"
    [ $rc -eq 0 ] && break
    sleep 30   # restart resumes from the newest checkpoint
  done
  tail -5 /tmp/r5_quality_train.log
else
  echo "budget too small ($bud_d s) - training skipped"
fi

echo "== E: one-command gate $(date -u), budget $(budget)s"
best=""
for exp in exp_log1p_lin exp_log1p_fast exp_log1p exp_log1p_cpu; do
  c=$(ls "$WORK/$exp"/checkpoint-*.npz 2>/dev/null \
      | sed 's/.*checkpoint-//; s/\.npz//' | sort -n | tail -1)
  if [ -n "$c" ]; then best="$WORK/$exp/checkpoint-$c.npz"; break; fi
done
bud_e=$(budget)
if [ -z "$best" ]; then
  echo "no exp_log1p* checkpoint - check_all skipped"
elif [ "$bud_e" -lt 600 ]; then
  echo "budget too small ($bud_e s) - check_all skipped; gate $best next round"
else
  run_group "$bud_e" /tmp/r5_check_all.log \
    python tools/check_all.py --log1p --weights "$best"
  rc=$?
  echo "check_all ($best) rc=$rc"; tail -2 /tmp/r5_check_all.log
  if [ $rc -eq 0 ]; then
    # Persist the quality deliverable against the next VM wipe: the
    # builder session (or a human) commits artifacts/ afterwards.
    mkdir -p artifacts
    cp "$best" "artifacts/$(basename "$(dirname "$best")")-$(basename "$best")"
    cp "$(dirname "$best")/quality.json" artifacts/ 2>/dev/null || true
    echo "checkpoint copied to artifacts/ - COMMIT IT"
  fi
fi
echo "== orchestrator done $(date -u), budget left $(budget)s"
