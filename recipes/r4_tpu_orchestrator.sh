#!/bin/bash
# Full round-4 TPU execution, in priority order, one chip holder at a time:
#   A. bench.py bf16 + --f32        (VERDICT #1/#3: driver-verified >=10k)
#   B. tools/check_tpu.py           (VERDICT #3 re-validation)
#   C. streaming --report-latency   (VERDICT #4: <=2.0 ms/frame)
#   D. recipes/quality_train.sh     (VERDICT #2: log1p + gain-MSE recipe,
#                                    supervised retry, resume-safe)
# All output to /tmp/r4_*.{json,log}; safe to re-run (stages skip nothing
# but training resumes from checkpoints).
set -uo pipefail
cd /root/repo
echo "== orchestrator start $(date -u)"

# The chip is single-tenant and the driver runs bench.py at round end: any
# process still holding it then turns BENCH_r04 into another rc!=0 (that
# is exactly how round 3 lost its headline number).  Derive the round
# start from the LAST round tick's (ts - wall_s) — wall_s resets when the
# driver restarts (observed 8/18: VM replaced mid-round, /tmp and work/
# wiped), so the first tick's ts can belong to a dead driver run.  Round
# length via ROUND_SECS (default 5 h); keep a 25 min margin so the chip
# is free for the driver's bench.
DEADLINE=$(python3 - <<PY
import json, os
ticks = [json.loads(l) for l in open("PROGRESS.jsonl")
         if '"round"' in l]
last = ticks[-1]
start = last["ts"] - last["wall_s"]
print(int(start) + int(os.environ.get("ROUND_SECS", 5 * 3600)) - 1500)
PY
)
budget() { echo $(( DEADLINE - $(date +%s) )); }
echo "deadline $(date -u -d @$DEADLINE 2>/dev/null || echo @$DEADLINE), budget $(budget)s"

# run_group <budget_s> <logfile> <cmd...>: run cmd in its own process
# group and TERM (then KILL) the WHOLE group at the budget, so a killed
# recipe cannot orphan a python child that keeps holding the chip.  The
# trainer saves a preemption checkpoint on SIGTERM.
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

echo "== A: bench (budget $(budget)s)"
# Cap at the remaining budget: if the tunnel answered minutes before
# round end, OUR bench must not hold the chip through the DRIVER's.
bud_a=$(budget); [ "$bud_a" -gt 2400 ] && bud_a=2400
if [ "$bud_a" -ge 120 ]; then
  timeout $(( bud_a - 60 )) python bench.py > /tmp/r4_bench_bf16.json 2>/tmp/r4_bench_bf16.err
  echo "bench bf16 rc=$? : $(cat /tmp/r4_bench_bf16.json 2>/dev/null)"
else
  echo "budget too small - bench skipped (driver's bench takes priority)"
fi
bud_a=$(budget); [ "$bud_a" -gt 2400 ] && bud_a=2400
if [ "$bud_a" -ge 120 ]; then
  timeout $(( bud_a - 60 )) python bench.py --f32 > /tmp/r4_bench_f32.json 2>/tmp/r4_bench_f32.err
  echo "bench f32 rc=$? : $(cat /tmp/r4_bench_f32.json 2>/dev/null)"
else
  echo "budget too small - f32 bench skipped"
fi

echo "== B: check_tpu (budget $(budget)s)"
if [ "$(budget)" -ge 1200 ]; then
  timeout $(( $(budget) < 3600 ? $(budget) - 300 : 3600 )) \
    python tools/check_tpu.py > /tmp/r4_check_tpu.log 2>&1
  echo "check_tpu rc=$?"; tail -3 /tmp/r4_check_tpu.log
else
  echo "budget too small - check_tpu skipped"
fi

echo "== B2: f32 stage profile (VERDICT #3 evidence)"
if [ "$(budget)" -ge 1200 ]; then
  timeout 2400 python tools/profile_pipeline.py > /tmp/r4_profile_f32.log 2>&1
  echo "profile rc=$?"; tail -12 /tmp/r4_profile_f32.log
else
  echo "budget too small - profile skipped"
fi

echo "== C: streaming latency (budget $(budget)s)"
# Latency is weight-value-independent; fall back to init weights when the
# trained checkpoints were lost with the VM (observed 8/18).
LAT_W=work/dns/exp8k/checkpoint-12000.npz
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
x.tofile("/tmp/r4_stream_in.pcm")
PYEOF
timeout 2400 python -m percepnet_tpu enhance /tmp/r4_stream_in.pcm \
    /tmp/r4_stream_out.pcm --weights "$LAT_W" \
    --streaming --report-latency \
    > /tmp/r4_stream_latency.log 2>&1
echo "streaming rc=$?"; tail -3 /tmp/r4_stream_latency.log
timeout 2400 python -m percepnet_tpu enhance /tmp/r4_stream_in.pcm \
    /tmp/r4_stream_out_bf16.pcm --weights "$LAT_W" \
    --streaming --bf16 --report-latency \
    > /tmp/r4_stream_latency_bf16.log 2>&1
echo "streaming bf16 rc=$?"; tail -3 /tmp/r4_stream_latency_bf16.log
fi

echo "== D: quality training recipe $(date -u), budget $(budget)s"
# The CPU hedge fine-tune (recipes/quality_train_cpu.sh) shares the
# host's single core; stop it (exact recorded PIDs only) once the real
# TPU recipe takes over.
if [ -f /tmp/r4_cpu_train.pid ]; then
  while read -r pid; do kill "$pid" 2>/dev/null; done < /tmp/r4_cpu_train.pid
fi
# Reserve 45 min for stage E (gate the checkpoint) after training.
bud_d=$(( $(budget) - 2700 ))
if [ "$bud_d" -ge 23400 ]; then
  # Enough for the full two-stage recipe (30k + 10k steps).  --wait-tpu:
  # if the tunnel died again during A-C, poll instead of burning
  # supervise()'s 4 h timeouts on hung inits.
  run_group "$bud_d" /tmp/r4_quality_train.log \
    recipes/quality_train.sh work/dns --wait-tpu
  echo "quality_train rc=$?"
elif [ "$bud_d" -ge 1800 ]; then
  # Late tunnel: one combined stage (log1p + gain MSE), warm-started from
  # the best raw checkpoint, checkpointing every 500 steps; the deadline
  # kill saves a preemption checkpoint and stage E gates the newest one.
  # Warm-start only if the raw checkpoint survived (the 8/18 VM wipe
  # deleted work/); from-scratch log1p training still converges — the
  # warm start only carries GRU/head steps.
  PRE=()
  [ -f work/dns/exp8k/checkpoint-12000.npz ] && \
    PRE=(--pretrain work/dns/exp8k/checkpoint-12000.npz)
  for attempt in 1 2 3 4 5; do
    [ "$(budget)" -le 2700 ] && break
    echo "== exp_log1p_fast attempt $attempt $(date -u)"
    run_group $(( $(budget) - 2700 )) /tmp/r4_quality_train.log \
      python -m percepnet_tpu train \
        --train-filelist work/dns/lists/train_filelist.txt \
        --dev-filelist work/dns/lists/dev_filelist.txt \
        --config configs/dns_log1p_tpu_fast.yaml \
        --out-dir work/dns/exp_log1p_fast \
        "${PRE[@]}" \
        --device-data-mb 9216
    rc=$?; echo "train rc=$rc"
    [ $rc -eq 0 ] && break
    sleep 30   # restart resumes from the newest checkpoint
  done
else
  echo "budget too small ($bud_d s) - training skipped"
fi
tail -5 /tmp/r4_quality_train.log

echo "== E: one-command gate on the trained checkpoint $(date -u), budget $(budget)s"
# newest checkpoint, preferring stage 2 > the combined fast run > stage 1
# > the CPU hedge, so a partially-completed recipe still gets gated
best=""
for exp in exp_log1p_lin exp_log1p_fast exp_log1p exp_log1p_cpu; do
  c=$(ls work/dns/$exp/checkpoint-*.npz 2>/dev/null \
      | sed 's/.*checkpoint-//; s/\.npz//' | sort -n | tail -1)
  if [ -n "$c" ]; then best="work/dns/$exp/checkpoint-$c.npz"; break; fi
done
bud_e=$(budget)
if [ -z "$best" ]; then
  echo "no exp_log1p* checkpoint - check_all skipped"
elif [ "$bud_e" -lt 600 ]; then
  echo "budget too small ($bud_e s) - check_all skipped; gate $best next round"
else
  run_group "$bud_e" /tmp/r4_check_all.log \
    python tools/check_all.py --log1p --weights "$best"
  echo "check_all ($best) rc=$?"; tail -2 /tmp/r4_check_all.log
fi
echo "== orchestrator done $(date -u), budget left $(budget)s"
