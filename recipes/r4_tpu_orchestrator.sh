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

echo "== A: bench"
timeout 2400 python bench.py > /tmp/r4_bench_bf16.json 2>/tmp/r4_bench_bf16.err
echo "bench bf16 rc=$? : $(cat /tmp/r4_bench_bf16.json 2>/dev/null)"
timeout 2400 python bench.py --f32 > /tmp/r4_bench_f32.json 2>/tmp/r4_bench_f32.err
echo "bench f32 rc=$? : $(cat /tmp/r4_bench_f32.json 2>/dev/null)"

echo "== B: check_tpu"
timeout 3600 python tools/check_tpu.py > /tmp/r4_check_tpu.log 2>&1
echo "check_tpu rc=$?"; tail -3 /tmp/r4_check_tpu.log

echo "== B2: f32 stage profile (VERDICT #3 evidence)"
timeout 2400 python tools/profile_pipeline.py > /tmp/r4_profile_f32.log 2>&1
echo "profile rc=$?"; tail -12 /tmp/r4_profile_f32.log

echo "== C: streaming latency"
python - <<'PYEOF'
import numpy as np
rng = np.random.default_rng(0)
x = (0.05 * rng.normal(size=4*48000) * 32768).astype(np.int16)
x.tofile("/tmp/r4_stream_in.pcm")
PYEOF
timeout 2400 python -m percepnet_tpu enhance /tmp/r4_stream_in.pcm \
    /tmp/r4_stream_out.pcm --weights work/dns/exp8k/checkpoint-12000.npz \
    --streaming --report-latency \
    > /tmp/r4_stream_latency.log 2>&1
echo "streaming rc=$?"; tail -3 /tmp/r4_stream_latency.log
timeout 2400 python -m percepnet_tpu enhance /tmp/r4_stream_in.pcm \
    /tmp/r4_stream_out_bf16.pcm --weights work/dns/exp8k/checkpoint-12000.npz \
    --streaming --bf16 --report-latency \
    > /tmp/r4_stream_latency_bf16.log 2>&1
echo "streaming bf16 rc=$?"; tail -3 /tmp/r4_stream_latency_bf16.log

echo "== D: quality training recipe $(date -u)"
# The CPU hedge fine-tune (recipes/quality_train_cpu.sh) shares the
# host's single core; stop it (exact recorded PIDs only) once the real
# TPU recipe takes over.
if [ -f /tmp/r4_cpu_train.pid ]; then
  while read -r pid; do kill "$pid" 2>/dev/null; done < /tmp/r4_cpu_train.pid
fi
# --wait-tpu: if the tunnel died again during stages A-C, poll until it
# answers instead of burning supervise()'s 4 h timeouts on hung inits
recipes/quality_train.sh work/dns --wait-tpu > /tmp/r4_quality_train.log 2>&1
echo "quality_train rc=$?"
tail -5 /tmp/r4_quality_train.log

echo "== E: one-command gate on the trained checkpoint $(date -u)"
# newest checkpoint, preferring stage 2 > stage 1 > the CPU hedge, so a
# partially-completed recipe (late tunnel return) still gets gated
best=""
for exp in exp_log1p_lin exp_log1p exp_log1p_cpu; do
  c=$(ls work/dns/$exp/checkpoint-*.npz 2>/dev/null \
      | sed 's/.*checkpoint-//; s/\.npz//' | sort -n | tail -1)
  if [ -n "$c" ]; then best="work/dns/$exp/checkpoint-$c.npz"; break; fi
done
if [ -n "$best" ]; then
  timeout 7200 python tools/check_all.py --log1p \
      --weights "$best" \
      > /tmp/r4_check_all.log 2>&1
  echo "check_all ($best) rc=$?"; tail -2 /tmp/r4_check_all.log
else
  echo "no exp_log1p* checkpoint - check_all skipped"
fi
echo "== orchestrator done $(date -u)"
