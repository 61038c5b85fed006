"""Headline benchmark: batched end-to-end enhancement throughput.

Measures audio-seconds of 48 kHz speech enhanced per wall-clock second on
one chip, on the full pipeline (analysis front-end -> PercepNet GRU stack ->
pitch filter / band gains / OLA synthesis) — the TPU-native equivalent of
`percepNet_run` (main.cpp:11-41).

Baseline: BASELINE.json north_star target = 10,000 audio-s/s/chip
(the reference publishes no numbers; its paper claims ~real-time x20 on
one x86 core, i.e. O(20) audio-s/s).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio_s_per_s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# Refuse to hang (or to print a non-TPU number) when the remote-TPU
# tunnel is down: backend init through a dead tunnel blocks forever, so
# probe it in a time-bounded subprocess first.  PERCEPNET_BENCH_NO_PROBE=1
# skips the probe (e.g. when the chip is known-good and busy-polling it
# twice is wasteful).
if not os.environ.get("PERCEPNET_BENCH_NO_PROBE"):
    try:
        _p = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=240)
        _backend = _p.stdout.strip()
    except subprocess.TimeoutExpired:
        _backend = ""
    if not _backend.endswith("tpu"):
        print(f"bench.py: no TPU backend reachable (probe got "
              f"{_backend!r}); refusing to bench a non-TPU device",
              file=sys.stderr)
        sys.exit(3)

import jax
import jax.numpy as jnp

# persistent compile cache: the B=512 pipeline takes minutes to compile
# through a remote-TPU tunnel; cache hits make bench re-runs fast
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from percepnet_tpu import pipeline
from percepnet_tpu.models import percepnet

BASELINE_AUDIO_S_PER_S = 10_000.0  # BASELINE.json north_star target
SAMPLE_RATE = 48_000


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    # Serving default is the bf16 model path (one native MXU pass per
    # matmul); quality-gated against f32 end to end by
    # tools/quality_gate.py (|dSTOI| <= 0.005, |dSI-SDR| <= 0.3 dB on
    # enhanced speech).  --f32 benches the strict-parity mode.
    dtype = jnp.float32 if "--f32" in argv else jnp.bfloat16

    # Shape chosen for steady-state throughput: many parallel streams,
    # chunks long enough to amortize scan overhead (throughput saturates
    # near batch 256 on one v5e chip — GRU weight streaming amortized).
    batch, n_frames = 512, 200      # 2 s per stream per step
    for a in argv:
        if a.startswith("--batch="):
            batch = int(a.split("=", 1)[1])
        elif a.startswith("--frames="):
            n_frames = int(a.split("=", 1)[1])
    n_samples = n_frames * 480

    params = percepnet.init_params(jax.random.PRNGKey(0))
    state = pipeline.init_pipeline_state(batch, model_dtype=dtype)

    key = jax.random.PRNGKey(1)
    signal = 0.05 * jax.random.normal(key, (batch, n_samples), jnp.float32)

    kw = {} if dtype == jnp.float32 else {"compute_dtype": dtype}
    from percepnet_tpu.ops.dispatch import resolve_impl
    kw["impl"] = resolve_impl()   # pin the op tier outside the jit
    step = jax.jit(lambda p, s, st: pipeline.enhance_chunk(p, s, st, **kw),
                   donate_argnums=(2,))

    # Warm up / compile.
    pcm, state = step(params, signal, state)
    jax.block_until_ready(pcm)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        pcm, state = step(params, signal, state)
    jax.block_until_ready(pcm)
    dt = time.perf_counter() - t0

    audio_s = iters * batch * n_samples / SAMPLE_RATE
    value = audio_s / dt
    print(json.dumps({
        "metric": "enhance_throughput_1chip",
        "value": round(value, 1),
        "unit": "audio_s_per_s",
        "vs_baseline": round(value / BASELINE_AUDIO_S_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
