"""Tracing and throughput instrumentation.

The reference has no profiling at all (the PRINT_MIPS stub in arch.h:90 is
dead).  Here: a context manager around jax.profiler for device traces, and
a ThroughputMeter for the audio-seconds/s counters used by bench.py and the
Trainer.

Usage:
  with trace("/tmp/tb"):           # view in TensorBoard / xprof
      step(...)

  meter = ThroughputMeter()
  for chunk in chunks:
      out = step(chunk)
      meter.add(audio_s=chunk.shape[0] * chunk.shape[1] / 48_000)
  print(meter.rate(), "audio-s/s")
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace into log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Wall-clock throughput accumulator (audio-seconds, frames, steps)."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._units = 0.0

    def add(self, units: float) -> None:
        self._units += units

    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def rate(self) -> float:
        dt = self.elapsed()
        return self._units / dt if dt > 0 else 0.0


def block_and_time(fn, *args, iters: int = 5, **kw):
    """(result, seconds/iter) with a warmup call and block_until_ready.

    NOTE: measures per-dispatch wall time; for sub-millisecond ops prefer
    chaining iterations inside one jit (dispatch overhead through remote
    TPU transports can exceed 1 ms and XLA dead-code-eliminates
    unconsumed outputs — both distort naive loops).
    """
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / iters
