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


def chained_time(fn, *args, iters: int = 8) -> float:
    """Seconds/iteration with ALL the anti-footgun measures this target
    needs (see CLAUDE.md): `iters` applications are chained inside ONE
    jit via fori_loop, the first (float-array) argument is perturbed by
    the loop index so no execution-level memoization or CSE can collapse
    them, and every output leaf is consumed into the accumulated scalar
    so XLA cannot dead-code-eliminate any part.  Per-dispatch overhead
    (milliseconds through a remote-TPU tunnel) is amortized to 1/iters.
    """
    import jax.numpy as jnp
    from jax import lax

    def harness(*a):
        def body(i, acc):
            first = a[0] + (i * 1e-6).astype(a[0].dtype)
            out = fn(first, *a[1:])
            for leaf in jax.tree.leaves(out):
                acc = acc + jnp.sum(jnp.abs(leaf).astype(jnp.float32))
            return acc
        return lax.fori_loop(0, iters, body, jnp.float32(0))

    f = jax.jit(harness)
    jax.block_until_ready(f(*args))          # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args))
    return (time.perf_counter() - t0) / iters


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
