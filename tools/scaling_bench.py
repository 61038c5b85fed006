#!/usr/bin/env python
"""Data-parallel scaling-efficiency harness for the training step.

Measures train-step throughput (audio-seconds/s) at increasing device
counts with a FIXED per-device batch (weak scaling), and reports
efficiency vs the single-device baseline — the ≥90%-at-2-hosts target
from BASELINE.md.  Ready for a real v5e-16 run:

  single host / single process (1..8 chips):
      python tools/scaling_bench.py
  2-host slice (one process per host; TPU env auto-coordinates):
      python tools/scaling_bench.py --distributed

Off-hardware it runs the same code on a virtual CPU mesh
(--cpu-devices N), which validates the harness, not the hardware number.
Timing is DCE-safe: steps are chained through the carried TrainState
inside one measured loop and every output leaf is consumed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--per-device-batch", type=int, default=32)
    ap.add_argument("--seq-len", type=int, default=100)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: one process per host (TPU env)")
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force an N-device virtual CPU mesh (harness "
                         "validation only)")
    args = ap.parse_args(argv)

    if args.cpu_devices:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_devices}"
        ).strip()
    import jax
    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")
    if args.distributed:
        jax.distributed.initialize()

    import jax.numpy as jnp
    from percepnet_tpu.parallel import mesh as pm
    from percepnet_tpu.train import state as ts

    devs = jax.devices()
    counts = []
    n = 1
    while n <= len(devs):
        counts.append(n)
        n *= 2
    if counts[-1] != len(devs):
        counts.append(len(devs))
    if args.distributed and jax.process_count() > 1:
        # per-process meshes cannot subset a multi-host topology; measure
        # the full mesh only and compare offline against the 1-host run
        counts = [len(devs)]

    results = []
    for nd in counts:
        mesh = pm.make_mesh(devs[:nd])
        tx = ts.make_optimizer(1e-4)
        state = pm.replicate(mesh,
                             ts.init_train_state(jax.random.PRNGKey(0), tx))
        train_fn, _ = ts.make_jitted_steps(tx, mesh)

        batch = args.per_device_batch * nd
        key = jax.random.PRNGKey(1)
        feats = jax.random.uniform(key, (batch, args.seq_len, 70),
                                   jnp.float32)
        targs = jax.random.uniform(key, (batch, args.seq_len, 68),
                                   jnp.float32) * 0.9
        feats, targs = pm.shard_batch(mesh, (feats, targs))

        state, loss = train_fn(state, feats, targs)  # compile + warmup
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, loss = train_fn(state, feats, targs)
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0

        audio_s = (args.steps * batch * args.seq_len * 480 / 48_000) / dt
        rec = {"devices": nd, "batch": batch,
               "audio_s_per_s": round(audio_s, 1),
               "step_ms": round(dt / args.steps * 1e3, 2)}
        if results:
            base = results[0]
            rec["efficiency_vs_1dev"] = round(
                audio_s / (base["audio_s_per_s"] * nd / base["devices"]), 3)
        results.append(rec)
        if jax.process_index() == 0:
            print(json.dumps(rec))
    return results


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
