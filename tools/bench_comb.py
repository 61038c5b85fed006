#!/usr/bin/env python
"""On-chip A/B bench of comb-window kernel variants at the bench shape.

Times each variant with utils.profiling.chained_time (DCE-safe, chained
in one jit) and cross-checks every variant against the XLA-gather
reference before timing.  Run on the real TPU:

    python tools/bench_comb.py [--batch 512] [--frames 200]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("PERCEPNET_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PERCEPNET_PLATFORM"])


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args(argv)

    from percepnet_tpu import constants as C
    from percepnet_tpu.ops import comb
    from percepnet_tpu.utils.profiling import chained_time

    B, T = args.batch, args.frames
    key = jax.random.PRNGKey(0)
    pad = jnp.concatenate(
        [jnp.zeros((B, 5280)),
         0.05 * jax.random.normal(key, (B, T * C.FRAME_SIZE))], axis=1)
    per = jax.random.randint(jax.random.PRNGKey(1), (B, T), 60, 770)

    # correctness first, on a small slice (full-shape gather is ~seconds)
    pad_s, per_s = pad[:4], per[:4]
    ref = jax.jit(comb._comb_gather, static_argnums=2)(pad_s, per_s, 2400)
    variants = {
        "v1": lambda s, p, d: comb._comb_pallas(s, p, 2400, d),
        "v2": lambda s, p, d: comb._comb_pallas_v2(s, p, 2400, d),
    }
    for name, fn in variants.items():
        got = fn(pad_s, per_s, jnp.float32)
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"{name} f32 max err vs gather: {err:.3g}")
        assert err < 1e-6, (name, err)
        got16 = fn(pad_s, per_s, jnp.bfloat16)
        import numpy as np
        d16 = np.abs(np.asarray(got16, np.float32) - np.asarray(ref))
        bound = 2.0 ** -8 * np.abs(np.asarray(ref)) + 2e-6
        worst = float(np.max(d16 - bound))
        print(f"{name} bf16 worst over half-ULP bound: {worst:.3g}")
        assert worst <= 0, (name, worst)

    # Root-cause probe for the round-4 check-1 anomaly (VERDICT weak #2):
    # if the bf16-store discrepancy is accumulation-SCHEDULE drift between
    # the per-frame and 8-row-blocked Mosaic builds (v1), then a variant
    # whose f32 and bf16 builds share one store path (v2) must satisfy
    # bf16_out == round_to_nearest_bf16(f32_out) EXACTLY.
    import numpy as np
    for name, fn in variants.items():
        f32v = np.asarray(fn(pad_s, per_s, jnp.float32))
        b16v = np.asarray(fn(pad_s, per_s, jnp.bfloat16))
        expect = f32v.astype(jnp.bfloat16)
        n_diff = int(np.sum(b16v.view(np.uint16)
                            != np.asarray(expect).view(np.uint16)))
        print(f"{name}: bf16 store == rn(f32 store) exactly? "
              f"{n_diff == 0} ({n_diff} mismatched elements)")

    for name, fn in variants.items():
        for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            ms = chained_time(lambda s: fn(s, per, dt), pad,
                              iters=args.iters) * 1e3
            print(f"{name} {tag}: {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
