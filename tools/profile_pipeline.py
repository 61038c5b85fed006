#!/usr/bin/env python
"""Stage-level timing of the enhancement pipeline at the bench shape.

Times each pipeline stage as its own jitted function (DCE-safe: outputs
consumed, steady-state over n reps) in ONE process so compiles are paid
once, with the persistent cache warm for repeat runs:

  spectra   framing + window + extended DFT + band energies
  pitch     stream decimation + whiten + xcorr + search + doubling scan
  comb      Pallas comb windows + DFT + band energy + coherence
  model     GRU stack forward (f32 and bf16)
  enhance   pitch filter + band gains + postless OLA synthesis
  full      end-to-end enhance_chunk (f32 and bf16)

Sub-stage times won't sum exactly to `full` (cross-stage fusion is lost
when jitted separately) — use them for ranking, not accounting.

Usage: python tools/profile_pipeline.py [--batch 512] [--frames 200]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    from percepnet_tpu import constants as C
    from percepnet_tpu import enhance, pipeline
    from percepnet_tpu.features import frontend
    from percepnet_tpu.models import percepnet as M
    from percepnet_tpu.ops import bands, comb, dft, pitch, window

    B, T = args.batch, args.frames
    key = jax.random.PRNGKey(0)
    sig = 0.05 * jax.random.normal(key, (B, T * 480), jnp.float32)
    params = M.init_params(key)
    st = pipeline.init_pipeline_state(B)
    s_pad = jnp.concatenate([st.front.tail, sig], axis=-1)

    def timeit(name, fn, *arg):
        t0 = time.perf_counter()
        o = fn(*arg)
        jax.block_until_ready(o)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            o = fn(*arg)
        jax.block_until_ready(o)
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        print(f"{name:10s} {ms:8.1f} ms   (compile+1st {compile_s:.1f} s)",
              flush=True)
        return o

    frame = jax.vmap(frontend._frame, in_axes=(0, None, None, None))

    @jax.jit
    def f_spectra(s_pad):
        xw = window.apply_window(
            frame(s_pad, T + C.FRAME_LOOKAHEAD, frontend._X_OFF,
                  C.WINDOW_SIZE))
        xr, xi = dft.forward_dft(xw)
        return xr, xi, bands.band_energy(xr, xi)

    @jax.jit
    def f_pitch(s_pad):
        ds = pitch.downsample_frames_from_stream(s_pad, T,
                                                 frontend._PITCH_OFF)
        return jax.vmap(pitch.pitch_track_ds)(
            ds, jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.float32))

    xr, xi, ex = timeit("spectra", f_spectra, s_pad)
    track = timeit("pitch", f_pitch, s_pad)
    period = track["period"]

    @jax.jit
    def f_comb(s_pad, period, xr, xi, ex):
        pw = comb.comb_filter_windows_batch(s_pad, period, frontend._X_OFF)
        pr, pi = dft.forward_dft(pw)
        ep = bands.band_energy(pr, pi)
        exp_raw = bands.band_corr(xr[:, :T], xi[:, :T], pr, pi)
        return pr, pi, ep, jnp.clip(
            exp_raw / jnp.sqrt(1e-15 + ex[:, :T] * ep), 0.0, 1.0)

    timeit("comb", f_comb, s_pad, period, xr, xi, ex)

    f_front = jax.jit(frontend.analyze_batch)
    front, _ = timeit("frontend", f_front, sig, st.front)
    feats = front["features"]

    ms32 = M.init_model_state(B)
    timeit("model f32", jax.jit(lambda p, x, m: M.forward(p, x, m)),
           params, feats, ms32)
    ms16 = M.init_model_state(B, jnp.bfloat16)
    g, r, _ = timeit(
        "model bf16",
        jax.jit(lambda p, x, m: M.forward(p, x, m,
                                          compute_dtype=jnp.bfloat16)),
        params, feats, ms16)

    timeit("enhance",
           jax.jit(lambda fr, g, r, mem: jax.vmap(enhance.enhance_spectra)(
               fr, g, r, mem)), front, g, r, st.synthesis_mem)

    st32 = pipeline.init_pipeline_state(B)
    timeit("full f32", jax.jit(lambda p, s, stt: pipeline.enhance_chunk(
        p, s, stt)), params, sig, st32)
    st16 = pipeline.init_pipeline_state(B, model_dtype=jnp.bfloat16)
    timeit("full bf16", jax.jit(lambda p, s, stt: pipeline.enhance_chunk(
        p, s, stt, compute_dtype=jnp.bfloat16)), params, sig, st16)


if __name__ == "__main__":
    main()
