"""Batched analysis front-end: PCM -> spectra, band energies, pitch, comb.

The reference processes one 10 ms frame at a time through a set of ring
buffers inside DenoiseState (denoise.cpp:61-85, 372-434).  Every one of those
buffers is a sliding window over the input signal, so the TPU-native design
replaces them with index arithmetic into a single left-padded signal and
computes ALL frames of an utterance at once:

  padded index of frame t = t*FRAME_SIZE + OFFSET, with OFFSET:
    analysis window (X)       2400   (denoise.cpp:402: the frame being
                                      enhanced lags the input by
                                      FRAME_LOOKAHEAD+1 frames)
    comb-filter base          2400 - pitch*k   (denoise.cpp:419-422)
    pitch buffer               1632   (denoise.cpp:396-397)
    lookahead window           4800   (denoise.cpp:498-506)

Only two computations are sequential across frames, both tiny scalar
chains: the remove_doubling hysteresis (inside ops.pitch.pitch_track's
scan) and, downstream, the GRU state.  Everything else is batched matmuls
and gathers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from percepnet_tpu import constants as C
from percepnet_tpu.ops import bands, comb, dft, pitch, window

PAD = C.COMB_BUF_SIZE - C.FRAME_SIZE  # 5280 zeros: the initial ring state
_X_OFF = 2400
_PITCH_OFF = 1632
_LOOK_OFF = 4800


class FrontendState(NamedTuple):
    """Streaming carry-over between utterance chunks.

    tail:   [PAD] last samples of the previous chunk (ring-buffer contents).
    period: int32 last pitch period (DenoiseState.last_period).
    gain:   float32 last pitch gain (DenoiseState.last_gain).
    """
    tail: jax.Array
    period: jax.Array
    gain: jax.Array


def init_state() -> FrontendState:
    return FrontendState(
        tail=jnp.zeros((PAD,), jnp.float32),
        period=jnp.asarray(0, jnp.int32),
        gain=jnp.asarray(0.0, jnp.float32))


def _frame(s_pad: jax.Array, n_frames: int, offset: int, length: int):
    """[n_frames, length] sliding windows: s_pad[t*480 + offset : +length].

    Static-index gather.  (A hop-sized reshape+concat formulation is ~25%
    faster in isolation but loses ~6 ms in the fused frontend — the concat
    layout interacts badly with the window/DFT/decimation consumers.)
    """
    idx = (jnp.arange(n_frames)[:, None] * C.FRAME_SIZE
           + offset + jnp.arange(length)[None, :])
    return jnp.take(s_pad, idx, axis=0)


def analyze_batch(signal: jax.Array, state: FrontendState | None = None,
                  *, serving: bool = False, impl: str | None = None):
    """Analyze a batch of utterances; returns per-frame features and spectra.

    Args:
      signal: [B, n_samples] float32 PCM (n_samples divisible by
        FRAME_SIZE).  Scale convention follows the caller: /32768 for
        inference parity (main.cpp:34), raw int16 amplitudes for feature
        generation (denoise.cpp:41,697 NORM_RATIO=1).
      state: optional streaming carry with [B]-leading leaves (None = fresh
        DenoiseState zeros).
      serving: speed tier for the bf16 serving mode: the DFT and pitch
        xcorr/window-energy contractions run as single-pass bf16 MXU
        matmuls with f32 accumulation instead of the parity path's
        HIGHEST (bf16x6).  Feature drift is below the bf16 model's own
        input quantization; end-to-end quality is gated by
        tools/quality_gate.py and pitch DECISIONS are audited on-chip by
        tools/check_tpu.py.  Default False = bit-exact parity frontend.
      impl: explicit op-implementation tier for the backend-specialized
        ops ('cpu' parity kernels / 'tpu' MXU+Pallas kernels); None
        auto-resolves from the default backend at trace time — pass it
        explicitly from entry points that jit (see ops.dispatch).

    Returns:
      (out, new_state) where out is a dict of [B, T, ...] arrays:
        xr, xi      [B, T, 481]  spectrum of the (delayed) enhanced frame
        pr, pi      [B, T, 481]  comb-filtered spectrum
        ex, ep      [B, T, 34]   band energies of X and P
        exp         [B, T, 34]   clamped pitch coherence  (denoise.cpp:427)
        ey_look     [B, T, 34]   lookahead band energy    (denoise.cpp:498)
        period      [B, T] int32, gain [B, T], corr [B, T]  pitch track
        silence     [B, T] bool  (sum Ex < 0.1, denoise.cpp:429-433)
        features    [B, T, 70]   model input (create_features, :487)

    Batched natively (not vmap) so the comb filter hits its Pallas kernel.
    """
    from percepnet_tpu.ops.dispatch import resolve_impl
    impl = resolve_impl(impl)
    bsz, n = signal.shape
    if state is None:
        state = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (bsz,) + x.shape), init_state())
    n_frames = n // C.FRAME_SIZE
    s_pad = jnp.concatenate(
        [state.tail, signal.astype(jnp.float32)], axis=-1)

    frame = jax.vmap(lambda s, nf, off, ln: _frame(s, nf, off, ln),
                     in_axes=(0, None, None, None))

    # --- spectra of the frame being enhanced -----------------------------
    # The lookahead window of frame t (offset 4800, denoise.cpp:498-506)
    # covers exactly the same samples as the analysis window of frame t+5
    # (offset 2400 + 5*480), so ONE extended DFT pass over T+5 frames
    # yields both the X spectra (rows :T) and the lookahead band energies
    # (rows 5:) — a third of the frontend's transform work eliminated.
    n_ext = n_frames + C.FRAME_LOOKAHEAD
    xw = window.apply_window(frame(s_pad, n_ext, _X_OFF, C.WINDOW_SIZE))
    if serving:
        xw = xw.astype(jnp.bfloat16)
    xr_ext, xi_ext = dft.forward_dft(xw)
    ex_ext = bands.band_energy(xr_ext, xi_ext)
    xr, xi = xr_ext[:, :n_frames], xi_ext[:, :n_frames]
    ex = ex_ext[:, :n_frames]

    # --- pitch track ------------------------------------------------------
    # decimate the stream once and frame at half hop: bit-identical to
    # per-frame [1728] buffers, without materializing them
    ds = pitch.downsample_frames_from_stream(s_pad, n_frames, _PITCH_OFF)
    prec = pitch.BF16 if serving else pitch.HIGHEST
    track = jax.vmap(
        lambda d, p, g: pitch.pitch_track_ds(d, p, g, precision=prec,
                                             impl=impl)
    )(ds, state.period, state.gain)
    period = track["period"]

    # --- comb filter (Pallas kernel on TPU; window fused inside) ----------
    # serving tier: the kernel stores bf16 directly (half the HBM write,
    # no separate cast pass before the bf16 DFT)
    pw = comb.comb_filter_windows_batch(
        s_pad, period, _X_OFF,
        out_dtype=jnp.bfloat16 if serving else jnp.float32, impl=impl)
    pr, pi = dft.forward_dft(pw)
    ep = bands.band_energy(pr, pi)
    exp_raw = bands.band_corr(xr, xi, pr, pi)
    exp = jnp.clip(exp_raw / jnp.sqrt(1e-15 + ex * ep), 0.0, 1.0)

    silence = jnp.sum(ex, axis=-1) < 0.1

    # --- lookahead energy + feature vector -------------------------------
    ey_look = ex_ext[:, C.FRAME_LOOKAHEAD:]

    t_feat = period.astype(jnp.float32) / C.PITCH_T_NORM
    features = jnp.concatenate([
        ey_look * C.FEATURE_SCALE,
        exp * C.FEATURE_SCALE,
        t_feat[..., None],
        track["corr"][..., None],
    ], axis=-1)

    new_state = FrontendState(
        tail=s_pad[:, -PAD:],
        period=track["final_period"],
        gain=track["final_gain"])
    out = dict(xr=xr, xi=xi, pr=pr, pi=pi, ex=ex, ep=ep, exp=exp,
               ey_look=ey_look, period=period, gain=track["gain"],
               corr=track["corr"], silence=silence, features=features)
    return out, new_state


def analyze_utterance(signal: jax.Array, state: FrontendState | None = None,
                      *, serving: bool = False, impl: str | None = None):
    """Single-utterance variant: signal [n_samples] -> dict of [T, ...]."""
    if state is not None:
        state = jax.tree.map(lambda x: x[None], state)
    out, new_state = analyze_batch(signal[None], state, serving=serving,
                                   impl=impl)
    return (jax.tree.map(lambda x: x[0], out),
            jax.tree.map(lambda x: x[0], new_state))
