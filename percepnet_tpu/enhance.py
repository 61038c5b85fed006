"""Spectral enhancement and overlap-add resynthesis.

Applies the pitch filter (denoise.cpp:436-485), per-bin band gains
(denoise.cpp:539-544) and windowed overlap-add synthesis
(denoise.cpp:352-359) to whole utterances at once.  The OLA recursion is a
one-frame shift, so it parallelizes trivially.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from percepnet_tpu import constants as C
from percepnet_tpu.ops import bands, dft, window


def pitch_filter(xr, xi, pr, pi, r, silence):
    """X <- interp(1-r)*X + interp(r)*P, skipped on silent frames.

    Mirrors pitch_filter (denoise.cpp:436-485).  Bins >= the 20 kHz band
    border get zero from both interpolation passes, so non-silent frames
    zero them — matching the reference's memset behavior.
    """
    rf = bands.interp_band_gain(r)
    inv_rf = bands.interp_band_gain(1.0 - r)
    yr = inv_rf * xr + rf * pr
    yi = inv_rf * xi + rf * pi
    sil = silence[..., None]
    return jnp.where(sil, xr, yr), jnp.where(sil, xi, yi)


def apply_gains(xr, xi, g):
    """Per-bin gain multiply: gf = interp(g); X *= gf (denoise.cpp:539-544)."""
    gf = bands.interp_band_gain(g)
    return xr * gf, xi * gf


def synthesize(xr: jax.Array, xi: jax.Array,
               synthesis_mem: jax.Array | None = None,
               serving: bool = False):
    """Windowed inverse DFT + 50% overlap-add (denoise.cpp:352-359).

    Args:
      xr, xi: [T, 481] enhanced spectra.
      synthesis_mem: optional [480] carry from a previous chunk.
      serving: single-pass bf16 inverse-DFT matmul (f32 accumulation) —
        the bf16 serving tier; parity path (default) stays HIGHEST.
    Returns:
      (pcm [T*480], new_mem [480]).
    """
    if serving:
        xr, xi = xr.astype(jnp.bfloat16), xi.astype(jnp.bfloat16)
    x = window.apply_window(dft.inverse_dft(xr, xi))   # [T, 960]
    first, second = x[:, : C.FRAME_SIZE], x[:, C.FRAME_SIZE :]
    if synthesis_mem is None:
        synthesis_mem = jnp.zeros((C.FRAME_SIZE,), x.dtype)
    prev = jnp.concatenate([synthesis_mem[None], second[:-1]], axis=0)
    out = first + prev
    return out.reshape(-1), second[-1]


def enhance_spectra(front: dict, g: jax.Array, r: jax.Array,
                    synthesis_mem: jax.Array | None = None,
                    serving: bool = False):
    """Full enhancement: pitch filter -> band gains -> OLA synthesis.

    Args:
      front: analyze_utterance output dict (xr, xi, pr, pi, silence).
      g, r: [T, 34] gains and strengths (model output or oracle labels).
      serving: bf16 single-pass synthesis matmul (see synthesize).
    Returns:
      (pcm [T*480], new_synthesis_mem).
    """
    xr, xi = pitch_filter(front["xr"], front["xi"], front["pr"], front["pi"],
                          r, front["silence"])
    xr, xi = apply_gains(xr, xi, g)
    return synthesize(xr, xi, synthesis_mem, serving=serving)
