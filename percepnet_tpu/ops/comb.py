"""Pitch comb filter: P(l) = sum_{k=-3..3} w_k x(t - pitch*k).

The reference accumulates 7 shifted copies of the 960-sample analysis window
from its ring buffer (denoise.cpp:419-422).  Batched, this is a gather of
[T, 7, 960] samples from the padded utterance at data-dependent offsets
(pitch varies per frame), contracted against the normalized Hann comb
window (denoise.cpp:200-206).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from percepnet_tpu import constants as C


def comb_filter_windows(s_pad: jax.Array, n_frames: int, x_offset: int,
                        period: jax.Array) -> jax.Array:
    """[T, WINDOW_SIZE] un-windowed comb outputs, one per frame.

    Args:
      s_pad: [pad + n_samples] padded signal.
      n_frames: number of frames T.
      x_offset: padded-index offset of the analysis window (2400).
      period: [T] int32 pitch period per frame.
    """
    w = jnp.asarray(C.comb_hann_window())
    t_idx = jnp.arange(n_frames, dtype=jnp.int32)[:, None, None] * C.FRAME_SIZE
    k = jnp.arange(-C.COMB_M, C.COMB_M + 1, dtype=jnp.int32)[None, :, None]
    i = jnp.arange(C.WINDOW_SIZE, dtype=jnp.int32)[None, None, :]
    idx = t_idx + x_offset - period[:, None, None] * k + i
    taps = jnp.take(s_pad, idx, axis=0)          # [T, 7, 960]
    return jnp.einsum("tkw,k->tw", taps, w)
