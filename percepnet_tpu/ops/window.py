"""Vorbis analysis window (denoise.cpp:186-214, 282-289)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from percepnet_tpu import constants as C


def apply_window(x: jax.Array) -> jax.Array:
    """Multiply [..., WINDOW_SIZE] frames by the symmetric Vorbis window.

    Same window for analysis and synthesis (apply_window, denoise.cpp:282).
    """
    return x * jnp.asarray(C.full_window(x.shape[-1] // 2))
