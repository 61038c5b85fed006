"""960-point real DFT as MXU matmuls.

The reference uses a mixed-radix KISS FFT (kiss_fft.cpp:434-600; 960 = 2^6*3*5)
with a 1/nfft forward scale and an unnormalized inverse
(denoise.cpp:291-324).  960 is not an XLA-FFT-friendly size on TPU, and at
~100 frames/s/stream the transform is tiny, so the TPU-native design is a
dense DFT matrix contraction that rides the MXU and fuses with the windowing
and band ops around it.  For batched utterances this is a single
[B*T, 960] x [960, 962] matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from percepnet_tpu import constants as C


def _tables(n: int):
    c, s = C.rdft_matrices(n)
    return jnp.asarray(c), jnp.asarray(s)


def _itables(n: int):
    c, s = C.irdft_matrices(n)
    return jnp.asarray(c), jnp.asarray(s)


def forward_dft(x: jax.Array, *, precision=jax.lax.Precision.HIGHEST):
    """Forward real DFT with 1/n scaling.

    Args:
      x: [..., n] real frames (n = WINDOW_SIZE by default usage).
    Returns:
      (Xr, Xi): each [..., n//2 + 1].  Matches the reference
      forward_transform = FFT(x)/n truncated to the half spectrum.
    """
    n = x.shape[-1]
    c, s = _tables(n)
    xr = jnp.matmul(x, c.T, precision=precision)
    xi = -jnp.matmul(x, s.T, precision=precision)
    return xr, xi


def inverse_dft(xr: jax.Array, xi: jax.Array, *,
                precision=jax.lax.Precision.HIGHEST):
    """Unnormalized inverse real DFT.

    Args:
      xr, xi: [..., n//2 + 1] half spectrum.
    Returns:
      [..., n] real signal.  Matches the reference inverse_transform
      (conjugate-symmetric extension -> forward FFT -> xWINDOW_SIZE with
      reversed output order), i.e. inverse_dft(forward_dft(x)) == x.
    """
    freq = xr.shape[-1]
    n = 2 * (freq - 1)
    c, s = _itables(n)
    return (jnp.matmul(xr, c.T, precision=precision)
            - jnp.matmul(xi, s.T, precision=precision))
