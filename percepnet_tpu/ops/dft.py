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


import functools


@functools.lru_cache(maxsize=None)
def _fwd_table(n: int):
    """[n, 2*(n//2+1)] fused [cos | -sin] forward table (one matmul)."""
    import numpy as np
    c, s = C.rdft_matrices(n)
    return np.concatenate([c, -s], axis=0).T.copy()


@functools.lru_cache(maxsize=None)
def _inv_table(n: int):
    """[2*(n//2+1), n] fused [cos; -sin] inverse table (one matmul)."""
    import numpy as np
    c, s = C.irdft_matrices(n)
    return np.concatenate([c, -s], axis=1).T.copy()


def forward_dft(x: jax.Array, *, precision=jax.lax.Precision.HIGHEST):
    """Forward real DFT with 1/n scaling.

    Args:
      x: [..., n] real frames (n = WINDOW_SIZE by default usage).
    Returns:
      (Xr, Xi): each [..., n//2 + 1].  Matches the reference
      forward_transform = FFT(x)/n truncated to the half spectrum.

    One fused [n, 2*freq] matmul produces both parts.  precision=HIGHEST
    (bf16x6) is load-bearing: the 1e-4 PCM parity gate fails at DEFAULT
    (bf16x3) because band energies square the spectra.

    Perf note: a Pallas kernel fusing framing+window into this matmul
    (signal tiles in VMEM, rotate-extract, per-tile [128,960] matmuls) was
    measured ~1.8x SLOWER than XLA's fused gather+multiply+giant-matmul —
    the single [B*T, 960] x [960, 1924] contraction gets far better MXU
    utilization than 128-row tiles.  Keep the matmul in XLA's hands.

    Serving tier: pass x as bfloat16 — the table is cast to match and the
    contraction runs as ONE native MXU pass with f32 accumulation
    (preferred_element_type), returning f32 spectra.  ~6x the HIGHEST
    matmul rate; quality-gated end to end by tools/quality_gate.py.
    """
    n = x.shape[-1]
    freq = n // 2 + 1
    table = jnp.asarray(_fwd_table(n)).astype(x.dtype)
    xcs = jnp.matmul(x, table, precision=precision,
                     preferred_element_type=jnp.float32)
    return xcs[..., :freq], xcs[..., freq:]


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
    z = jnp.concatenate([xr, xi], axis=-1)
    table = jnp.asarray(_inv_table(n)).astype(z.dtype)
    return jnp.matmul(z, table, precision=precision,
                      preferred_element_type=jnp.float32)
