"""Opt-in data augmentation for feature generation.

The reference carries RNNoise-style augmentation as COMMENTED-OUT code in
`train()` (/root/reference/src/denoise.cpp:670-718): every 2821 frames it
redraws random speech/noise gains and random 2nd-order IIR channel
responses (`rand_resp`, denoise.cpp:596-601) applied per-stream through
`biquad` (denoise.cpp:361-370), plus a fixed DC high-pass
(denoise.cpp:606-607).  That code is dead in the reference build; this
module is its live counterpart, adapted to the premixed DNS pair layout
the reference actually trains on (`xn = n` at denoise.cpp:721 — clean and
noisy arrive already mixed, so a separate noise gain cannot be applied
without unmixing):

  * a random level gain 10^(dB/20), dB ~ U{-40..19} (the reference's
    speech_gain draw, denoise.cpp:674),
  * a random biquad channel response with rand_resp coefficients
    (each of a0,a1,b0,b1 ~ 0.75*U(-.5,.5)),
  * optionally the fixed high-pass (b=[-2,1], a=[-1.99599,0.99600]),

applied IDENTICALLY to the clean and noisy streams, so the clean<->noisy
relationship (and therefore the oracle g/r math) stays coherent.  Draws
are per utterance pair rather than per 2821-frame block: featgen operates
on whole utterances (run.sh uses 2000-frame clips < 2821), so one draw
per pair is the same granularity in practice.

This is host-side data preparation (like the sox stage of run.sh), so it
runs in NumPy on the loader side, not on the TPU.
"""

from __future__ import annotations

import numpy as np

# Fixed DC high-pass of the dormant reference path (denoise.cpp:606-607).
HP_B = (-2.0, 1.0)
HP_A = (-1.99599, 0.99600)


def biquad(x: np.ndarray, b, a, mem=None) -> np.ndarray:
    """Reference `biquad` (denoise.cpp:361-370): transposed direct-form II.

      y[i] = x[i] + m0
      m0   = m1 + (b0*x[i] - a0*y[i])     (double accumulation, as in C)
      m1   =      (b1*x[i] - a1*y[i])

    i.e. H(z) = (1 + b0 z^-1 + b1 z^-2) / (1 + a0 z^-1 + a1 z^-2).
    Vectorized via scipy's C lfilter when available; without scipy, an
    exact log-depth affine-scan fallback (O(n log n) batched 2x2 ops, no
    Python-per-sample loop — featgen-sweep safe).
    """
    b_full = np.array([1.0, b[0], b[1]], np.float64)
    a_full = np.array([1.0, a[0], a[1]], np.float64)
    try:
        from scipy.signal import lfilter
        y = lfilter(b_full, a_full, np.asarray(x, np.float64))
    except ImportError:
        y = _biquad_scan(np.asarray(x, np.float64), b, a)
    return y.astype(np.float32)


def _biquad_scan(x: np.ndarray, b, a) -> np.ndarray:
    """Exact biquad via parallel prefix over the state recurrence.

    Substituting y[i] = x[i] + m0[i-1] into the memory updates gives the
    linear state recurrence s[i] = A s[i-1] + c*x[i] with s = (m0, m1),
    A = [[-a0, 1], [-a1, 0]], c = (b0-a0, b1-a1).  The affine maps
    (A, c*x[i]) compose associatively, so an inclusive prefix by pointer
    doubling yields every state in ceil(log2 n) vectorized passes; with
    zero initial memory the accumulated offsets ARE the states.
    """
    n = len(x)
    if n == 0:
        return x.copy()
    A = np.array([[-a[0], 1.0], [-a[1], 0.0]], np.float64)
    c = np.array([b[0] - a[0], b[1] - a[1]], np.float64)
    M = np.broadcast_to(A, (n, 2, 2)).copy()
    v = x[:, None] * c                       # [n, 2]
    shift = 1
    while shift < n:
        # compose element i with element i-shift (prefix doubling)
        Mh, Ml = M[shift:], M[:-shift]
        v[shift:] += np.einsum("nij,nj->ni", Mh, v[:-shift])
        M[shift:] = np.einsum("nij,njk->nik", Mh, Ml)
        shift *= 2
    y = x.copy()
    y[1:] += v[:-1, 0]                       # y[i] = x[i] + m0[i-1]
    return y


def rand_resp(rng: np.random.Generator):
    """Random 2nd-order channel response (rand_resp, denoise.cpp:596-601):
    returns (a[2], b[2]) with each coefficient ~ 0.75*U(-0.5, 0.5)."""
    a = 0.75 * (rng.random(2) - 0.5)
    b = 0.75 * (rng.random(2) - 0.5)
    return a, b


def draw_gain(rng: np.random.Generator) -> float:
    """Level gain 10^(dB/20), dB ~ U{-40..19} (denoise.cpp:674)."""
    return float(10.0 ** (rng.integers(-40, 20) / 20.0))


def augment_pair(clean: np.ndarray, noisy: np.ndarray,
                 rng: np.random.Generator, *,
                 highpass: bool = False):
    """Randomly re-level and channel-filter a premixed (clean, noisy) pair.

    The SAME gain and response hit both streams, so the oracle targets
    derived from them stay in-distribution (g, r in [0, 1]).

    Args:
      clean, noisy: int16-amplitude float arrays (featgen scale).
      rng: numpy Generator (caller owns seeding for reproducibility).
      highpass: also apply the reference's fixed DC high-pass first.
    Returns:
      (clean_aug, noisy_aug) float32 arrays, same lengths as the inputs.
    """
    gain = draw_gain(rng)
    a, b = rand_resp(rng)

    def chain(x):
        x = np.asarray(x, np.float32) * gain
        if highpass:
            x = biquad(x, HP_B, HP_A)
        return biquad(x, b, a)

    return chain(clean), chain(noisy)
