"""CELT/Opus pitch stack, batched TPU-native.

The reference (pitch.cpp, celt_lpc.cpp) runs a per-frame pointer loop:
2x decimation + order-4 LPC whitening, a coarse(4x)->fine(2x) ladder of
cross-correlations, and `remove_doubling` octave-error logic with
frame-to-frame hysteresis.

The TPU design computes, for ALL frames of an utterance at once:
  * decimation and whitening as shifts/elementwise ops   (pitch_downsample)
  * the full lag-0..384 autocorrelation xc_all per frame as one batched
    depthwise correlation (rides the conv/MXU path); the reference's fine
    search inner products and every data-dependent lookup in
    remove_doubling become cheap gathers into xc_all
  * pitch_search top-2 selection as vectorized argmax over lag scores
  * remove_doubling as a 14-way vectorized candidate test inside a
    `lax.scan` over frames — the scan exists only because of the
    prev_period/prev_gain hysteresis (pitch.cpp:485-497), everything else
    is parallel across frames.

Geometry (all static): PITCH_BUF_SIZE=1728 -> ds len 864; x_lp = ds[384:]
(480 samples); max_pitch = 588; coarse lags 147, fine lags 294;
half-domain max period 384.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from percepnet_tpu import constants as C
from percepnet_tpu.ops.dispatch import resolve_impl

HIGHEST = lax.Precision.HIGHEST

# Serving tier marker: matmul inputs cast to bf16, ONE native MXU pass,
# f32 accumulation (preferred_element_type).  Used by the bf16 serving
# frontend; the parity path always runs HIGHEST.
BF16 = "bf16"


def _mm(a: jax.Array, b: jax.Array, precision) -> jax.Array:
    """Matmul honoring the precision tier (lax.Precision or BF16)."""
    if precision == BF16:
        return jnp.matmul(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return jnp.matmul(a, b, precision=precision)

_DS_LEN = C.PITCH_BUF_SIZE // 2          # 864
_X_OFF = C.PITCH_MAX_PERIOD // 2         # 384
_X_LEN = _DS_LEN - _X_OFF                # 480
_MAX_PITCH = C.PITCH_MAX_PERIOD - 3 * C.PITCH_MIN_PERIOD   # 588
_COARSE_LAGS = _MAX_PITCH >> 2           # 147
_FINE_LAGS = _MAX_PITCH >> 1             # 294
_MAX_PERIOD_H = C.PITCH_MAX_PERIOD // 2  # 384
_MIN_PERIOD_H = C.PITCH_MIN_PERIOD // 2  # 30

# remove_doubling's subharmonic re-check table (pitch.cpp:423)
_SECOND_CHECK_PY = (0, 0, 3, 2, 3, 2, 5, 2, 3, 2, 3, 2, 5, 2, 3, 2)
_SECOND_CHECK = jnp.array(_SECOND_CHECK_PY, jnp.int32)


def _batched_corr(sig: jax.Array, ker: jax.Array, out_len: int) -> jax.Array:
    """out[b, i] = sum_j ker[b, j] * sig[b, i + j]   for i < out_len.

    Per-row correlation expressed as a depthwise (feature-grouped) conv so
    XLA maps it onto the TPU conv/MXU path instead of a gather blowup.
    """
    b = sig.shape[0]
    lhs = sig[None, :, :]      # N=1, C=b, W
    rhs = ker[:, None, :]      # O=b, I=1, W
    out = lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=b, precision=HIGHEST)
    return out[0, :, :out_len]


@functools.lru_cache(maxsize=None)
def _corr_dft_tables(sig_len: int, ker_len: int, out_len: int):
    """DFT/IDFT matmul tables for frequency-domain batched correlation.

    N is the smallest EVEN circular size with no wraparound for shifts
    < out_len (out_len-1 + ker_len-1 < N) — a dense-matmul DFT has no
    power-of-two constraint, and the exact size saves a whole 128-lane
    MXU tile at the hot shapes (full xcorr: N 1024->864, spectrum
    513->433 columns = 5->4 lane tiles on every pass; coarse search:
    512->394, 257->198 = 3->2).  Returns float32 numpy tables with the
    sig/ker transforms CONCATENATED column-wise ([len, 2(K+1)] cos|sin)
    and the inverse tables STACKED row-wise ([2(K+1), out]), so the
    6-matmul correlation folds into 3 MXU passes (VERDICT r4 #9).
    """
    import numpy as np
    n = max(out_len + ker_len - 1, sig_len)
    n += n % 2
    k = np.arange(n // 2 + 1)
    ang = 2.0 * np.pi * np.outer(np.arange(n), k) / n
    cos, sin = np.cos(ang), np.sin(ang)
    w = np.full(n // 2 + 1, 2.0 / n)
    w[0] = 1.0 / n
    if n % 2 == 0:
        w[-1] = 1.0 / n
    i = np.arange(out_len)
    iang = 2.0 * np.pi * np.outer(k, i) / n
    fwd_s = np.concatenate([cos[:sig_len], sin[:sig_len]], 1)
    fwd_k = np.concatenate([cos[:ker_len], sin[:ker_len]], 1)
    inv = np.concatenate([w[:, None] * np.cos(iang),
                          w[:, None] * np.sin(iang)], 0)
    return (fwd_s.astype(np.float32), fwd_k.astype(np.float32),
            inv.astype(np.float32))


def _corr_dft(sig: jax.Array, ker: jax.Array, out_len: int,
              precision=HIGHEST) -> jax.Array:
    """Frequency-domain _batched_corr: three MXU matmul passes instead of
    the VPU-bound grouped conv (TPU path; ~3x at the full-lag shape).

    c[i] = sum_j ker[j] sig[i+j] = irfft(conj(rfft(ker)) * rfft(sig))[i],
    exact (no circular wraparound) because N >= out_len + ker_len - 1 and
    the DFTs/IDFT are dense matmuls at HIGHEST precision.  The sig and
    ker spectra each come from ONE matmul against a [len, 2(K+1)] cos|sin
    table, and the inverse is ONE matmul of the concatenated [pr|pi]
    against the stacked [icc;ics] table (its 2(K+1)-term accumulation is
    a reassociation of the two-matmul sum).  Numerics: reassociated
    reductions, ~1e-6 relative of the row scale — the same class of
    drift as the banded-matmul window energies; on-chip pitch DECISIONS
    are audited by tools/check_tpu.py check 6.
    """
    fwd_s, fwd_k, inv = map(jnp.asarray, _corr_dft_tables(
        sig.shape[-1], ker.shape[-1], out_len))
    kp1 = fwd_s.shape[1] // 2
    s_sp = _mm(sig, fwd_s, precision)
    k_sp = _mm(ker, fwd_k, precision)
    sr, si = s_sp[..., :kp1], s_sp[..., kp1:]
    kr, ki = k_sp[..., :kp1], k_sp[..., kp1:]
    # with sr/kr = Re(rfft), si/ki = -Im(rfft) (the tables hold +sin):
    pr = kr * sr + ki * si            # Re(conj(K) * S)
    pi = kr * si - ki * sr            # -Im(conj(K) * S)
    return _mm(jnp.concatenate([pr, pi], axis=-1), inv, precision)


# --------------------------------------------------------------------------
# pitch_downsample: 2x decimation + LPC whitening (pitch.cpp:148-216)
# --------------------------------------------------------------------------

def _levinson4(ac: jax.Array) -> jax.Array:
    """Order-4 Levinson-Durbin, unrolled, batched over leading dims.

    Mirrors _celt_lpc (celt_lpc.cpp:37-88) float path including the 1e-5
    division guard and the 30 dB early exit (error < .001*ac[0]): once the
    exit triggers, later coefficients keep their pre-exit values.

    Args:  ac [..., 5] autocorrelation (already noise-floored/lag-windowed).
    Returns: lpc [..., 4].
    """
    ac0 = ac[..., 0]
    lpc = [jnp.zeros_like(ac0) for _ in range(4)]
    error = ac0
    done = ac0 == 0

    def step(i, lpc, error, done):
        rr = ac[..., i + 1]
        for j in range(i):
            rr = rr + lpc[j] * ac[..., i - j]
        r = -rr / (error + 1e-5)
        new = list(lpc)
        new[i] = r
        for j in range((i + 1) >> 1):
            t1, t2 = lpc[j], lpc[i - 1 - j]
            new[j] = t1 + r * t2
            new[i - 1 - j] = t2 + r * t1
        lpc = [jnp.where(done, a, b) for a, b in zip(lpc, new)]
        err2 = error - r * r * error
        error = jnp.where(done, error, err2)
        done = done | (error < 0.001 * ac0)
        return lpc, error, done

    for i in range(4):
        lpc, error, done = step(i, lpc, error, done)
    return jnp.stack(lpc, axis=-1)


def _whiten(ds: jax.Array) -> jax.Array:
    """[..., 864] decimated signal -> LPC-whitened (pitch.cpp:160-216).

    5-lag autocorrelation with noise floor (*1.0001) and lag windowing,
    order-4 LPC, 0.9^i bandwidth expansion, add-a-zero -> 5-tap FIR.
    """
    n = ds.shape[-1]
    # 5-lag autocorrelation: ac[k] = sum_{i>=k} ds[i]*ds[i-k]
    ac = jnp.stack(
        [jnp.sum(ds[..., k:] * ds[..., : n - k] if k else ds * ds, axis=-1)
         for k in range(5)], axis=-1)
    ac = ac.at[..., 0].multiply(1.0001)
    lagw = 1.0 - (0.008 * jnp.arange(1, 5, dtype=jnp.float32)) ** 2
    ac = ac.at[..., 1:].multiply(lagw)

    lpc = _levinson4(ac)
    # bandwidth expansion: lpc[i] *= .9^(i+1)
    lpc = lpc * (0.9 ** jnp.arange(1, 5, dtype=jnp.float32))
    c1 = 0.8
    num = jnp.stack([
        lpc[..., 0] + c1,
        lpc[..., 1] + c1 * lpc[..., 0],
        lpc[..., 2] + c1 * lpc[..., 1],
        lpc[..., 3] + c1 * lpc[..., 2],
        c1 * lpc[..., 3],
    ], axis=-1)

    # celt_fir5: y[i] = ds[i] + sum_m num[m] * ds[i-1-m].  All 5 shifted
    # operands are static slices of ONE zero-padded buffer (values and
    # add order bit-identical to per-tap concatenates) so XLA fuses the
    # whole FIR into a single elementwise pass over ds instead of
    # materializing five [..., n] shifted copies (HBM traffic, the
    # dominant cost of this stage at the bench shape).
    dsp = jnp.pad(ds, [(0, 0)] * (ds.ndim - 1) + [(5, 0)])
    y = ds
    for m in range(5):
        y = y + num[..., m : m + 1] * dsp[..., 4 - m : 4 - m + n]
    return y


def pitch_downsample(x: jax.Array) -> jax.Array:
    """[..., 1728] pitch buffer -> [..., 864] decimated + whitened signal.

    Steps (pitch.cpp:148-216): 2x decimation with a [.25 .5 .25] smoother,
    then _whiten.
    """
    even = x[..., 0::2]
    odd = x[..., 1::2]
    prev_odd = jnp.concatenate(
        [jnp.zeros_like(odd[..., :1]), odd[..., :-1]], axis=-1)
    ds = 0.25 * (prev_odd + odd) + 0.5 * even
    # x_lp[0] = .25*x[1] + .5*x[0]  (prev_odd[0]=0 already gives this)
    return _whiten(ds)


def downsample_frames_from_stream(s_pad: jax.Array, n_frames: int,
                                  offset: int) -> jax.Array:
    """[B, n_pad] signal -> [B, T, 864] decimated+whitened pitch frames.

    Equivalent to pitch_downsample over per-frame [1728] buffers at
    `offset + t*480`, but decimates the STREAM once and frames at hop 240 —
    skipping the [B, T, 1728] buffer materialization.  Column 0 of each
    frame is patched to the buffer-boundary value (.25*x[1] + .5*x[0],
    reference's zero-history start), making the decimated frames
    bit-identical to the per-buffer path.
    """
    even = s_pad[..., 0::2]
    odd = s_pad[..., 1::2]
    prev_odd = jnp.concatenate(
        [jnp.zeros_like(odd[..., :1]), odd[..., :-1]], axis=-1)
    ds_stream = 0.25 * (prev_odd + odd) + 0.5 * even

    # buffer-boundary column: strided slices, no gather.
    # (A Pallas kernel fusing framing+patch+whiten was measured ~3x SLOWER
    # than this XLA path: the 5 per-frame lag autocorrelations need
    # cross-lane tree reductions that dominate; XLA's fused elementwise
    # passes at HBM bandwidth win.)
    end = offset + (n_frames - 1) * C.FRAME_SIZE + 2
    xe = s_pad[..., offset : end : C.FRAME_SIZE]
    xo = s_pad[..., offset + 1 : end : C.FRAME_SIZE]
    col0 = 0.25 * xo + 0.5 * xe

    # Gather-free framing: every frame is a CONTIGUOUS 864-sample slice
    # at hop 240, so 4 static 240-chunk slices + a reshape cover it
    # (chunks t..t+3 span 960 >= 864) — pure data movement, values
    # bit-identical to an index take, and no TPU element-gather lowering
    # (~10 cycles/element) anywhere in the path.
    hop2 = C.FRAME_SIZE // 2
    off2 = offset // 2
    need = off2 + (n_frames + 3) * hop2
    ds_c = ds_stream
    if ds_c.shape[-1] < need:
        ds_c = jnp.pad(ds_c, [(0, 0)] * (ds_c.ndim - 1)
                       + [(0, need - ds_c.shape[-1])])
    r = ds_c[..., off2:need].reshape(*ds_c.shape[:-1], n_frames + 3, hop2)
    dsf = jnp.concatenate([r[..., t : n_frames + t, :] for t in range(4)],
                          axis=-1)[..., :_DS_LEN]
    dsf = jnp.concatenate([col0[..., None], dsf[..., 1:]], axis=-1)
    return _whiten(dsf)


# --------------------------------------------------------------------------
# find_best_pitch (pitch.cpp:46-104), vectorized top-2
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _band_ones(n: int, length: int, n_out: int):
    """Static banded [n, n_out] 0/1 matrix: col j sums rows [j, j+length)."""
    import numpy as np
    m = np.zeros((n, n_out), np.float32)
    for j in range(n_out):
        m[j : j + length, j] = 1.0
    return m


def _window_energy(y: jax.Array, length: int, n_out: int,
                   precision=HIGHEST, impl: str = "cpu") -> jax.Array:
    """W[b, j] = sum_{i<length} y[b, j+i]^2 for j < n_out.

    impl='cpu': cumsum-difference — its reduction order is what the strict
    parity goldens were validated against (a different order flips
    borderline pitch decisions; measured g/r 1.4e-3 vs the 1e-5 gate).
    impl='tpu': banded-ones MXU matmul, ~4x faster; TPU numerics already
    differ from the CPU goldens at the same magnitude through matmul
    tiling, so the tie-break behavior there is covered by the documented
    drift bounds, not bit parity.
    """
    if impl == "tpu":
        band = jnp.asarray(_band_ones(y.shape[-1], length, n_out))
        return _mm(y * y, band, precision)
    y2 = y * y
    c = jnp.cumsum(y2, axis=-1)
    c = jnp.concatenate([jnp.zeros_like(c[..., :1]), c], axis=-1)
    return c[..., length : length + n_out] - c[..., :n_out]


def _sliding_energy(y: jax.Array, length: int, n_lags: int,
                    impl: str = "cpu") -> jax.Array:
    """den[b, i] = max(1, 1 + sum_{j=i}^{i+length-1} y[b, j]^2), i < n_lags."""
    return jnp.maximum(1.0, 1.0 + _window_energy(y, length, n_lags,
                                                 impl=impl))


def _find_best_pitch(xcorr: jax.Array, y: jax.Array, length: int,
                     den: jax.Array | None = None, impl: str = "cpu"):
    """Top-2 lags by normalized correlation score.

    Mirrors find_best_pitch: score_i = (xcorr_i*1e-12)^2 / Syy_i for
    xcorr_i > 0, earliest index wins ties; unconsidered lags keep the
    C-code's initial best_pitch = [0, 1] semantics.  The reference compares
    scores in cross-multiplied form; we use a float32 division, which
    agrees except within ~1 ulp.

    Args:  xcorr [B, M] lag correlations, y [B, >= M+length] signal,
           den: optional precomputed sliding energies (shared with the
           yy lookup table when available).
    Returns: (best0, best1) int32 [B].
    """
    m = xcorr.shape[-1]
    if den is None:
        den = _sliding_energy(y, length, m, impl=impl)
    considered = xcorr > 0
    num = jnp.square(xcorr * 1e-12)
    score = jnp.where(considered, num / den, -1.0)
    cnt = jnp.sum(considered, axis=-1)

    i0 = jnp.argmax(score, axis=-1).astype(jnp.int32)
    iota = jnp.arange(m, dtype=jnp.int32)
    score2 = jnp.where(iota[None, :] == i0[:, None], -2.0, score)
    i1 = jnp.argmax(score2, axis=-1).astype(jnp.int32)

    best0 = jnp.where(cnt > 0, i0, 0)
    best1 = jnp.where(cnt >= 2, i1, jnp.where(cnt == 1, 0, 1))
    return best0, best1


# --------------------------------------------------------------------------
# pitch_search (pitch.cpp:283-386)
# --------------------------------------------------------------------------

def full_xcorr(ds: jax.Array, precision=HIGHEST,
               impl: str | None = None) -> jax.Array:
    """xc_all[b, L] = sum_{j<480} ds[b, 384+j] * ds[b, 384-L+j], L <= 384.

    One batched correlation whose reversed output doubles as the
    reference's fine-search inner products (fine_xcorr[i] = xc_all[384-i])
    and as every lag lookup inside remove_doubling.

    impl='cpu': grouped-conv formulation (the reduction order the strict
    parity goldens were validated against).  impl='tpu': frequency-domain
    matmuls on the MXU (see _corr_dft; decision parity audited on-chip).
    None auto-resolves; see ops.dispatch.
    """
    if resolve_impl(impl) == "tpu":
        rev = _corr_dft(ds, ds[..., _X_OFF:], _MAX_PERIOD_H + 1, precision)
    else:
        rev = _batched_corr(ds, ds[..., _X_OFF:], _MAX_PERIOD_H + 1)
    return rev[..., ::-1]


def pitch_search(ds: jax.Array, xc_all: jax.Array,
                 w: jax.Array | None = None, precision=HIGHEST,
                 impl: str | None = None):
    """Coarse->fine pitch search on the whitened half-rate signal.

    Args:
      ds:     [B, 864] output of pitch_downsample.
      xc_all: [B, 385] output of full_xcorr(ds).
      w:      optional [B, 385] forward_window_energies(ds) to share.
    Returns:
      (pitch_index, pitch_corr): [B] int32 period (already flipped to
      768 - pitch as in denoise.cpp:408) and [B] raw correlation value.
    """
    impl = resolve_impl(impl)
    # --- coarse, 4x domain ---
    x4 = ds[..., _X_OFF::2][..., : _X_LEN // 2]        # 240
    lag4 = (C.PITCH_FRAME_SIZE + _MAX_PITCH) >> 2      # 387
    y4 = ds[..., 0 : 2 * lag4 : 2]                     # 387
    if impl == "tpu":
        xcorr4 = _corr_dft(y4, x4, _COARSE_LAGS, precision)
    else:
        xcorr4 = _batched_corr(y4, x4, _COARSE_LAGS)
    b0c, b1c = _find_best_pitch(xcorr4, y4, _X_LEN // 2, impl=impl)

    # --- fine, 2x domain: only lags within +/-2 of 2*coarse candidates ---
    i = jnp.arange(_FINE_LAGS, dtype=jnp.int32)[None, :]
    near = (jnp.abs(i - 2 * b0c[:, None]) <= 2) | (jnp.abs(i - 2 * b1c[:, None]) <= 2)
    fine_all = xc_all[..., ::-1][..., : _FINE_LAGS]     # fine_xcorr[i] = xc_all[384-i]
    xcorr2 = jnp.where(near, jnp.maximum(-1.0, fine_all), 0.0)
    den_fine = None
    if w is not None:
        den_fine = jnp.maximum(1.0, 1.0 + w[..., : _FINE_LAGS])
    b0, _ = _find_best_pitch(xcorr2, ds, _X_LEN, den=den_fine, impl=impl)

    # --- pseudo-interpolation (pitch.cpp:369-384) ---
    interp_idx = jnp.stack([jnp.maximum(b0 - 1, 0), b0,
                            jnp.minimum(b0 + 1, _FINE_LAGS - 1)], axis=-1)
    vals = _onehot_take(xcorr2, interp_idx)
    bm1, b, bp1 = vals[..., 0], vals[..., 1], vals[..., 2]
    offset = jnp.where(
        (bp1 - bm1) > 0.7 * (b - bm1), 1,
        jnp.where((bm1 - bp1) > 0.7 * (b - bp1), -1, 0)).astype(jnp.int32)
    interior = (b0 > 0) & (b0 < _FINE_LAGS - 1)
    offset = jnp.where(interior, offset, 0)

    pitch = 2 * b0 - offset
    pitch_index = C.PITCH_MAX_PERIOD - pitch
    return pitch_index, b


# --------------------------------------------------------------------------
# remove_doubling (pitch.cpp:424-527)
# --------------------------------------------------------------------------

def forward_window_energies(ds: jax.Array, precision=HIGHEST,
                            impl: str | None = None) -> jax.Array:
    """W[b, j] = sum_{i<480} ds[b, j+i]^2 for j <= 384.

    Shared between the yy lookup (reversed index) and the fine-search
    sliding energies (direct index) — one matmul serves both.
    """
    return _window_energy(ds, _X_LEN, _MAX_PERIOD_H + 1, precision,
                          impl=resolve_impl(impl))


def yy_lookup_table(ds: jax.Array,
                    w: jax.Array | None = None) -> jax.Array:
    """yy[b, i] = max(0, sum_{j<480} ds[b, 384-i+j]^2), i <= 384."""
    if w is None:
        w = forward_window_energies(ds)
    return jnp.maximum(0.0, w[..., ::-1])


def _pitch_gain(xy, xx, yy):
    """compute_pitch_gain (pitch.cpp:417-421): xy / sqrt(1 + xx*yy)."""
    return xy / jnp.sqrt(1.0 + xx * yy)


def _onehot_take(values: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather along the last axis via one-hot compare-reduce.

    values [..., Q], idx [..., K] int32 (must be in range) -> [..., K].
    XLA's TPU lowering of data-dependent gathers runs ~10 cycles/element;
    at these shapes (Q=385, millions of rows) the compare-select-reduce is
    ~10-15x faster and fuses with neighbors.  Semantics match jnp.take
    mode='clip' ONLY if idx is pre-clipped — out-of-range idx returns 0.
    """
    q = values.shape[-1]
    mask = idx[..., :, None] == jnp.arange(q, dtype=idx.dtype)
    return jnp.sum(jnp.where(mask, values[..., None, :], 0.0), axis=-1)


def remove_doubling_precompute(xc_all: jax.Array, yy_look: jax.Array,
                               t0_in: jax.Array) -> dict:
    """Frame-parallel half of remove_doubling.

    Everything in pitch.cpp:424-527 except the prev_period/prev_gain
    hysteresis depends only on the current frame, so it is hoisted out of
    the sequential scan: per frame we precompute, for each of 15 candidates
    (index 0 = keep t0, 1..14 = subharmonic k=2..15), the final corrected
    period and gain that WOULD result if that candidate were the last one
    accepted.  The scan body then reduces to elementwise threshold tests
    and a one-hot select — no gathers.  All lag lookups here go through
    _onehot_take (one call per source array) instead of XLA gathers.

    Args: xc_all [..., 385], yy_look [..., 385], t0_in [...] int32.
    Returns: dict of [..., 15] (or [..., 14]) candidate tensors.
    """
    t0 = jnp.minimum(t0_in // 2, _MAX_PERIOD_H - 1)

    xx = xc_all[..., 0]

    ks = jnp.arange(2, 16, dtype=jnp.int32)
    t1 = (2 * t0[..., None] + ks) // (2 * ks)
    valid = jnp.cumsum((t1 < _MIN_PERIOD_H).astype(jnp.int32), axis=-1) == 0
    sc = _SECOND_CHECK[ks]
    t1b_k2 = jnp.where(t1 + t0[..., None] > _MAX_PERIOD_H, t0[..., None],
                       t0[..., None] + t1)
    t1b = jnp.where(ks == 2, t1b_k2, (2 * sc * t0[..., None] + ks) // (2 * ks))
    # jnp.take's mode='clip' semantics, applied explicitly for _onehot_take
    t1b = jnp.clip(t1b, 0, _MAX_PERIOD_H)

    cand_t = jnp.concatenate([t0[..., None], t1], axis=-1)     # [..., 15]

    # Final pseudo-interp offset (pitch.cpp:510-521) vectorized over ALL
    # lags q (pure shifts — no gather), then one-hot selected at the
    # candidates; the lag-edge clip matches jnp.take's clip semantics.
    c0_all = jnp.concatenate([xc_all[..., :1], xc_all[..., :-1]], axis=-1)
    c2_all = jnp.concatenate([xc_all[..., 1:], xc_all[..., -1:]], axis=-1)
    off_all = jnp.where((c2_all - c0_all) > 0.7 * (xc_all - c0_all), 1,
                        jnp.where((c0_all - c2_all) > 0.7 * (xc_all - c2_all),
                                  -1, 0))
    q = jnp.arange(_MAX_PERIOD_H + 1, dtype=jnp.int32)
    period_all = jnp.maximum(2 * q + off_all, C.PITCH_MIN_PERIOD)

    # Narrow one-hot lookups: candidate k's lag is bounded by its
    # subharmonic range (t1 ~ t0/k, t1b ~ sc*t0/k with t0 <= 383), so a
    # candidate's compare mask only needs its REACHABLE prefix of the
    # lag axis instead of all 385 lanes — bit-identical selection at
    # ~2.4x fewer VPU lane-tiles than one [..., 29, 385] mask (the
    # dominant cost of this stage; VERDICT r4 #4).  Candidates are
    # bucketed into a few equal-width GROUPS (one [..., G, W] mask each)
    # rather than 29 per-candidate reductions: a first cut with 31
    # separate reduces was faster in isolation but broke XLA's fusion
    # schedule inside the full pipeline (bench f32 8576 -> 8233).
    t0max = _MAX_PERIOD_H - 1                    # t0 clamp above
    ks_py = list(range(2, 16))
    w_t1 = {k: (2 * t0max + k) // (2 * k) + 1 for k in ks_py}
    w_t1b = {k: _MAX_PERIOD_H + 1 if k == 2 else
             min((2 * _SECOND_CHECK_PY[k] * t0max + k) // (2 * k),
                 _MAX_PERIOD_H) + 1 for k in ks_py}

    # (kind, k) -> group width; kinds: 0 = t0/p0, 1 = t1[k], 2 = t1b[k]
    members = ([(0, 0)] + [(1, k) for k in ks_py] + [(2, k) for k in ks_py])
    width_of = {(0, 0): t0max + 1,
                **{(1, k): w_t1[k] for k in ks_py},
                **{(2, k): w_t1b[k] for k in ks_py}}
    group_caps = (97, 129, 193, 320, _MAX_PERIOD_H + 1)
    idx_col = {(0, 0): t0,
               **{(1, k): t1[..., k - 2] for k in ks_py},
               **{(2, k): t1b[..., k - 2] for k in ks_py}}

    vals: dict = {}
    for cap in group_caps:
        grp = [m for m in members
               if width_of[m] <= cap and not any(
                   width_of[m] <= c for c in group_caps if c < cap)]
        if not grp:
            continue
        gi = jnp.stack([idx_col[m] for m in grp], axis=-1)    # [..., G]
        mask = gi[..., :, None] == jnp.arange(cap, dtype=jnp.int32)
        xc_g = jnp.sum(jnp.where(mask, xc_all[..., None, :cap], 0.0), -1)
        yy_g = jnp.sum(jnp.where(mask, yy_look[..., None, :cap], 0.0), -1)
        # period lookup only for the t0 row and the t1 rows
        p_rows = [j for j, m in enumerate(grp) if m[0] != 2]
        p_g = jnp.sum(jnp.where(mask[..., p_rows, :],
                                period_all[..., None, :cap], 0), -1)
        for j, m in enumerate(grp):
            vals[m] = (xc_g[..., j], yy_g[..., j])
        for pj, j in enumerate(p_rows):
            vals[grp[j]] += (p_g[..., pj],)

    xy0, yy0, p0c = vals[(0, 0)]
    xc_t1 = jnp.stack([vals[(1, k)][0] for k in ks_py], axis=-1)
    yy_t1 = jnp.stack([vals[(1, k)][1] for k in ks_py], axis=-1)
    xc_t1b = jnp.stack([vals[(2, k)][0] for k in ks_py], axis=-1)
    yy_t1b = jnp.stack([vals[(2, k)][1] for k in ks_py], axis=-1)
    cand_period = jnp.concatenate(
        [p0c[..., None]] + [vals[(1, k)][2][..., None] for k in ks_py],
        axis=-1).astype(jnp.int32)

    g0 = _pitch_gain(xy0, xx, yy0)
    xy_k = 0.5 * (xc_t1 + xc_t1b)
    yy_k = 0.5 * (yy_t1 + yy_t1b)
    g1 = _pitch_gain(xy_k, xx[..., None], yy_k)

    # candidate axis: [t0-fallback, k=2..15]
    cand_g = jnp.concatenate([g0[..., None], g1], axis=-1)
    cand_xy = jnp.concatenate([xy0[..., None], xy_k], axis=-1)
    cand_yy = jnp.concatenate([yy0[..., None], yy_k], axis=-1)

    best_xy = jnp.maximum(0.0, cand_xy)
    pg = jnp.where(cand_yy <= best_xy, 1.0, best_xy / (cand_yy + 1.0))
    pg = jnp.minimum(pg, cand_g)

    return {"t0": t0, "t1": t1, "valid": valid, "g0": g0, "g1": g1,
            "cand_period": cand_period, "cand_gain": pg}


def remove_doubling_select(pre: dict, prev_period: jax.Array,
                           prev_gain: jax.Array):
    """Hysteresis half: prev-state thresholds + last-accepted-k selection.

    Pure elementwise math over the 14 candidates (pitch.cpp:485-508).
    """
    prev = prev_period // 2
    t1, g0 = pre["t1"], pre["g0"]
    ks = jnp.arange(2, 16, dtype=jnp.int32)
    dt = jnp.abs(t1 - prev[..., None])
    # 5*k*k < t0 uses the current frame's t0 (pitch.cpp:490)
    t0_bound = pre["t0"]
    cont = jnp.where(
        dt <= 1, prev_gain[..., None],
        jnp.where((dt <= 2) & (5 * ks * ks < t0_bound[..., None]),
                  0.5 * prev_gain[..., None], 0.0))
    thresh = jnp.where(
        t1 < 3 * _MIN_PERIOD_H,
        jnp.maximum(0.4, 0.85 * g0[..., None] - cont),
        jnp.maximum(0.3, 0.7 * g0[..., None] - cont))
    acc = pre["valid"] & (pre["g1"] > thresh)

    any_acc = jnp.any(acc, axis=-1)
    n = acc.shape[-1]
    rev_idx = n - 1 - jnp.argmax(acc[..., ::-1], axis=-1)
    idx = jnp.where(any_acc, rev_idx + 1, 0).astype(jnp.int32)  # 0 = t0

    onehot = (jnp.arange(n + 1, dtype=jnp.int32) == idx[..., None])
    period = jnp.sum(jnp.where(onehot, pre["cand_period"], 0), axis=-1)
    gain = jnp.sum(jnp.where(onehot, pre["cand_gain"], 0.0), axis=-1)
    return period.astype(jnp.int32), gain


@partial(jax.jit, static_argnames=())
def pitch_track(pitch_bufs: jax.Array,
                init_period: jax.Array | None = None,
                init_gain: jax.Array | None = None):
    """Full pitch tracking over an utterance.

    Args:
      pitch_bufs: [T, 1728] per-frame pitch buffers (sliding windows of the
        input signal; see features.frontend).
      init_period, init_gain: optional scalar hysteresis state (defaults 0).
    Returns:
      dict with period [T] int32, gain [T], corr [T] float32, and the final
      (period, gain) state for streaming continuation.
    """
    return pitch_track_ds(pitch_downsample(pitch_bufs),
                          init_period, init_gain)


@partial(jax.jit, static_argnames=("precision", "impl"))
def pitch_track_ds(ds: jax.Array,
                   init_period: jax.Array | None = None,
                   init_gain: jax.Array | None = None,
                   precision=HIGHEST, impl: str | None = None):
    """pitch_track given precomputed [T, 864] decimated+whitened frames
    (see downsample_frames_from_stream).

    precision: matmul tier for the xcorr / window-energy contractions —
    HIGHEST on the parity path; the bf16 serving frontend passes BF16
    (decision flips audited on-chip by tools/check_tpu.py).
    impl: explicit 'cpu'/'tpu' op tier (ops.dispatch; None auto)."""
    impl = resolve_impl(impl)
    xc = full_xcorr(ds, precision, impl=impl)
    w = forward_window_energies(ds, precision, impl=impl)
    yy = yy_lookup_table(ds, w)
    t0, corr = pitch_search(ds, xc, w, precision, impl=impl)

    pre = remove_doubling_precompute(xc, yy, t0)

    p0 = jnp.asarray(0 if init_period is None else init_period, jnp.int32)
    g0 = jnp.asarray(0.0 if init_gain is None else init_gain, jnp.float32)

    def step(carry, pre_t):
        prev_p, prev_g = carry
        p, g = remove_doubling_select(pre_t, prev_p, prev_g)
        return (p, g), (p, g)

    (fp, fg), (period, gain) = lax.scan(step, (p0, g0), pre)
    return {"period": period, "gain": gain, "corr": corr,
            "final_period": fp, "final_gain": fg}
