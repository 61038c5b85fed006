"""Pitch comb filter: P(l) = sum_{k=-3..3} w_k x(t - pitch*k).

The reference accumulates 7 shifted copies of the 960-sample analysis window
from its ring buffer (denoise.cpp:419-422), weighted by the normalized Hann
comb window (denoise.cpp:200-206).

TPU design: the shifts are data-dependent (pitch varies per frame), which
XLA can only express as a giant element gather — measured ~1.7 s for
128x200 frames on a v5e chip, the single hottest op in the frontend.  The
Pallas kernel below instead keeps a tile of the signal in VMEM and, per
frame, issues 7 row-aligned dynamic-slice loads plus a lane rotate
(`pltpu.roll`), turning the gather into pure VMEM traffic: ~45 us for the
same shape (~37,000x).

Layout: the signal is viewed as [rows, 128] lanes.  A 960-sample window at
arbitrary offset o spans 9 rows starting at o//128; the residual o%128 is a
dynamic right-rotate by (1152 - o%128).  Tiles of 128 frames are DMA'd
HBM->VMEM by the kernel itself (BlockSpec tiles cannot overlap, and
neighboring frames share almost all their samples).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from percepnet_tpu import constants as C
from percepnet_tpu.ops.dispatch import resolve_impl

_LANE = 128
_TT = 128           # frames per full tile; tt*480 must divide by 128 (tt%4==0)
_MAX_SHIFT = C.COMB_M * C.PITCH_MAX_PERIOD              # 2304
_WIN_ROWS = C.WINDOW_SIZE // _LANE + 2                  # 9 (unaligned span)
# rows a tile can touch: last frame start (TT-1)*480 + x_off + MAX_SHIFT,
# plus the 9-row read span, relative to the tile base row.
_CHUNK = _WIN_ROWS * _LANE                              # 1152


@functools.lru_cache(maxsize=None)
def _vorbis_rows_np():
    """The 960-sample analysis window laid out as [8, 128] vreg rows
    (lanes 960..1023 zero)."""
    import numpy as np
    vw = np.zeros((8, _LANE), np.float32)
    vw.reshape(-1)[: C.WINDOW_SIZE] = C.full_window()
    return vw


def _pick_tt(t: int) -> int:
    """Frames per tile: full 128 for long utterances, a small multiple of 4
    for short/streaming calls (a T=1 streaming step must not pay for a
    128-frame tile)."""
    return _TT if t >= _TT else max(4, -(-t // 4) * 4)


def _tile_rows(tt: int, x_offset: int) -> int:
    # max period after remove_doubling is 2*384+1 = 769 (pitch.cpp:510-526),
    # so the max shift is 3*769; pad the row count to a multiple of 8.
    max_start = (tt - 1) * C.FRAME_SIZE + x_offset + 3 * (2 * 384 + 1)
    rows = max_start // _LANE + _WIN_ROWS + 1
    return -(-rows // 8) * 8


def _comb_kernel(x_offset, tt, blocked, p_ref, s_hbm, vorbis_ref, out_ref,
                 scratch, sem):
    w = [float(v) for v in C.comb_hann_window()]
    b = pl.program_id(0)
    ti = pl.program_id(1)
    tile_rows = scratch.shape[0]
    rows_per_tile = tt * C.FRAME_SIZE // _LANE
    dma = pltpu.make_async_copy(
        s_hbm.at[b, pl.ds(ti * rows_per_tile, tile_rows), :],
        scratch, sem)
    dma.start()
    dma.wait()

    n_rows = C.WINDOW_SIZE // _LANE + 1                 # 8
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_rows, _LANE), 1)
    # analysis window folded into the store: one multiply per frame here
    # replaces a whole [T, 960] window pass downstream (same f32 multiply,
    # bit-identical result)
    vorbis = vorbis_ref[:, :]

    def acc_for(t):
        p = p_ref[0, 0, t]
        base = t * C.FRAME_SIZE + x_offset
        acc = jnp.zeros((n_rows, _LANE), jnp.float32)
        for kk in range(2 * C.COMB_M + 1):
            start = base - p * (kk - C.COMB_M)
            row = start // _LANE
            sh = start % _LANE
            chunk = scratch[pl.ds(row, _WIN_ROWS), :]   # [9, 128]
            # unaligned window = per-row lane left-rotate by sh, then pick
            # row v for lanes < 128-sh and row v+1 above — one HW rotate
            # per vreg instead of a flat 1152-wide dynamic rotate.
            rot = pltpu.roll(chunk, (_LANE - sh) % _LANE, axis=1)
            shifted = jnp.where(lane < _LANE - sh, rot[:n_rows],
                                rot[1 : n_rows + 1])
            acc = acc + w[kk] * shifted
        return (acc * vorbis).reshape(1, n_rows * _LANE)

    if blocked:
        # 16-bit stores: Mosaic requires the dynamic sublane index of a
        # packed-dtype store to be provably 8-aligned (a single-row store
        # at dynamic t fails to compile), so accumulate 8 frames and store
        # one aligned [8, 960] block at row i*8.
        def body(i, _):
            blk = jnp.concatenate([acc_for(i * 8 + j) for j in range(8)], 0)
            out_ref[0, pl.ds(i * 8, 8), :] = (
                blk[:, : C.WINDOW_SIZE].astype(out_ref.dtype))
            return 0

        lax.fori_loop(0, tt // 8, body, 0)
    else:
        def one(t):
            out_ref[0, t, :] = acc_for(t)[0, : C.WINDOW_SIZE].astype(
                out_ref.dtype)

        # 4-frame unroll amortizes loop/address overhead (-22% measured)
        unroll = 4 if tt % 4 == 0 else 1

        def body(i, _):
            for j in range(unroll):
                one(i * unroll + j)
            return 0

        lax.fori_loop(0, tt // unroll, body, 0)


def _comb_kernel_v2(x_offset, tt, p_ref, s_hbm, vorbis_ref, out_ref,
                    scratch, sem):
    """Row-layout store variant: the [8, 128] accumulator is stored AS-IS
    at 8-aligned sublanes of a [tt*8, 128] output block — no per-frame
    (8,128)->(1,1152) sublane-to-lane relayout and no lane-ragged
    [1, 960] store (960 = 7.5 vregs), the two per-frame costs of the v1
    kernel.  The flat view out.reshape(T, 1024)[:, :960] is row-major
    identical to the v1 window (lanes 960..1023 carry window-zeroed
    garbage the wrapper slices off).  One code path for f32 AND 16-bit
    stores (always 8-aligned), so both builds share the accumulation
    schedule.  Same tile DMA as v1.

    On-chip A/B (tools/bench_comb.py, v5e, B=512 T=200): v2 LOSES to v1
    (23.4 vs 21.1 ms f32, 22.3 vs 20.0 ms bf16) — the relayout/ragged
    stores it removes are cheaper than its extra per-frame store issue,
    so v1 stays the dispatch default.  Both kernels sit at the
    alignment-inclusive VPU floor: per tap-frame the dynamic unaligned
    960-wide window REQUIRES 9 lane-rotates + 8 selects on top of the 8
    FMA rows (~25 vreg ops vs 8 for pure FMA), which is why the measured
    21 ms is ~3.4x the pure-FMA bound in tools/flop_bound.py and cannot
    approach it on this ISA.  v2's value is diagnostic: with ONE store
    path for f32 and bf16 it proved (probe in bench_comb.py) that bf16
    stores are exactly rn(f32) for BOTH kernels — the round-4 check-1
    store divergence does not reproduce post-f79cc42."""
    w = [float(v) for v in C.comb_hann_window()]
    b = pl.program_id(0)
    ti = pl.program_id(1)
    tile_rows = scratch.shape[0]
    rows_per_tile = tt * C.FRAME_SIZE // _LANE
    dma = pltpu.make_async_copy(
        s_hbm.at[b, pl.ds(ti * rows_per_tile, tile_rows), :],
        scratch, sem)
    dma.start()
    dma.wait()

    n_rows = C.WINDOW_SIZE // _LANE + 1                 # 8
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_rows, _LANE), 1)
    vorbis = vorbis_ref[:, :]

    def acc_for(t):
        p = p_ref[0, 0, t]
        base = t * C.FRAME_SIZE + x_offset
        acc = jnp.zeros((n_rows, _LANE), jnp.float32)
        for kk in range(2 * C.COMB_M + 1):
            start = base - p * (kk - C.COMB_M)
            row = start // _LANE
            sh = start % _LANE
            chunk = scratch[pl.ds(row, _WIN_ROWS), :]   # [9, 128]
            rot = pltpu.roll(chunk, (_LANE - sh) % _LANE, axis=1)
            shifted = jnp.where(lane < _LANE - sh, rot[:n_rows],
                                rot[1 : n_rows + 1])
            acc = acc + w[kk] * shifted
        return acc * vorbis                             # [8, 128]

    unroll = 4 if tt % 4 == 0 else 1

    def body(i, _):
        for j in range(unroll):
            t = i * unroll + j
            out_ref[0, pl.ds(t * n_rows, n_rows), :] = (
                acc_for(t).astype(out_ref.dtype))
        return 0

    lax.fori_loop(0, tt // unroll, body, 0)


@functools.partial(jax.jit, static_argnames=("x_offset", "out_dtype"))
def _comb_pallas_v2(s_pad: jax.Array, period: jax.Array, x_offset: int,
                    out_dtype=jnp.float32):
    """v2 kernel wrapper: s_pad [B, n_pad], period [B, T] -> [B, T, 960].

    The kernel writes [B, t_pad*8, 128]; the row-major reshape to
    [B, t_pad, 1024] is layout-free and the :960 lane slice fuses into
    the downstream DFT-matmul operand read."""
    bsz, t = period.shape
    tt = _pick_tt(t)
    n_tiles = -(-t // tt)
    t_pad = n_tiles * tt
    tile_rows = _tile_rows(tt, x_offset)
    rows_per_tile = tt * C.FRAME_SIZE // _LANE
    rows_needed = (n_tiles - 1) * rows_per_tile + tile_rows
    n_pad = rows_needed * _LANE

    s = s_pad
    if s.shape[1] < n_pad:
        s = jnp.pad(s, ((0, 0), (0, n_pad - s.shape[1])))
    else:
        s = s[:, :n_pad]
    s2 = s.reshape(bsz, rows_needed, _LANE)
    p = jnp.pad(period, ((0, 0), (0, t_pad - t)),
                constant_values=C.PITCH_MIN_PERIOD)[:, None, :]

    n_rows = C.WINDOW_SIZE // _LANE + 1                 # 8
    out = pl.pallas_call(
        functools.partial(_comb_kernel_v2, x_offset, tt),
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, tt), lambda b, i: (b, 0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, _LANE), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tt * n_rows, _LANE),
                               lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, t_pad * n_rows, _LANE),
                                       out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_rows, _LANE), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(p, s2, jnp.asarray(_vorbis_rows_np()))
    return out.reshape(bsz, t_pad, n_rows * _LANE)[:, :t, : C.WINDOW_SIZE]


@functools.partial(jax.jit, static_argnames=("x_offset", "out_dtype"))
def _comb_pallas(s_pad: jax.Array, period: jax.Array, x_offset: int,
                 out_dtype=jnp.float32):
    """s_pad [B, n_pad], period [B, T] -> [B, T, 960]."""
    bsz, t = period.shape
    tt = _pick_tt(t)
    n_tiles = -(-t // tt)
    t_pad = n_tiles * tt
    tile_rows = _tile_rows(tt, x_offset)
    rows_per_tile = tt * C.FRAME_SIZE // _LANE
    rows_needed = (n_tiles - 1) * rows_per_tile + tile_rows
    n_pad = rows_needed * _LANE

    s = s_pad
    if s.shape[1] < n_pad:
        s = jnp.pad(s, ((0, 0), (0, n_pad - s.shape[1])))
    else:
        s = s[:, :n_pad]
    s2 = s.reshape(bsz, rows_needed, _LANE)
    # clamp pad-region periods into the valid shift range
    p = jnp.pad(period, ((0, 0), (0, t_pad - t)),
                constant_values=C.PITCH_MIN_PERIOD)[:, None, :]

    # 16-bit dtypes need 8-aligned block stores (see _comb_kernel); tiles
    # not divisible by 8 (short/streaming calls) store f32 and cast after.
    narrow = jnp.dtype(out_dtype).itemsize < 4
    blocked = narrow and tt % 8 == 0
    store_dtype = out_dtype if (not narrow or blocked) else jnp.float32

    out = pl.pallas_call(
        functools.partial(_comb_kernel, x_offset, tt, blocked),
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, tt), lambda b, i: (b, 0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, _LANE), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tt, C.WINDOW_SIZE),
                               lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, t_pad, C.WINDOW_SIZE),
                                       store_dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_rows, _LANE), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(p, s2, jnp.asarray(_vorbis_rows_np()))
    out = out[:, :t, :]
    return out if store_dtype == out_dtype else out.astype(out_dtype)


def _comb_gather(s_pad: jax.Array, period: jax.Array, x_offset: int):
    """Reference formulation: one big (slow on TPU) element gather."""
    w = jnp.asarray(C.comb_hann_window())
    t = period.shape[-1]
    t_idx = jnp.arange(t, dtype=jnp.int32)[:, None, None] * C.FRAME_SIZE
    k = jnp.arange(-C.COMB_M, C.COMB_M + 1, dtype=jnp.int32)[None, :, None]
    i = jnp.arange(C.WINDOW_SIZE, dtype=jnp.int32)[None, None, :]
    idx = t_idx + x_offset - period[..., :, None, None] * k + i

    def one(s, ix):
        return jnp.take(s, ix, axis=0)
    taps = jax.vmap(one)(s_pad, jnp.broadcast_to(
        idx, period.shape[:-1] + idx.shape[-3:]))
    return jnp.einsum("btkw,k->btw", taps, w) * jnp.asarray(C.full_window())


def comb_filter_windows_batch(s_pad: jax.Array, period: jax.Array,
                              x_offset: int,
                              out_dtype=jnp.float32,
                              impl: str | None = None) -> jax.Array:
    """[B, T, WINDOW_SIZE] analysis-windowed comb outputs for a batch.

    Output = apply_window(comb taps sum), i.e. the windowed P buffer fed
    straight to the DFT (denoise.cpp:419-424); the window multiply is
    fused into both implementations.

    Args:
      s_pad: [B, n_pad] padded signals (ring-buffer layout, frontend.PAD
        leading zeros).
      period: [B, T] int32 pitch period per frame.
      x_offset: padded-sample offset of the analysis window (2400).
      out_dtype: output store dtype.  The serving tier passes bfloat16 so
        the kernel stores half the bytes and the downstream bf16 DFT needs
        no separate cast pass (accumulation stays f32 either way).
      impl: explicit 'cpu' (XLA gather) / 'tpu' (Pallas rotate-extract)
        tier; None auto-resolves (ops.dispatch).
    """
    if resolve_impl(impl) == "tpu":
        return _comb_pallas(s_pad, period, x_offset, out_dtype)
    return _comb_gather(s_pad, period, x_offset).astype(out_dtype)


def comb_filter_windows(s_pad: jax.Array, n_frames: int, x_offset: int,
                        period: jax.Array) -> jax.Array:
    """Single-utterance variant: s_pad [n_pad], period [T] -> [T, 960]
    windowed comb outputs."""
    del n_frames
    return comb_filter_windows_batch(s_pad[None], period[None], x_offset)[0]
