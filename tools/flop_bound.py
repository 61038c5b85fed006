#!/usr/bin/env python
"""Roofline / speed-of-light analysis of the enhancement pipeline.

For each pipeline stage (same stage cut as tools/profile_pipeline.py) this
computes the two hardware lower bounds on execution time at the bench
shape and the audio-throughput "speed of light" they imply:

  t_flop = FLOPs / MXU peak        (per matmul-precision tier)
  t_mem  = min HBM bytes / HBM BW  (inputs + outputs, perfect fusion)

FLOPs come from XLA itself (`jit(fn).lower(...).cost_analysis()`) for the
scan-free stages — exact for dot/conv shapes, independent of the backend
the HLO is lowered for.  XLA's cost model counts a `scan` body ONCE
(verified on this JAX build), so the scan-shaped stages (the GRU stack,
synthesis OLA) are counted analytically from layer dimensions instead;
the analytic model count reproduces the parameter count (2 FLOPs/param
per frame) as a sanity check.

The point (VERDICT r3 #3): show which stages sit at their FLOP bound
(only a precision-tier change can speed them up), which are
bandwidth-bound, and which are far from both (latency/VPU-bound — the
only ones where kernel work can still win).  With --profile-log the
measured stage times from tools/profile_pipeline.py are merged in and an
efficiency column (bound/measured) is printed.

v5e peaks (defaults): 197 bf16 TFLOP/s on the MXU, 819 GB/s HBM.  f32
matmuls run as multi-pass bf16 on the MXU: DEFAULT precision measures as
3 passes on this chip (the model's 24 ms @ batch 512 == the analytic
3-pass bound), HIGHEST as 6.

Usage:
  python tools/flop_bound.py [--batch 512] [--frames 200] [--serving]
      [--profile-log /tmp/r4_profile_f32.log] [--json]

Runs entirely on host CPU (tracing + HLO cost analysis, no execution);
safe while the TPU tunnel is down.  Reference anchor: the path replaces
denoise.cpp:508-547 (rnnoise_process_frame) over whole utterances.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if os.environ.get("PERCEPNET_PLATFORM", "cpu") == "cpu":
    # analysis only: never touch (or block on) the remote chip
    jax.config.update("jax_platforms", "cpu")


def _tree_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "size"))


def _hlo_flops(fn, *args) -> float:
    ca = jax.jit(fn).lower(*args).cost_analysis()
    if isinstance(ca, (list, tuple)):   # older multi-device shape
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def _model_macs_per_frame() -> int:
    """Per-stream per-frame MACs of the PercepNet stack, from the layer
    dimensions in models/percepnet.py (fc 70->128, conv1 k5 128->512,
    conv2 k3 512->512, gru1..3+gb 512->512, gru_rb 1024->128, heads).
    2 FLOPs/MAC; equals the parameter count by construction."""
    from percepnet_tpu import constants as C

    fc_in, d, g, rb, nb = C.NB_FEATURES, C.CONV_DIM, C.GRU_DIM, \
        C.RB_GRU_DIM, C.NB_BANDS
    fcd = C.FC_DIM
    macs = fc_in * fcd                          # fc
    macs += C.CONV1_KERNEL * fcd * d            # conv1
    macs += C.CONV2_KERNEL * d * d              # conv2
    macs += 4 * (g * 3 * g + g * 3 * g)         # gru1..3, gru_gb (in+hid)
    macs += 2 * g * 3 * rb + rb * 3 * rb        # gru_rb
    macs += 5 * g * nb                          # fc_gb on [conv2,gru1..3,gb]
    macs += rb * nb                             # fc_rb
    return macs


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--serving", action="store_true",
                    help="bf16 serving tier (single-pass MXU) instead of "
                         "the f32 tier")
    ap.add_argument("--profile-log",
                    help="tools/profile_pipeline.py output to merge in")
    ap.add_argument("--peak-bf16-tflops", type=float, default=197.0)
    ap.add_argument("--hbm-gbps", type=float, default=819.0)
    ap.add_argument("--f32-passes", type=int, default=3,
                    help="bf16 MXU passes per f32 matmul (DEFAULT "
                         "precision measures as 3 on v5e; HIGHEST as 6)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    from percepnet_tpu import constants as C
    from percepnet_tpu import pipeline
    from percepnet_tpu.features import frontend
    from percepnet_tpu.ops import bands, comb, dft, pitch, window

    B, T = args.batch, args.frames
    audio_s = B * T * C.FRAME_SIZE / 48000.0
    peak = args.peak_bf16_tflops * 1e12
    passes = 1 if args.serving else args.f32_passes
    bw = args.hbm_gbps * 1e9
    prec = pitch.BF16 if args.serving else pitch.HIGHEST

    # Everything below is abstract (ShapeDtypeStruct): lowering + cost
    # analysis never execute a single real op, so this is safe to run on
    # the contended single host core.
    key = jax.random.PRNGKey(0)
    st = pipeline.init_pipeline_state(1)
    pad_len = st.front.tail.shape[-1] + T * C.FRAME_SIZE
    s_pad = jax.ShapeDtypeStruct((B, pad_len), jnp.float32)
    frame = jax.vmap(frontend._frame, in_axes=(0, None, None, None))

    stages = []  # (name, flops, min_bytes, how, passes)

    # bf16 MXU passes per matmul: the f32 tier runs its DFT/xcorr matmuls
    # at HIGHEST (6 passes, ops/dft.py, ops/pitch.py) but the model at
    # DEFAULT (measures as 3); the serving tier is single-pass bf16.
    hi = 1 if args.serving else 6

    def add(name, flops, io_bytes, how, passes):
        stages.append(dict(name=name, flops=flops, bytes=io_bytes,
                           how=how, passes=passes))

    # --- spectra: framing + window + extended DFT + band energies -------
    def f_spectra(s_pad):
        xw = window.apply_window(
            frame(s_pad, T + C.FRAME_LOOKAHEAD, frontend._X_OFF,
                  C.WINDOW_SIZE))
        if args.serving:
            xw = xw.astype(jnp.bfloat16)
        xr, xi = dft.forward_dft(xw)
        return xr, xi, bands.band_energy(xr, xi)

    out = jax.eval_shape(f_spectra, s_pad)
    add("spectra", _hlo_flops(f_spectra, s_pad),
        _tree_bytes((s_pad,)) + _tree_bytes(out), "hlo", hi)

    # --- pitch MXU sub-stages (scan-free; the decide scan is excluded:
    # XLA counts scan bodies once and its cost is latency, not FLOPs) ---
    ds_sh = jax.eval_shape(lambda s: pitch.downsample_frames_from_stream(
        s, T, frontend._PITCH_OFF), s_pad)
    ds0 = jax.ShapeDtypeStruct(
        (int(jnp.prod(jnp.array(ds_sh.shape[:-1]))), ds_sh.shape[-1]),
        ds_sh.dtype)

    f_xc = lambda d: pitch.full_xcorr(d, prec, impl="tpu")
    out = jax.eval_shape(f_xc, ds0)
    add("xcorr", _hlo_flops(f_xc, ds0),
        _tree_bytes((ds0,)) + _tree_bytes(out), "hlo", hi)

    f_we = lambda d: pitch.forward_window_energies(d, prec, impl="tpu")
    out = jax.eval_shape(f_we, ds0)
    add("wenergy", _hlo_flops(f_we, ds0),
        _tree_bytes((ds0,)) + _tree_bytes(out), "hlo", hi)

    # --- comb: windows + DFT + band energy + coherence ------------------
    # impl='cpu' (XLA gather) lowers off-TPU; the Pallas rotate-extract
    # kernel computes the identical contraction, so FLOPs carry over.
    xr, xi, ex = jax.eval_shape(f_spectra, s_pad)
    period = jax.ShapeDtypeStruct((B, T), jnp.int32)

    def f_comb(s_pad, period, xr, xi, ex):
        pw = comb.comb_filter_windows_batch(
            s_pad, period, frontend._X_OFF, impl="cpu",
            out_dtype=jnp.bfloat16 if args.serving else jnp.float32)
        pr, pi = dft.forward_dft(pw)
        ep = bands.band_energy(pr, pi)
        exp_raw = bands.band_corr(xr[:, :T], xi[:, :T], pr, pi)
        return pr, ep, jnp.clip(
            exp_raw / jnp.sqrt(1e-15 + ex[:, :T] * ep), 0.0, 1.0)

    cargs = (s_pad, period, xr, xi, ex)
    out = jax.eval_shape(f_comb, *cargs)
    add("comb", _hlo_flops(f_comb, *cargs),
        _tree_bytes(cargs) + _tree_bytes(out), "hlo", hi)
    # The FLOP/byte bound above is NOT reachable for the comb windows:
    # each dynamic pitch shift forces per-vreg alignment work the FLOP
    # count doesn't see.  ISA floor per frame: 7 taps x (9 lane-rotates +
    # 8 selects + 8 FMAs on [8,128] vregs) + 8 window muls ~= 183 vreg
    # ops; at ~1 vreg op/cycle (measured) that is the real comb floor —
    # printed below so the efficiency column is read against it.
    comb_isa_floor_s = B * T * (7 * 25 + 8) / 0.94e9

    # --- model: analytic (scan over T) ----------------------------------
    from percepnet_tpu.models import percepnet as M
    params = M.init_params(key)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    macs = _model_macs_per_frame()
    assert abs(macs - n_params) / n_params < 0.01, (macs, n_params)
    wbytes = n_params * (2 if args.serving else 4)
    feat_bytes = B * T * C.NB_FEATURES * 4
    out_bytes = B * T * (2 * C.NB_BANDS) * (2 if args.serving else 4)
    # weights resident in VMEM across scan steps (128 MB v5e VMEM holds
    # the 16/32 MB stack) vs re-streamed from HBM every frame
    add("model", 2.0 * macs * B * T,
        wbytes + feat_bytes + out_bytes, "analytic", passes)
    add("model (weights re-streamed)", 2.0 * macs * B * T,
        wbytes * T + feat_bytes + out_bytes, "analytic", passes)

    # --- synthesis: gains/interp + IDFT + OLA (scan) — analytic ---------
    idft_flops = 2.0 * (2 * C.FREQ_SIZE) * C.WINDOW_SIZE * B * T
    syn_bytes = (B * T * 2 * C.FREQ_SIZE + B * (T + 1) * C.FRAME_SIZE) * 4
    add("synthesis (idft+ola)", idft_flops, syn_bytes, "analytic", hi)

    # --- report ----------------------------------------------------------
    measured = {}
    if args.profile_log:
        pat = re.compile(r"^\s*(.+?)\s+([0-9.]+)\s+ms\s*$")
        for ln in open(args.profile_log):
            m = pat.match(ln)
            if m:
                measured[m.group(1).strip()] = float(m.group(2)) / 1e3

    tier = "bf16x1" if args.serving else f"bf16x{passes} (f32)"
    print(f"# shape batch={B} frames={T} ({audio_s:.0f} audio-s/chunk), "
          f"tier {tier}, peak {args.peak_bf16_tflops:.0f} TFLOP/s bf16, "
          f"HBM {args.hbm_gbps:.0f} GB/s")
    hdr = (f"{'stage':28s} {'GFLOP':>8s} {'t_flop':>8s} {'minGB':>7s} "
           f"{'t_mem':>8s} {'bound':>8s} {'light au/s':>10s}")
    if measured:
        hdr += f" {'meas':>8s} {'eff':>5s}"
    print(hdr)
    total_bound = 0.0
    rows = []
    for s in stages:
        t_flop = s["flops"] * s["passes"] / peak
        t_mem = s["bytes"] / bw
        bound = max(t_flop, t_mem)
        alt = "re-streamed" in s["name"]
        if not alt:
            total_bound += bound
        row = dict(s, t_flop=t_flop, t_mem=t_mem, bound=bound,
                   light=audio_s / bound if bound else float("inf"))
        name_l = s["name"] + ("*" if s["how"] == "analytic" else "")
        line = (f"{name_l:28s} {s['flops'] / 1e9:8.1f} "
                f"{t_flop * 1e3:6.2f}ms {s['bytes'] / 1e9:7.2f} "
                f"{t_mem * 1e3:6.2f}ms {bound * 1e3:6.2f}ms "
                f"{row['light']:10.0f}")
        key = s["name"].split(" (")[0]
        meas = measured.get(key) or measured.get("model f32"
                                                 if key == "model" else key)
        if measured:
            if meas:
                row["measured"] = meas
                line += f" {meas * 1e3:6.1f}ms {bound / meas:4.0%}"
            else:
                line += f" {'-':>8s} {'-':>5s}"
        print(line)
        rows.append(row)
    print(f"{'TOTAL (sum of bounds)':28s} {'':8s} {'':8s} {'':7s} {'':8s} "
          f"{total_bound * 1e3:6.2f}ms {audio_s / total_bound:10.0f}")
    print(f"# comb ISA floor (alignment-inclusive, ~183 vreg-ops/frame "
          f"@ ~1/cycle): {comb_isa_floor_s * 1e3:.1f} ms — the reachable "
          f"comb bound; the FLOP row above ignores mandatory "
          f"rotate+select alignment (ops/comb.py kernel docstring)")
    print("* analytic count (XLA cost model counts scan bodies once); "
          "stages are jitted separately so cross-stage fusion is not "
          "modeled; min bytes assume perfect in-stage fusion.")
    if args.json:
        print(json.dumps({"batch": B, "frames": T, "tier": tier,
                          "audio_s_per_chunk": audio_s,
                          "total_bound_s": total_bound,
                          "speed_of_light_audio_s_per_s":
                              audio_s / total_bound,
                          "stages": rows}))


if __name__ == "__main__":
    main()
