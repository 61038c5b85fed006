"""Enhance PCM files: the `percepNet_run` equivalent (main.cpp:11-41).

Usage:
  python -m percepnet_tpu enhance noisy.pcm out.pcm --weights model.npz
  python -m percepnet_tpu enhance a.pcm b.pcm ... --out-dir enhanced/

Accepts weights as .npz (native), a PyTorch state_dict .pt, or a generated
nnet_data.cpp.  Input/output: raw 48 kHz mono s16le PCM.

Faithful quirks, both default-on to match the reference byte stream:
  * input scaled /32768 (main.cpp:34);
  * the first output frame is dropped (main.cpp:37-38), so output lags
    input by FRAME_LOOKAHEAD+1 frames and is one frame shorter.
Pass --keep-first-frame / --compat=off to disable.

Files are batched together (padded to the longest) so one jit serves all —
the TPU replacement for running the binary once per file.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def load_params(path: str):
    import jax
    from percepnet_tpu.models.percepnet import init_params
    from percepnet_tpu.train import checkpoint as ckpt

    template = init_params(jax.random.PRNGKey(0))
    if path.endswith(".npz"):
        with np.load(path) as z:
            keys = set(z.files)
        if "step" in keys:
            # full TrainState checkpoint: pull the params subtree straight
            # from the npz (no optimizer reconstruction — the opt_state
            # tree depends on the training config and is irrelevant here)
            return ckpt.load_params_from_checkpoint(path, template)
        return ckpt.load_params_npz(path, template)
    if path.endswith((".pt", ".pth")):
        import torch
        from percepnet_tpu.io.torch_import import params_from_state_dict
        return params_from_state_dict(
            torch.load(path, map_location="cpu", weights_only=True))
    if path.endswith(".cpp"):
        from percepnet_tpu.io.nnet_data import params_from_nnet_data_cpp
        return params_from_nnet_data_cpp(path)
    raise ValueError(f"unknown weight format: {path}")


def enhance_files(params, in_paths, out_paths, *, batch_frames: int = 2000,
                  drop_first_frame: bool = True, compat: bool = False,
                  dump_gr_paths=None, model_dtype=None,
                  raw_scale: bool = False, log1p_features: bool = False):
    """raw_scale: feed raw int16 amplitudes instead of /32768.

    The reference has a scale MISMATCH between its two binaries: featgen
    reads raw amplitudes (NORM_RATIO=1, denoise.cpp:41) while
    percepNet_run divides by 32768 (main.cpp:34) — and the band-energy /
    pitch-corr features are NOT scale-invariant, so a net trained on
    featgen records sees ~1e-9x smaller energies under the inference
    scale.  Default False = faithful percepNet_run behavior (the parity
    surface); True = match the training-data scale, which is what a
    checkpoint trained on this recipe actually needs.
    """
    import jax
    import jax.numpy as jnp
    from percepnet_tpu import constants as C
    from percepnet_tpu import pipeline
    from percepnet_tpu.io.pcm import read_pcm16, write_pcm16
    from percepnet_tpu.ops.dispatch import resolve_impl

    kw = {}
    if compat:
        from percepnet_tpu.ops.activations import sigmoid_approx, \
            tansig_approx
        kw = dict(act_tanh=tansig_approx, act_sigmoid=sigmoid_approx)
    if model_dtype is not None:
        kw["compute_dtype"] = model_dtype
    if log1p_features:
        # must match the checkpoint's training config (TrainConfig.
        # log1p_features; see models.percepnet.compress_features)
        kw["log1p_features"] = True
    # pin the op tier OUTSIDE the jit so tracing never reads global state
    kw["impl"] = resolve_impl()

    pcm_scale = 1.0 if raw_scale else 32768.0
    signals = [read_pcm16(p, normalize=not raw_scale) for p in in_paths]
    n_frames = [len(s) // C.FRAME_SIZE for s in signals]
    bsz = len(signals)

    dump_gr = dump_gr_paths is not None
    step = jax.jit(lambda p, s, st: pipeline.enhance_chunk(
        p, s, st, return_gr=dump_gr, **kw), donate_argnums=(2,))
    state = pipeline.init_pipeline_state(
        bsz, model_dtype=model_dtype or jnp.float32)
    chunk = batch_frames * C.FRAME_SIZE
    max_len = max(nf for nf in n_frames) * C.FRAME_SIZE
    # drain the lookahead with zero frames at the end
    total = max_len + pipeline.flush_frames() * C.FRAME_SIZE
    total = -(-total // chunk) * chunk

    outs = [[] for _ in signals]
    grs = [[] for _ in signals]
    for start in range(0, total, chunk):
        block = np.zeros((bsz, chunk), np.float32)
        for i, s in enumerate(signals):
            seg = s[start : start + chunk]
            block[i, : len(seg)] = seg
        if dump_gr:
            pcm, state, (g, r) = step(params, jnp.asarray(block), state)
            gr = np.concatenate([np.asarray(jax.device_get(g)),
                                 np.asarray(jax.device_get(r))], axis=-1)
            for i in range(bsz):
                grs[i].append(gr[i])
        else:
            pcm, state = step(params, jnp.asarray(block), state)
        pcm = np.asarray(jax.device_get(pcm))
        for i in range(bsz):
            outs[i].append(pcm[i])

    for i, (path, nf) in enumerate(zip(out_paths, n_frames)):
        y = np.concatenate(outs[i])
        skip = C.FRAME_SIZE if drop_first_frame else 0
        keep = nf * C.FRAME_SIZE - skip
        write_pcm16(path, y[skip : skip + keep], scale=pcm_scale)
        if dump_gr:
            # the reference's feature_test.raw: per processed frame, 34 g
            # then 34 r float32 (denoise.cpp:533-534) — one record per
            # INPUT frame (no drop), written per file
            np.concatenate(grs[i])[:nf].astype("<f4").tofile(
                dump_gr_paths[i])


def enhance_streaming(params, in_path, out_path, *,
                      drop_first_frame: bool = True, compat: bool = False,
                      model_dtype=None, raw_scale: bool = False,
                      log1p_features: bool = False,
                      report_latency: bool = False):
    """Frame-by-frame streaming enhancement (10 ms hop), like the
    reference binary's loop (main.cpp:30-39): one jitted step per frame
    with a carried state pytree.  Algorithmic latency is the reference's
    60 ms (lookahead) + per-frame compute latency."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from percepnet_tpu import constants as C
    from percepnet_tpu import pipeline
    from percepnet_tpu.io.pcm import read_pcm16, write_pcm16
    from percepnet_tpu.ops.dispatch import resolve_impl

    kw = {}
    if compat:
        from percepnet_tpu.ops.activations import sigmoid_approx, \
            tansig_approx
        kw = dict(act_tanh=tansig_approx, act_sigmoid=sigmoid_approx)
    if model_dtype is not None:
        # bf16 serving tier (model + frontend), same as batch mode; cuts
        # the per-frame step latency on the MXU
        kw["compute_dtype"] = model_dtype
    if log1p_features:
        kw["log1p_features"] = True
    kw["impl"] = resolve_impl()   # pinned outside the jit

    signal = read_pcm16(in_path, normalize=not raw_scale)
    n_frames = len(signal) // C.FRAME_SIZE
    total = n_frames + pipeline.flush_frames()

    # Pre-stage the whole signal on device ONCE and slice each 10 ms frame
    # inside the jitted step (frame index as a device scalar, so one
    # compile serves all frames): the per-frame host->device transfer —
    # a full round trip through a remote-TPU tunnel — disappears from the
    # steady-state loop.  A live-capture caller would instead feed frames
    # directly; file replay is the latency-measurement harness.
    sig_pad = np.zeros(total * C.FRAME_SIZE, np.float32)
    sig_pad[: len(signal)] = signal
    sig_dev = jnp.asarray(sig_pad)

    def _step(p, sig, t, st):
        frame = jax.lax.dynamic_slice(sig, (t * C.FRAME_SIZE,),
                                      (C.FRAME_SIZE,))
        pcm, st2 = pipeline.enhance_chunk(p, frame[None], st, **kw)
        # the frame index rides along as a device carry: the steady-state
        # loop issues NO host->device transfers at all
        return pcm, t + 1, st2

    step = jax.jit(_step, donate_argnums=(2, 3))
    # the carried ModelState must match the model tier's compute dtype
    # (percepnet.forward contract) or every step promotes back to f32
    state_dtype = model_dtype or jnp.float32
    state = pipeline.init_pipeline_state(1, model_dtype=state_dtype)
    # warm up compile
    _, _, state = step(params, sig_dev, jnp.int32(0), state)
    state = pipeline.init_pipeline_state(1, model_dtype=state_dtype)
    t_dev = jnp.int32(0)

    # Frame-by-frame steps; outputs are left async so dispatch pipelines
    # instead of serializing per frame.
    outs = []
    for _ in range(total):
        pcm, t_dev, state = step(params, sig_dev, t_dev, state)
        outs.append(pcm)
    y = np.concatenate([np.asarray(o[0]) for o in outs])
    skip = C.FRAME_SIZE if drop_first_frame else 0
    write_pcm16(out_path, y[skip : skip + n_frames * C.FRAME_SIZE - skip],
                scale=1.0 if raw_scale else 32768.0)
    if report_latency:
        # steady-state per-step wall time (compute + dispatch); input is
        # already device-resident, matching the real loop above
        stt = pipeline.init_pipeline_state(1, model_dtype=state_dtype)
        td = jnp.int32(0)
        o, td, stt = step(params, sig_dev, td, stt)
        jax.block_until_ready(o)
        n = 50
        t0 = time.perf_counter()
        for _ in range(n):
            o, td, stt = step(params, sig_dev, td, stt)
        jax.block_until_ready(o)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"per-frame step time: {ms:.2f} ms "
              f"(budget 10.0 for real-time 48 kHz)")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="percepnet-tpu enhance",
                                 description=__doc__.splitlines()[0])
    ap.add_argument("pcm", nargs="+",
                    help="noisy.pcm out.pcm | inputs... with --out-dir")
    ap.add_argument("--weights", required=True)
    ap.add_argument("--out-dir")
    ap.add_argument("--batch-frames", type=int, default=2000)
    ap.add_argument("--keep-first-frame", action="store_true",
                    help="disable the reference's dropped first frame")
    ap.add_argument("--compat", action="store_true",
                    help="use the C inference tansig/sigmoid tables")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 serving mode (faster MXU path; quality "
                         "gate: tools/quality_gate.py)")
    ap.add_argument("--log1p", action="store_true",
                    help="log1p feature compression at the model boundary "
                         "— required for checkpoints trained with "
                         "log1p_features (see train --log1p-features)")
    ap.add_argument("--raw-scale", action="store_true",
                    help="feed raw int16 amplitudes (the featgen/training "
                         "scale) instead of the reference binary's /32768 "
                         "— required for checkpoints trained on this "
                         "recipe; see enhance_files docstring")
    ap.add_argument("--dump-gr", nargs="?", const="feature_test.raw",
                    metavar="PATH",
                    help="dump per-frame g,r (34+34 float32/frame) like the "
                         "reference's feature_test.raw side channel "
                         "(denoise.cpp:533-534); with --out-dir, one "
                         "<name>.gr.raw per input")
    ap.add_argument("--streaming", action="store_true",
                    help="frame-by-frame real-time mode (one 10 ms frame "
                         "per step, carried state)")
    ap.add_argument("--report-latency", action="store_true")
    args = ap.parse_args(argv)

    if args.out_dir:
        ins = args.pcm
        os.makedirs(args.out_dir, exist_ok=True)
        outs = [os.path.join(args.out_dir, os.path.basename(p)) for p in ins]
    else:
        if len(args.pcm) != 2:
            ap.error("expected: noisy.pcm out.pcm (or use --out-dir)")
        ins, outs = [args.pcm[0]], [args.pcm[1]]

    gr_paths = None
    if args.dump_gr:
        if args.streaming:
            ap.error("--dump-gr is only supported in batch mode")
        if args.out_dir:
            gr_paths = [os.path.join(
                args.out_dir, os.path.basename(p) + ".gr.raw") for p in ins]
        else:
            gr_paths = [args.dump_gr]

    params = load_params(args.weights)
    model_dtype = None
    if args.bf16:
        import jax.numpy as jnp
        model_dtype = jnp.bfloat16
    if args.streaming:
        for i, o in zip(ins, outs):
            enhance_streaming(params, i, o,
                              drop_first_frame=not args.keep_first_frame,
                              compat=args.compat, model_dtype=model_dtype,
                              raw_scale=args.raw_scale,
                              log1p_features=args.log1p,
                              report_latency=args.report_latency)
    else:
        enhance_files(params, ins, outs, batch_frames=args.batch_frames,
                      drop_first_frame=not args.keep_first_frame,
                      compat=args.compat, dump_gr_paths=gr_paths,
                      model_dtype=model_dtype, raw_scale=args.raw_scale,
                      log1p_features=args.log1p)


if __name__ == "__main__":
    main()
