#!/usr/bin/env python3
"""TPU-path correctness checks (run on a real chip: `python tools/check_tpu.py`).

The pytest suite runs on the hermetic CPU mesh, which exercises the XLA
fallbacks but not the Pallas kernels or TPU-only dispatches.  This script
drives those against their reference formulations on the device:

  1. comb Pallas kernel vs the gather formulation (bit-level)
  2. TPU window-energy matmul vs CPU cumsum (drift-bounded)
  3. pipeline streaming == one-shot on TPU
  4. training step runs + loss finite on TPU
  5. training throughput report (recipe shape)
  6. pitch-DECISION parity on-chip: the 200-frame golden set's discrete
     pitch periods vs the C binary (the TPU banded-matmul window energies
     have different tie-breaks than the CPU cumsum; this measures how many
     period decisions actually flip, and their downstream feature effect)
  7. serving-tier (bf16 frontend) pitch-decision audit on the same set
  8. serve tick cost at 64/128/256 slots vs the 10 ms real-time budget
     (DCE-safe chained scan; the README capacity claim)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    assert jax.default_backend() == "tpu", "run on a TPU host"
    from percepnet_tpu import pipeline
    from percepnet_tpu.models import percepnet
    from percepnet_tpu.ops import comb, pitch
    from percepnet_tpu.train import state as ts

    # 1. comb kernel vs gather
    for t in (1, 100, 300):
        b = 4
        pad = jnp.concatenate(
            [jnp.zeros((b, 5280)),
             0.05 * jax.random.normal(jax.random.PRNGKey(t), (b, t * 480))],
            axis=1)
        per = jax.random.randint(jax.random.PRNGKey(t + 1), (b, t), 60, 770)
        o1 = comb._comb_pallas(pad, per, 2400)
        o2 = jax.jit(comb._comb_gather, static_argnums=2)(pad, per, 2400)
        err = float(jnp.max(jnp.abs(o1 - o2)))
        assert err < 1e-6, (t, err)
        # bf16 store tier (blocked 8-row stores for t>=5, f32-store
        # fallback at t=1): the f32-store and bf16-store builds are
        # DIFFERENT Mosaic compilations (the analysis-window multiply is
        # folded into the store), so their f32 values can differ within
        # the accumulation tolerance above — at near-zero elements that
        # is many bf16 ULPs in int16-view distance (observed 7 at t=100
        # on chip).  Gate instead on float error vs the gather reference:
        # a HALF-ULP (round-to-nearest) bf16 bound (2^-8 |x| — Mosaic's
        # f32->bf16 pack rounds to nearest; if a future toolchain
        # truncates instead, the true bound is 1 ULP = 2^-7 |x| and a
        # failure here at large |x| means pack rounding, not a kernel
        # bug) + the established f32 accumulation tolerance.
        o1h = comb._comb_pallas(pad, per, 2400, jnp.bfloat16)
        d = np.abs(np.asarray(o1h, np.float32) - np.asarray(o2))
        bound = 2.0 ** -8 * np.abs(np.asarray(o2)) + 2e-6
        worst = float(np.max(d - bound))
        assert worst <= 0, (t, worst, float(d.max()))
        # Root-cause pin (round-4 check-1 anomaly): the bf16 build's
        # stores must be EXACTLY rn(f32 build's stores) — i.e. the two
        # Mosaic compilations share one accumulation result and differ
        # only by the final round-to-nearest pack.  Post-f79cc42 this
        # holds bit-exactly on chip (tools/bench_comb.py probe); if it
        # ever breaks, the builds' accumulation schedules diverged again
        # and the tolerance gate above is hiding real drift.
        n_diff = int(np.sum(
            np.asarray(o1h).view(np.uint16)
            != np.asarray(o1.astype(jnp.bfloat16)).view(np.uint16)))
        assert n_diff == 0, (t, n_diff)
    print("1. comb Pallas kernel matches gather (f32 bit-level, "
          "bf16 half-ULP rel + f32 accum tol; bf16 store == rn(f32) "
          "exactly)")

    # 2. window energies: matmul (TPU) vs cumsum reference values
    ds = jax.random.normal(jax.random.PRNGKey(3), (1024, 864))
    w_tpu = pitch.forward_window_energies(ds)
    y2 = np.asarray(ds) ** 2
    c = np.concatenate([np.zeros((1024, 1)), np.cumsum(y2, -1)], -1)
    w_ref = c[:, 480 : 480 + 385] - c[:, :385]
    rel = float(np.max(np.abs(np.asarray(w_tpu) - w_ref))
                / np.max(np.abs(w_ref)))
    assert rel < 1e-5, rel
    print(f"2. window-energy matmul within {rel:.2g} of cumsum reference")

    # 3. streaming == one-shot on TPU
    params = percepnet.init_params(jax.random.PRNGKey(0))
    sig = 0.05 * jax.random.normal(jax.random.PRNGKey(4), (2, 20 * 480))
    full, _ = pipeline.enhance_chunk(params, sig,
                                     pipeline.init_pipeline_state(2))
    st = pipeline.init_pipeline_state(2)
    outs = []
    for i in range(4):
        pcm, st = pipeline.enhance_chunk(params, sig[:, i*2400:(i+1)*2400],
                                         st)
        outs.append(np.asarray(pcm))
    err = float(np.max(np.abs(np.concatenate(outs, 1) - np.asarray(full))))
    assert err < 2e-5, err
    print(f"3. streaming == one-shot within {err:.2g}")

    # 4+5. training step + throughput (recipe shape: batch 64 x 2000 frames)
    tx = ts.make_optimizer(1e-4)
    state = ts.init_train_state(jax.random.PRNGKey(0), tx)
    step, _ = ts.make_jitted_steps(tx)
    x = jax.random.uniform(jax.random.PRNGKey(5), (64, 2000, 70))
    y = jax.random.uniform(jax.random.PRNGKey(6), (64, 2000, 68)) * 0.9
    state, loss = step(state, x, y)
    jax.block_until_ready(loss)
    assert np.isfinite(float(loss))
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        state, loss = step(state, x, y)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / n
    audio = 64 * 2000 * 480 / 48_000
    print(f"4. train step OK, loss {float(loss):.4f}")
    print(f"5. training throughput: {audio/dt:.0f} audio-s/s/chip "
          f"({dt*1e3:.0f} ms/step at batch 64 x 20 s)")

    # 6. on-chip pitch-decision parity vs the C binary's golden records
    from percepnet_tpu.features import analyze_utterance
    gold = np.load(os.path.join(os.path.dirname(__file__), os.pardir,
                                "tests", "goldens", "featgen.npz"))
    noisy = jnp.asarray(gold["noisy16"].astype(np.float32))
    out, _ = analyze_utterance(noisy)
    periods = np.round(np.asarray(out["features"][:, 68]) * 588)
    ref_periods = np.round(gold["records"][:, 68] * 588)
    flips = int(np.sum(periods != ref_periods))
    n_frames = len(ref_periods)
    # downstream effect: full 70-d feature drift vs the C records (the
    # net-input features carry x30 on cols 0:68 — denoise.cpp:491-493 —
    # while the record dump is unscaled)
    feat = np.asarray(out["features"])
    ref_feat = gold["records"][:, :70].copy()
    ref_feat[:, :68] *= 30.0
    drift = np.abs(feat - ref_feat) / np.maximum(np.abs(ref_feat), 1e-3)
    match_pct = 100.0 * (n_frames - flips) / n_frames
    print(f"6. on-chip pitch periods: {n_frames - flips}/{n_frames} match "
          f"the C binary ({match_pct:.1f}%); max feature rel-drift "
          f"{drift.max():.2g}")
    # TPU tie-breaks may flip borderline frames; the golden set must stay
    # overwhelmingly decision-identical or the banded-matmul path is wrong
    assert flips <= max(2, n_frames // 50), (
        f"{flips} pitch-period flips on TPU — beyond borderline levels")
    assert drift.max() < 0.05, float(drift.max())

    # 7. serving-tier (bf16 frontend) pitch-decision audit: the single-pass
    # bf16 xcorr/window-energy matmuls must stay overwhelmingly
    # decision-identical to the parity frontend on the same golden set
    out_srv, _ = analyze_utterance(noisy, serving=True)
    p_srv = np.round(np.asarray(out_srv["features"][:, 68]) * 588)
    flips_srv = int(np.sum(p_srv != ref_periods))
    feat_srv = np.asarray(out_srv["features"])
    drift_srv = np.abs(feat_srv - ref_feat) / np.maximum(
        np.abs(ref_feat), 1e-3)
    print(f"7. serving-tier pitch periods: {n_frames - flips_srv}/"
          f"{n_frames} match the C binary; feature rel-drift median "
          f"{np.median(drift_srv):.2g} / p99 "
          f"{np.percentile(drift_srv, 99):.2g} (max {drift_srv.max():.2g} "
          f"on near-zero features)")
    # bf16 correlations flip more borderline frames than the f32 tier;
    # the serving bound is looser but still requires >=95% identical
    # decisions (gross lag errors would show up as wholesale flips)
    assert flips_srv <= max(4, n_frames // 20), (
        f"{flips_srv} pitch-period flips in serving tier")
    # band-energy features in bf16: ~0.4% relative is the expected level
    assert np.median(drift_srv) < 0.02, float(np.median(drift_srv))

    # 8. serve tick cost vs the 10 ms real-time budget (README capacity
    # claim).  DCE-safe: K ticks chained through the carried state inside
    # ONE jit with a perturbed frame, every output consumed; this is the
    # on-device compute+dispatch cost per tick — through a remote tunnel
    # the per-tick host<->device transfers come on top (serve.py).
    from percepnet_tpu.ops.dispatch import resolve_impl
    kw = dict(compute_dtype=jnp.bfloat16, impl=resolve_impl())
    k_ticks = 50
    for cap in (64, 128, 256):
        frame0 = 0.05 * jax.random.normal(jax.random.PRNGKey(8),
                                          (cap, 480), jnp.float32)

        @jax.jit
        def ticks(frame, st):
            def body(carry, i):
                f, s = carry
                pcm, s = pipeline.enhance_chunk(
                    params, f + 1e-6 * i, s, **kw)
                return (f, s), jnp.sum(pcm)
            (_, st), acc = jax.lax.scan(
                body, (frame, st), jnp.arange(k_ticks, dtype=jnp.float32))
            return st, jnp.sum(acc)

        st8 = pipeline.init_pipeline_state(cap, model_dtype=jnp.bfloat16)
        st8, acc = ticks(frame0, st8)      # compile + warmup
        jax.block_until_ready(acc)
        t0 = time.perf_counter()
        st8, acc = ticks(frame0, st8)
        jax.block_until_ready(acc)
        tick_ms = (time.perf_counter() - t0) / k_ticks * 1e3

        # the REAL serve loop pays one dispatch + host transfer per tick
        # (StreamingServer.step); measure it too.  Through a remote
        # tunnel this is dominated by ~3-5 ms dispatch RTT — report
        # both, but gate only the on-device cost (the dispatch share is
        # a property of the host link, not of this code; co-located
        # hosts see the compute number plus <1 ms).
        from percepnet_tpu.serve import StreamingServer
        srv = StreamingServer(params, capacity=cap,
                              model_dtype=jnp.bfloat16)
        sid = srv.attach()
        f_np = np.asarray(frame0[0])
        srv.submit(sid, f_np)
        srv.step()                          # warmup (reuses the jit)
        t0 = time.perf_counter()
        n_real = 20
        for _ in range(n_real):
            srv.submit(sid, f_np)
            srv.step()
        real_ms = (time.perf_counter() - t0) / n_real * 1e3
        print(f"8. serve tick @{cap} slots: {tick_ms:.2f} ms on-device "
              f"compute ({'OK' if tick_ms < 10 else 'OVER'} vs 10 ms "
              f"budget); full step() incl. dispatch+transfers: "
              f"{real_ms:.2f} ms")
        assert tick_ms < 10.0, (cap, tick_ms)

        # frames_per_tick amortization: through a remote link the full
        # step() = fixed dispatch (amortized by N frames/tick) + link
        # bytes/bandwidth (NOT amortizable — r5 measured ~26 ms fixed +
        # ~16 ms/frame marginal at 256 slots with f32 I/O, i.e. the link
        # runs ~60 MB/s and f32 samples cost ~1 MB per frame-equivalent).
        # So 8b serves on the int16 wire format (halves the marginal
        # bytes) at frames_per_tick=16, and the gate is honest physics:
        # pass under the 10 ms real-time budget outright, OR be within
        # 1.35x of the link floor implied by this run's own two f32
        # measurements (then the shortfall is the tunnel's bandwidth, not
        # the server; a co-located deployment has no such link).
        if cap == 256:
            n_ft = 16
            srv_b = StreamingServer(params, capacity=cap,
                                    model_dtype=jnp.bfloat16,
                                    frames_per_tick=n_ft, io_int16=True)
            sid_b = srv_b.attach()
            f_big = np.tile((np.asarray(f_np) * 32768.0).astype(np.int16),
                            n_ft)
            srv_b.submit(sid_b, f_big)
            srv_b.step()                    # warmup/compile
            t0 = time.perf_counter()
            for _ in range(n_real):
                srv_b.submit(sid_b, f_big)
                srv_b.step()
            batch_ms = (time.perf_counter() - t0) / n_real / n_ft * 1e3
            # link floor from this run's f32 single-frame step times:
            # marginal bytes/ms scaled to the int16 wire (x0.5), plus the
            # fixed cost amortized over n_ft
            fixed_ms = max(real_ms - tick_ms, 0.0)   # dispatch+1-frame f32
            f32_frame_bytes = cap * 480 * 4 * 2      # in + out
            # conservative: attribute at most half the 1-frame step to
            # transfer; the rest is RTT/dispatch
            bw_mbps = f32_frame_bytes / 1e6 / max(real_ms / 2, 1e-9) * 1e3
            floor_ms = (f32_frame_bytes / 2) / 1e6 / bw_mbps * 1e3 \
                + fixed_ms / n_ft
            ok = batch_ms < 10.0 or batch_ms < 1.35 * floor_ms
            print(f"8b. serve step @{cap} slots, frames_per_tick={n_ft}, "
                  f"int16 wire: {batch_ms:.2f} ms per frame-equivalent "
                  f"incl. dispatch+transfers "
                  f"({'OK (real-time)' if batch_ms < 10 else ('OK (at link floor ' + format(floor_ms, '.1f') + ' ms, ~' + format(bw_mbps, '.0f') + ' MB/s tunnel — co-located deployments have no such link)') if ok else 'OVER'})")
            assert ok, (cap, n_ft, batch_ms, floor_ms)
    print("TPU CHECKS OK")


if __name__ == "__main__":
    main()
