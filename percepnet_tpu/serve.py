"""Multi-stream real-time serving: many concurrent 10 ms streams, one step.

The reference runtime is one stream per process (`percepNet_run`).  On a
TPU chip the economical deployment is many concurrent streams batched into
ONE jitted step per 10 ms tick: a fixed-capacity slot pool holds each
stream's carried DenoiseState pytree; attaching a stream claims a slot
(zero state), detaching frees it.  Slots step together whether or not they
are occupied — occupancy only affects which outputs are surfaced, so there
is no recompilation as streams come and go.

Capacity planning (measured round 5 on one v5e chip, check_tpu #8): the
batched tick COMPUTES in 0.62 / 0.66 / 0.78 ms at 64 / 128 / 256 slots —
256 concurrent real-time streams with >12x headroom against the 10 ms
budget on a co-located TPU host.  Through a remote device tunnel the
per-tick dispatch+transfers dominate instead (30-43 ms full `step()` at
the same slot counts; r5 decomposition: ~26 ms fixed dispatch + link
bytes at ~60 MB/s): set `frames_per_tick=N` so ONE dispatch advances
every stream N frames, amortizing the fixed per-dispatch cost N-fold at
the price of N*10 ms of added buffering latency, and `io_int16=True` to
halve the non-amortizable link bytes (the reference runtime has neither
knob nor need — one stream, in-process, main.cpp:30-39).

Usage:
    srv = StreamingServer(params, capacity=64)   # frames_per_tick=1
    sid = srv.attach()
    out = srv.submit(sid, frame)     # stage one 10 ms frame
    outs = srv.step()                # advance ALL streams one frame
    srv.detach(sid)

With frames_per_tick=N, `submit` stages N*480 samples per stream and
`step` returns N frames per stream, still in one dispatch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from percepnet_tpu import constants as C
from percepnet_tpu import pipeline


class StreamingServer:
    """Fixed-capacity batched streaming enhancer.

    Not thread-safe; drive it from one event loop.  Output frames lag
    input by FRAME_LOOKAHEAD+1 frames (the reference's algorithmic delay);
    after a stream ends, feed `flush_frames()` zero frames to drain.
    """

    def __init__(self, params, capacity: int = 64, *, compat: bool = False,
                 mesh=None, model_dtype=None, log1p_features: bool = False,
                 frames_per_tick: int = 1, io_int16: bool = False):
        """mesh: optional jax.sharding mesh — slots shard across chips
        (capacity must be divisible by the mesh size), params replicate,
        and the tick becomes one SPMD step over all chips.
        model_dtype: jnp.bfloat16 serves the NN in bf16 (quality gate:
        tools/quality_gate.py).
        log1p_features: required for checkpoints trained with the log1p
        input compression (models.percepnet.compress_features).
        frames_per_tick: frames advanced per `step()` dispatch — raise it
        on dispatch-dominated (remote-tunnel) links to amortize the fixed
        per-dispatch cost; adds frames_per_tick*10 ms buffering latency.
        io_int16: move audio over the host<->device link as int16 PCM
        (submit takes raw int16 samples, step returns int16) — halves the
        per-tick link bytes vs float32, which is the marginal cost on a
        bandwidth-limited remote link; /32768 scaling and the C-cast
        truncation to int16 happen ON DEVICE (same convention as
        cli/enhance's PCM writer)."""
        self.capacity = capacity
        assert frames_per_tick >= 1
        self.frames_per_tick = frames_per_tick
        kw = {}
        if compat:
            from percepnet_tpu.ops.activations import sigmoid_approx, \
                tansig_approx
            kw = dict(act_tanh=tansig_approx, act_sigmoid=sigmoid_approx)
        if model_dtype is not None:
            kw["compute_dtype"] = model_dtype
        if log1p_features:
            kw["log1p_features"] = True
        from percepnet_tpu.ops.dispatch import resolve_impl
        kw["impl"] = resolve_impl()   # pinned outside the jit
        self._model_dtype = model_dtype or jnp.float32
        self._io_int16 = io_int16

        def _tick(p, s, st):
            if io_int16:
                s = s.astype(jnp.float32) * (1.0 / 32768.0)
            pcm, new_st = pipeline.enhance_chunk(p, s, st, **kw)
            if io_int16:
                # C-cast truncation toward zero, as in cli/enhance's
                # PCM writer (XLA float->int convert truncates)
                pcm = jnp.clip(pcm * 32768.0, -32768.0, 32767.0).astype(
                    jnp.int16)
            return pcm, new_st

        if mesh is not None:
            from percepnet_tpu.parallel import mesh as pm
            assert capacity % mesh.devices.size == 0, \
                "capacity must divide across the mesh"
            data_s = pm.batch_sharding(mesh)
            rep_s = pm.replicated_sharding(mesh)
            self.params = pm.replicate(mesh, params)
            self._step = jax.jit(
                _tick,
                in_shardings=(rep_s, data_s, data_s),
                out_shardings=(data_s, data_s),
                donate_argnums=(2,))
            self._state = jax.device_put(
                pipeline.init_pipeline_state(
                    capacity, model_dtype=self._model_dtype), data_s)
        else:
            self.params = params
            self._step = jax.jit(_tick, donate_argnums=(2,))
            self._state = pipeline.init_pipeline_state(
                capacity, model_dtype=self._model_dtype)
        self._zero_state = jax.tree.map(jnp.copy, self._state)
        self._free = list(range(capacity))[::-1]
        self._active: set[int] = set()
        self._inbuf = np.zeros(
            (capacity, frames_per_tick * C.FRAME_SIZE),
            np.int16 if io_int16 else np.float32)

    # --- stream lifecycle -------------------------------------------------
    def attach(self) -> int:
        """Claim a slot for a new stream; returns the stream id (slot)."""
        if not self._free:
            raise RuntimeError("server at capacity")
        sid = self._free.pop()
        self._active.add(sid)
        self._reset_slot(sid)
        return sid

    def detach(self, sid: int) -> None:
        self._active.discard(sid)
        self._free.append(sid)

    def _reset_slot(self, sid: int) -> None:
        """Zero one slot's state without touching the others."""
        self._state = jax.tree.map(
            lambda full, zero: full.at[sid].set(zero[sid]),
            self._state, self._zero_state)
        self._inbuf[sid] = 0.0

    # --- ticking ----------------------------------------------------------
    def submit(self, sid: int, frame: np.ndarray) -> None:
        """Stage one tick of audio: frames_per_tick*480 samples — float
        (/32768 scale), or raw int16 PCM when io_int16; shorter
        submissions are zero-padded."""
        assert sid in self._active, f"stream {sid} not attached"
        n = self._inbuf.shape[1]
        self._inbuf[sid, : min(len(frame), n)] = frame[:n]

    def step(self) -> dict[int, np.ndarray]:
        """Advance every stream frames_per_tick frames in ONE dispatch;
        returns {sid: enhanced samples [frames_per_tick*480]}.

        Slots without a submitted frame step on silence (their state
        still advances, like a dropped packet).
        """
        pcm, self._state = self._step(
            self.params, jnp.asarray(self._inbuf), self._state)
        self._inbuf[:] = 0.0
        out = np.asarray(pcm)
        return {sid: out[sid] for sid in self._active}

    @staticmethod
    def flush_frames() -> int:
        return pipeline.flush_frames()
