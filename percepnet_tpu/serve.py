"""Multi-stream real-time serving: many concurrent 10 ms streams, one step.

The reference runtime is one stream per process (`percepNet_run`).  On a
TPU chip the economical deployment is many concurrent streams batched into
ONE jitted step per 10 ms tick: a fixed-capacity slot pool holds each
stream's carried DenoiseState pytree; attaching a stream claims a slot
(zero state), detaching frees it.  Slots step together whether or not they
are occupied — occupancy only affects which outputs are surfaced, so there
is no recompilation as streams come and go.

Capacity planning (measured round 3 on one v5e chip, BEFORE the serving
frontend's bf16/comb-store commits — re-measure with
tools/check_tpu.py): the batched tick cost 1.5 / 1.5 / 2.0 ms
compute+dispatch at 64 / 128 / 256 slots — 256 concurrent real-time
streams with 5x headroom against the 10 ms budget on a co-located TPU
host.  (Through a remote device tunnel the per-tick host<->device
transfers dominate instead; batch frames per submit there.)

Usage:
    srv = StreamingServer(params, capacity=64)
    sid = srv.attach()
    out = srv.submit(sid, frame)     # stage one 10 ms frame
    outs = srv.step()                # advance ALL streams one frame
    srv.detach(sid)
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
                 mesh=None, model_dtype=None, log1p_features: bool = False):
        """mesh: optional jax.sharding mesh — slots shard across chips
        (capacity must be divisible by the mesh size), params replicate,
        and the tick becomes one SPMD step over all chips.
        model_dtype: jnp.bfloat16 serves the NN in bf16 (quality gate:
        tools/quality_gate.py).
        log1p_features: required for checkpoints trained with the log1p
        input compression (models.percepnet.compress_features)."""
        self.capacity = capacity
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
        if mesh is not None:
            from percepnet_tpu.parallel import mesh as pm
            assert capacity % mesh.devices.size == 0, \
                "capacity must divide across the mesh"
            data_s = pm.batch_sharding(mesh)
            rep_s = pm.replicated_sharding(mesh)
            self.params = pm.replicate(mesh, params)
            self._step = jax.jit(
                lambda p, s, st: pipeline.enhance_chunk(p, s, st, **kw),
                in_shardings=(rep_s, data_s, data_s),
                out_shardings=(data_s, data_s),
                donate_argnums=(2,))
            self._state = jax.device_put(
                pipeline.init_pipeline_state(
                    capacity, model_dtype=self._model_dtype), data_s)
        else:
            self.params = params
            self._step = jax.jit(
                lambda p, s, st: pipeline.enhance_chunk(p, s, st, **kw),
                donate_argnums=(2,))
            self._state = pipeline.init_pipeline_state(
                capacity, model_dtype=self._model_dtype)
        self._zero_state = jax.tree.map(jnp.copy, self._state)
        self._free = list(range(capacity))[::-1]
        self._active: set[int] = set()
        self._inbuf = np.zeros((capacity, C.FRAME_SIZE), np.float32)

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
        """Stage one 10 ms frame (480 float samples, /32768 scale)."""
        assert sid in self._active, f"stream {sid} not attached"
        self._inbuf[sid, : len(frame)] = frame[: C.FRAME_SIZE]

    def step(self) -> dict[int, np.ndarray]:
        """Advance every stream one frame; returns {sid: enhanced_frame}.

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
