"""End-to-end enhancement pipeline: PCM in -> enhanced PCM out.

Composes the three stages that the reference interleaves per frame inside
`rnnoise_process_frame` (denoise.cpp:508-547):

  features.analyze_utterance   (spectra, bands, pitch, comb, 70-d features)
  models.percepnet.forward     (g, r prediction)
  enhance.enhance_spectra      (pitch filter, band gains, OLA synthesis)

but batched over whole utterances: every per-frame ring buffer becomes a
carried state pytree, so the same jitted function serves
  * offline batch enhancement  (B utterances x T frames at once),
  * streaming                  (B=1, chunks of any frame count, state carried).

Scale convention is the inference one: input PCM / 32768 (main.cpp:34).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from percepnet_tpu import constants as C
from percepnet_tpu import enhance
from percepnet_tpu.features import frontend
from percepnet_tpu.models import percepnet


class PipelineState(NamedTuple):
    """Everything `DenoiseState` (denoise.cpp:61-85) carries, as a pytree."""
    front: frontend.FrontendState
    model: percepnet.ModelState
    synthesis_mem: jax.Array      # [480] OLA carry


def init_pipeline_state(batch: int = 1,
                        model_dtype=jnp.float32) -> PipelineState:
    """Fresh zero state for `batch` independent streams.

    model_dtype: dtype of the carried NN state — pass jnp.bfloat16 when
    serving with enhance_chunk(model_dtype=bfloat16)."""
    front = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape),
        frontend.init_state())
    return PipelineState(
        front=front,
        model=percepnet.init_model_state(batch, model_dtype),
        synthesis_mem=jnp.zeros((batch, C.FRAME_SIZE), jnp.float32))


def enhance_chunk(params: percepnet.PercepNetParams,
                  signal: jax.Array,
                  state: PipelineState, return_gr: bool = False,
                  impl: str | None = None, **model_kw):
    """Enhance a batch of equal-length PCM chunks with carried state.

    Args:
      params: model parameters.
      signal: [B, n_samples] float32 PCM at inference scale (/32768),
        n_samples divisible by FRAME_SIZE.
      state: carried PipelineState for the B streams.
      return_gr: also return the per-frame (g, r) predictions — the
        reference's `feature_test.raw` side channel (denoise.cpp:533-534).
      impl: explicit 'cpu'/'tpu' op tier for the backend-specialized
        frontend ops (ops.dispatch); None auto-resolves at trace time.
        Entry points that jit should resolve it at setup and pass it
        explicitly (the CLI/serve/bench do).
      model_kw: forwarded to percepnet.forward (e.g. compat activations,
        or compute_dtype=jnp.bfloat16 for the bf16 serving mode — pair it
        with init_pipeline_state(batch, model_dtype=jnp.bfloat16)).
        compute_dtype=bfloat16 also selects the serving frontend tier:
        single-pass bf16 MXU matmuls for the DFTs and pitch correlations
        (features.frontend.analyze_batch(serving=True)) instead of the
        parity path's HIGHEST — quality-gated by tools/quality_gate.py.

    Returns:
      (pcm [B, n_samples], new_state) — plus (g, r) [B, T, 34] each when
      return_gr.  As in the reference, output frame t is the enhanced
      version of input frame t - (FRAME_LOOKAHEAD+1); the first frames of
      a fresh stream are therefore silence-of-zeros, and the caller must
      keep feeding (or flush) to drain the lookahead.
    """
    # the serving tier is the bf16 MXU path specifically; an explicit
    # compute_dtype=float32 must stay on the f32 HIGHEST parity frontend
    serving = model_kw.get("compute_dtype") == jnp.bfloat16
    front, fstate = frontend.analyze_batch(signal, state.front,
                                           serving=serving, impl=impl)
    g, r, mstate = percepnet.forward(
        params, front["features"], state.model, **model_kw)

    def one(front_b, g_b, r_b, mem_b):
        return enhance.enhance_spectra(front_b, g_b, r_b, mem_b,
                                       serving=serving)
    pcm, mem = jax.vmap(one)(front, g, r, state.synthesis_mem)
    new_state = PipelineState(fstate, mstate, mem)
    if return_gr:
        return pcm, new_state, (g, r)
    return pcm, new_state


def enhance_utterance(params: percepnet.PercepNetParams,
                      signal: jax.Array, **model_kw):
    """Enhance one whole utterance from a fresh state.

    Args:
      signal: [n_samples] float32 PCM (/32768 scale).
    Returns:
      pcm [n_samples] (delayed by FRAME_LOOKAHEAD+1 frames, like the
      reference binary's output stream).
    """
    pcm, _ = enhance_chunk(params, signal[None], init_pipeline_state(1),
                           **model_kw)
    return pcm[0]


def flush_frames() -> int:
    """Frames of zero-input needed to drain the lookahead pipeline."""
    return C.FRAME_LOOKAHEAD + 1
