"""The PercepNet gain/strength network, TPU-native.

Architecture (mirrors rnn_train.py:105-145 / rnn.cpp:42-81):
  fc:      Linear(70 -> 128)  + ReLU
  conv1:   causal Conv1d(128 -> 512, k=5) + ReLU
  conv2:   causal Conv1d(512 -> 512, k=3) + Tanh
  gru1..3: GRU(512 -> 512)
  gru_gb:  GRU(512 -> 512)            (input: gru3 output)
  gru_rb:  GRU(1024 -> 128)           (input: [gru3, conv2] concat)
  fc_gb:   Linear(2560 -> 34) + Sigmoid  on [conv2, gru1..3, gru_gb]
  fc_rb:   Linear(128 -> 34)  + Sigmoid  on gru_rb
  ~7.96 M parameters.

TPU design notes:
  * Params are a plain pytree of jnp arrays; GRU gate order is PyTorch's
    (r, z, n) so torch checkpoints import without reordering; weight layout
    is [in, out] so the forward pass is right-multiplication on the MXU.
  * The five GRUs run in ONE `lax.scan` over time.  Input projections that
    don't depend on recurrent state (gru1's, and the conv half of gru_rb's)
    are hoisted out of the scan into big [B*T, .] matmuls.
  * The conv stack is K shifted matmuls (K=5,3) — causal alignment matches
    the reference's streaming conv state (nnet.cpp:182-200) and the
    left-pad + right-trim in rnn_train.py:112-129.
  * `act_tanh`/`act_sigmoid` are injectable: exact (training, default) or
    the reference C inference tables (ops.activations) for parity tests.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from percepnet_tpu import constants as C

Params = dict[str, Any]

_P = lax.Precision.DEFAULT


class ModelState(NamedTuple):
    """Streaming state: conv tap memories + 5 GRU hidden states.

    Mirrors RNNState (nnet_data.h:28-38): conv memories hold the last
    (kernel-1) input frames of each conv layer.
    """
    conv1_mem: jax.Array   # [B, 4, 128]
    conv2_mem: jax.Array   # [B, 2, 512]
    h1: jax.Array          # [B, 512]
    h2: jax.Array
    h3: jax.Array
    h_gb: jax.Array        # [B, 512]
    h_rb: jax.Array        # [B, 128]


class PercepNetParams(NamedTuple):
    """Flat named container; each field is a dict of arrays."""
    fc: Params
    conv1: Params
    conv2: Params
    gru1: Params
    gru2: Params
    gru3: Params
    gru_gb: Params
    gru_rb: Params
    fc_gb: Params
    fc_rb: Params


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _linear_init(key, n_in, n_out):
    k1, k2 = jax.random.split(key)
    b = 1.0 / jnp.sqrt(n_in)
    return {"w": _uniform(k1, (n_in, n_out), b), "b": _uniform(k2, (n_out,), b)}


def _conv_init(key, n_in, n_out, kernel):
    k1, k2 = jax.random.split(key)
    b = 1.0 / jnp.sqrt(n_in * kernel)
    return {"w": _uniform(k1, (kernel, n_in, n_out), b),
            "b": _uniform(k2, (n_out,), b)}


def _gru_init(key, n_in, n_hidden):
    ks = jax.random.split(key, 4)
    b = 1.0 / jnp.sqrt(n_hidden)
    return {
        "wi": _uniform(ks[0], (n_in, 3 * n_hidden), b),
        "wh": _uniform(ks[1], (n_hidden, 3 * n_hidden), b),
        "bi": _uniform(ks[2], (3 * n_hidden,), b),
        "bh": _uniform(ks[3], (3 * n_hidden,), b),
    }


def init_params(key: jax.Array) -> PercepNetParams:
    """PyTorch-default uniform init (for training-recipe parity)."""
    ks = jax.random.split(key, 10)
    d, g, rb = C.CONV_DIM, C.GRU_DIM, C.RB_GRU_DIM
    return PercepNetParams(
        fc=_linear_init(ks[0], C.INPUT_DIM, C.FC_DIM),
        conv1=_conv_init(ks[1], C.FC_DIM, d, C.CONV1_KERNEL),
        conv2=_conv_init(ks[2], d, d, C.CONV2_KERNEL),
        gru1=_gru_init(ks[3], d, g),
        gru2=_gru_init(ks[4], g, g),
        gru3=_gru_init(ks[5], g, g),
        gru_gb=_gru_init(ks[6], g, g),
        gru_rb=_gru_init(ks[7], 2 * g, rb),
        fc_gb=_linear_init(ks[8], 5 * d, C.NB_BANDS),
        fc_rb=_linear_init(ks[9], rb, C.NB_BANDS),
    )


def param_count(params: PercepNetParams) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


def init_model_state(batch: int, dtype=jnp.float32) -> ModelState:
    z = lambda s: jnp.zeros(s, dtype)
    return ModelState(
        conv1_mem=z((batch, C.CONV1_KERNEL - 1, C.FC_DIM)),
        conv2_mem=z((batch, C.CONV2_KERNEL - 1, C.CONV_DIM)),
        h1=z((batch, C.GRU_DIM)), h2=z((batch, C.GRU_DIM)),
        h3=z((batch, C.GRU_DIM)), h_gb=z((batch, C.GRU_DIM)),
        h_rb=z((batch, C.RB_GRU_DIM)))


def _causal_conv(p: Params, x: jax.Array, mem: jax.Array, act) -> tuple:
    """Causal 1-D conv as K shifted matmuls.

    x: [B, T, in]; mem: [B, K-1, in] previous frames.
    out[t] = act(b + sum_k w[k] . x[t - (K-1) + k])  — tap k=0 is oldest,
    matching the streaming state layout of nnet.cpp:182-200.
    Returns (out [B, T, out], new_mem).
    """
    k = p["w"].shape[0]
    xp = jnp.concatenate([mem, x], axis=1)     # [B, T+K-1, in]
    t = x.shape[1]
    out = p["b"]
    for i in range(k):
        out = out + jnp.matmul(xp[:, i : i + t, :], p["w"][i], precision=_P)
    return act(out), xp[:, t:, :]


def _gru_cell(p: Params, h: jax.Array, x_proj: jax.Array, sigmoid, tanh):
    """One GRU step given the precomputed input projection x_proj = x@wi+bi.

    PyTorch semantics (reset-after, gate order r,z,n), identical math to
    compute_gru with reset_after=1 (nnet.cpp:120-180):
      r = sig(xr + hr); z = sig(xz + hz); n = tanh(xn + r*hn)
      h' = (1-z)*n + z*h
    """
    n = h.shape[-1]
    gh = jnp.matmul(h, p["wh"], precision=_P) + p["bh"]
    xr, xz, xn = x_proj[..., :n], x_proj[..., n : 2 * n], x_proj[..., 2 * n :]
    hr, hz, hn = gh[..., :n], gh[..., n : 2 * n], gh[..., 2 * n :]
    r = sigmoid(xr + hr)
    z = sigmoid(xz + hz)
    cand = tanh(xn + r * hn)
    return (1.0 - z) * cand + z * h


def _project(p: Params, x: jax.Array) -> jax.Array:
    return jnp.matmul(x, p["wi"], precision=_P) + p["bi"]


def compress_features(features: jax.Array) -> jax.Array:
    """log1p-compress the 68 energy/coherence feature dims (T and corr
    stay raw).

    The reference feeds RAW band energies x30 at int16-amplitude scale
    (create_features denoise.cpp:487-496 + NORM_RATIO=1 denoise.cpp:41)
    — magnitudes up to ~5e8 on real data.  That saturates the fc-ReLU /
    conv-tanh input stack: tanh'(x) underflows to exactly 0 in f32, so
    fc/conv1/conv2 receive literally zero gradient and never train (the
    reference's torch recipe shares this pathology; measured here on the
    trained checkpoints — every downstream path runs through conv2, so
    the whole input stack is frozen at init and conv2's output is a
    saturated ±1 pattern).  log1p keeps [0, ~30]-scale features nearly
    linear while compressing energies into a trainable range.  Opt-in:
    models trained with it must enhance with it (and cannot be exported
    to the C++ runtime, whose compute_rnn has no such transform)."""
    return jnp.concatenate(
        [jnp.log1p(features[..., :68]), features[..., 68:]], axis=-1)


def forward(params: PercepNetParams, features: jax.Array,
            state: ModelState | None = None, *,
            act_tanh: Callable = jnp.tanh,
            act_sigmoid: Callable = jax.nn.sigmoid,
            remat: bool = False,
            compute_dtype=None,
            log1p_features: bool = False):
    """Whole-sequence forward pass.

    Args:
      features: [B, T, 70] model input (already x30-scaled).
      log1p_features: apply compress_features at the model boundary
        (records/features stay reference-format; see compress_features).
      state: optional streaming ModelState (None = zeros).
      remat: rematerialize the GRU scan step (jax.checkpoint): backward
        recomputes each step's gate activations instead of storing
        [B, T, 512]-sized intermediates for all five GRUs — cuts training
        activation memory several GB at the recipe shape so large
        device-resident corpora fit HBM.  Trades ~1 extra forward of
        scan FLOPs inside backward.
      compute_dtype: optional serving dtype (jnp.bfloat16): params,
        activations, and the GRU recurrence run in that dtype (one native
        MXU pass per matmul instead of the f32 bf16x3 decomposition,
        f32 accumulation as always on TPU); g/r are returned in f32.  The
        carried ModelState must be created with the same dtype.  Quality
        gate: tools/quality_gate.py measures the end-to-end ΔSTOI/ΔSI-SDR
        of bf16 vs f32 serving on enhanced speech.
    Returns:
      (g [B, T, 34], r [B, T, 34], new_state)
    """
    b, t, _ = features.shape
    if log1p_features:
        features = compress_features(features)
    if state is None:
        state = init_model_state(b, compute_dtype or jnp.float32)
    if compute_dtype is not None:
        params = jax.tree.map(lambda x: x.astype(compute_dtype), params)
        features = features.astype(compute_dtype)

    x = jax.nn.relu(jnp.matmul(features, params.fc["w"], precision=_P)
                    + params.fc["b"])
    c1, c1_mem = _causal_conv(params.conv1, x, state.conv1_mem, jax.nn.relu)
    conv_out, c2_mem = _causal_conv(params.conv2, c1, state.conv2_mem, act_tanh)

    # Hoist state-independent input projections out of the scan.
    pre1 = _project(params.gru1, conv_out)                       # [B,T,1536]
    g = C.GRU_DIM
    pre_rb_conv = jnp.matmul(conv_out, params.gru_rb["wi"][g:], precision=_P) \
        + params.gru_rb["bi"]                                     # [B,T,384]

    def step(carry, inp):
        h1, h2, h3, hgb, hrb = carry
        p1, prbc = inp
        h1 = _gru_cell(params.gru1, h1, p1, act_sigmoid, act_tanh)
        h2 = _gru_cell(params.gru2, h2, _project(params.gru2, h1),
                       act_sigmoid, act_tanh)
        h3 = _gru_cell(params.gru3, h3, _project(params.gru3, h2),
                       act_sigmoid, act_tanh)
        hgb = _gru_cell(params.gru_gb, hgb, _project(params.gru_gb, h3),
                        act_sigmoid, act_tanh)
        prb = prbc + jnp.matmul(h3, params.gru_rb["wi"][:g], precision=_P)
        hrb = _gru_cell(params.gru_rb, hrb, prb, act_sigmoid, act_tanh)
        return (h1, h2, h3, hgb, hrb), (h1, h2, h3, hgb, hrb)

    init = (state.h1, state.h2, state.h3, state.h_gb, state.h_rb)
    # scan over time: move T to the leading axis
    xs = (jnp.moveaxis(pre1, 1, 0), jnp.moveaxis(pre_rb_conv, 1, 0))
    carry, ys = lax.scan(jax.checkpoint(step) if remat else step, init, xs)
    h1s, h2s, h3s, hgbs, hrbs = ys                      # [T, B, .]

    # Apply the output heads in scan layout ([T, B, .]) and transpose only
    # the 34-wide results — transposing five [T, B, 512] stacks costs ~2 GB
    # of relayout traffic at production batch sizes.
    d = C.CONV_DIM
    w_gb = params.fc_gb["w"]
    gb_logits = (jnp.matmul(jnp.moveaxis(conv_out, 1, 0), w_gb[:d],
                            precision=_P)
                 + jnp.matmul(h1s, w_gb[d : 2 * d], precision=_P)
                 + jnp.matmul(h2s, w_gb[2 * d : 3 * d], precision=_P)
                 + jnp.matmul(h3s, w_gb[3 * d : 4 * d], precision=_P)
                 + jnp.matmul(hgbs, w_gb[4 * d :], precision=_P)
                 + params.fc_gb["b"])
    gains = act_sigmoid(jnp.moveaxis(gb_logits, 0, 1).astype(jnp.float32))
    strengths = act_sigmoid(jnp.moveaxis(
        jnp.matmul(hrbs, params.fc_rb["w"], precision=_P)
        + params.fc_rb["b"], 0, 1).astype(jnp.float32))

    new_state = ModelState(c1_mem, c2_mem, *carry)
    return gains, strengths, new_state


def forward_stream(params: PercepNetParams, features: jax.Array,
                   state: ModelState, **kw):
    """Single-frame streaming step: features [B, 70] -> (g, r, state)."""
    g, r, st = forward(params, features[:, None, :], state, **kw)
    return g[:, 0], r[:, 0], st
