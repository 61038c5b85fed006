"""Train state: params + optimizer + step, and the jitted update steps.

The reference trains with Adam(lr=1e-4) on whole-sequence forward passes
(rnn_train.py:335-355, :576).  Here the step is a pure function over a
TrainState pytree, jitted once over a device mesh: batches arrive sharded on
the utterance axis, params/opt-state replicated, and XLA inserts the gradient
all-reduce over ICI.  Unlike the reference (which drops optimizer state and
step count on save, rnn_train.py:320-333), the full state checkpoints.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from percepnet_tpu.models import percepnet
from percepnet_tpu.train.loss import percepnet_loss


class TrainState(NamedTuple):
    params: percepnet.PercepNetParams
    opt_state: Any
    step: jax.Array  # int32 scalar


def make_optimizer(learning_rate: float = 1e-4,
                   clip_norm: float | None = None,
                   skip_nonfinite: bool = True) -> optax.GradientTransformation:
    """Adam as in rnn_train.py:576; optional global-norm clipping (off by
    default for recipe parity — the reference does not clip).

    skip_nonfinite wraps the whole chain in optax.apply_if_finite: a batch
    whose BPTT gradient explodes to inf/NaN is SKIPPED instead of poisoning
    the params.  (Observed in the field: 2000-step BPTT occasionally
    produces an inf global norm; clip_by_global_norm then computes a
    0 * inf = NaN update and the run never recovers.  The reference's own
    loss comment says it "causes NaN, need fix" — rnn_train.py:198; this is
    the fix.  A finite-gradient step is bit-identical either way.)
    """
    tx = optax.adam(learning_rate)
    if clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    if skip_nonfinite:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return tx


def init_train_state(key: jax.Array,
                     tx: optax.GradientTransformation) -> TrainState:
    params = percepnet.init_params(key)
    return TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))


def loss_fn(params, features, targets, gain_mse_weight: float = 0.0,
            log1p_features: bool = False):
    """features [B,T,70] (x30-scaled), targets [B,T,68] = concat(g, r).

    The GRU scan is rematerialized (remat=True): backward recomputes gate
    activations per step, saving several GB of HBM at the recipe shape —
    which is what lets multi-GB device-resident corpora coexist with
    training (see datasets.load_all_chunks).
    """
    g, r, _ = percepnet.forward(params, features, remat=True,
                                log1p_features=log1p_features)
    out = jnp.concatenate([g, r], axis=-1)
    return percepnet_loss(out, targets, gain_mse_weight=gain_mse_weight)


def train_step(state: TrainState, features, targets,
               tx: optax.GradientTransformation,
               gain_mse_weight: float = 0.0,
               log1p_features: bool = False):
    """One SGD step; pure, jit under a closed-over `tx`."""
    loss, grads = jax.value_and_grad(loss_fn)(
        state.params, features, targets, gain_mse_weight, log1p_features)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


def eval_step(state: TrainState, features, targets,
              gain_mse_weight: float = 0.0,
              log1p_features: bool = False):
    return loss_fn(state.params, features, targets, gain_mse_weight,
                   log1p_features)


def make_jitted_steps(tx: optax.GradientTransformation, mesh=None,
                      gain_mse_weight: float = 0.0,
                      log1p_features: bool = False):
    """(train_step, eval_step) jitted; if `mesh` is given, data enters
    sharded on the utterance axis and state stays replicated."""
    w, lg = gain_mse_weight, log1p_features
    if mesh is None:
        step = jax.jit(lambda s, x, y: train_step(s, x, y, tx, w, lg),
                       donate_argnums=(0,))
        return step, jax.jit(lambda s, x, y: eval_step(s, x, y, w, lg))

    from percepnet_tpu.parallel import mesh as pm
    data_s = pm.batch_sharding(mesh)
    rep_s = pm.replicated_sharding(mesh)
    step = jax.jit(
        lambda s, x, y: train_step(s, x, y, tx, w, lg),
        in_shardings=(rep_s, data_s, data_s),
        out_shardings=(rep_s, rep_s),
        donate_argnums=(0,))
    ev = jax.jit(lambda s, x, y: eval_step(s, x, y, w, lg),
                 in_shardings=(rep_s, data_s, data_s),
                 out_shardings=rep_s)
    return step, ev


def make_jitted_index_steps(tx: optax.GradientTransformation, mesh=None,
                            gain_mse_weight: float = 0.0,
                            log1p_features: bool = False):
    """(train_step, eval_step) over a DEVICE-RESIDENT dataset: steps take
    (state, x_all, y_all, idx) and gather the batch on-device, so only the
    int32 indices cross the host link (see datasets.load_all_chunks)."""
    w, lg = gain_mse_weight, log1p_features
    if mesh is None:
        step = jax.jit(
            lambda s, xa, ya, i: train_step(s, xa[i], ya[i], tx, w, lg),
            donate_argnums=(0,))
        ev = jax.jit(lambda s, xa, ya, i: eval_step(s, xa[i], ya[i], w, lg))
        return step, ev

    from percepnet_tpu.parallel import mesh as pm
    data_s = pm.batch_sharding(mesh)
    rep_s = pm.replicated_sharding(mesh)

    def gather(xa, i):
        return jax.lax.with_sharding_constraint(
            jnp.take(xa, i, axis=0), data_s)

    step = jax.jit(
        lambda s, xa, ya, i: train_step(
            s, gather(xa, i), gather(ya, i), tx, w, lg),
        in_shardings=(rep_s, rep_s, rep_s, rep_s),
        out_shardings=(rep_s, rep_s),
        donate_argnums=(0,))
    ev = jax.jit(
        lambda s, xa, ya, i: eval_step(s, gather(xa, i), gather(ya, i), w, lg),
        in_shardings=(rep_s, rep_s, rep_s, rep_s),
        out_shardings=rep_s)
    return step, ev
