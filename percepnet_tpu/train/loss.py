"""PercepNet training loss (rnn_train.py:153-176, paper eq. 7).

L = mean((g^γ - ĝ^γ)^2) + C4 * mean((g^γ - ĝ^γ)^4)
  + mean(((1-r)^γ - (1-r̂)^γ)^2),   γ = 0.5, C4 = 10.

The reference computes x^0.5 directly, whose gradient is infinite at 0 (the
code comments that it "causes NaN, need fix" — rnn_train.py:198).  We keep
the loss *value* identical but make training robust: `grad_eps` is added
inside sqrt only (default 1e-10, set 0.0 for bit-matching values AND the
reference's NaN behavior).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

GAMMA = 0.5
C4 = 10.0


def percepnet_loss(outputs: jax.Array, targets: jax.Array,
                   grad_eps: float = 1e-10,
                   gain_mse_weight: float = 0.0) -> jax.Array:
    """outputs/targets: [..., 68] = concat(g[34], r[34]).

    gain_mse_weight: optional extra LINEAR-domain gain MSE term,
    `w * mean((g - ĝ)^2)`.  The paper's γ=0.5 loss compresses the high-
    gain end (d√g/dg → 1/2 at g=1 vs ∞ at 0), so a model trained on a
    small corpus under-predicts gains in speech-dominant bands — measured
    ĝ≈0.49 where g>0.7 on the synthetic DNS recipe, i.e. ~3 dB of speech
    attenuation exactly where intelligibility lives.  The linear term
    restores pressure at the high end.  Default 0.0 = reference-faithful
    loss (rnn_train.py:153-176)."""
    g_hat, r_hat = outputs[..., :34], outputs[..., 34:68]
    g, r = targets[..., :34], targets[..., 34:68]

    def pow_g(x):
        return jnp.sqrt(x + grad_eps)

    dg = pow_g(g) - pow_g(g_hat)
    dr = pow_g(1.0 - r) - pow_g(1.0 - r_hat)
    loss = (jnp.mean(dg * dg) + C4 * jnp.mean(dg ** 4)
            + jnp.mean(dr * dr))
    if gain_mse_weight:
        lin = g - g_hat
        loss = loss + gain_mse_weight * jnp.mean(lin * lin)
    return loss
