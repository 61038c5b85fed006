"""Ground-truth label generation (the reference `train()` math).

Reproduces denoise.cpp:549-589 and the record layout of denoise.cpp:761-773:
138 float32 per frame = [Ey_lookahead(34), Ephaty(34), T(1), pitch_corr(1),
g(34), r(34)].

Faithfulness notes:
  * g is an energy ratio Ex/Ey, not an amplitude ratio (denoise.cpp:573).
  * Eyp correlates the NOISY spectrum with the CLEAN stream's comb spectrum
    (denoise.cpp:736) and normalizes by sqrt(.001 + Ey*Ep_clean).
  * Because the reference builds with TEST=1 by default (denoise.cpp:45-47),
    post_filtering mutates g in place on the oracle path *before* the record
    is written (denoise.cpp:743 vs :772), so the dumped training targets are
    post-filtered gains.  `make_records(apply_postfilter=True)` reproduces
    that; pass False for the un-postfiltered variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from percepnet_tpu import constants as C
from percepnet_tpu.ops import bands
from percepnet_tpu.ops.postfilter import post_filter


def estimate_phat_corr(eyp: jax.Array) -> jax.Array:
    """Ephatp = Eyp / sqrt((1-pna)*Eyp^2 + pna)  (denoise.cpp:549-553)."""
    pna = C.power_noise_attenuation()
    return eyp / jnp.sqrt((1.0 - pna) * eyp * eyp + pna)


def filter_strength_calc(exp: jax.Array, eyp: jax.Array,
                         ephatp: jax.Array) -> jax.Array:
    """Quadratic solve for the pitch-filter strength r (denoise.cpp:555-569)."""
    a = jnp.maximum(0.0, ephatp * ephatp - exp * exp)
    b = ephatp * eyp * (1.0 - exp * exp)
    c = jnp.maximum(0.0, exp * exp - eyp * eyp)
    alpha = (jnp.sqrt(b * b + a * c) - b) / (a + 1e-8)
    return alpha / (1.0 + alpha)


def calc_ideal_gain(ex: jax.Array, ey: jax.Array) -> jax.Array:
    """g = clip(Ex / (1e-4 + Ey), 0, 1)  (denoise.cpp:571-577)."""
    return jnp.clip(ex / (1e-4 + ey), 0.0, 1.0)


def adjust_gain_strength(ephatp: jax.Array, exp: jax.Array,
                         g: jax.Array, r: jax.Array):
    """Attenuate g / force r where coherence can't be restored
    (denoise.cpp:579-589)."""
    cond = ephatp < exp
    g_att = jnp.sqrt((1.0 + C.N0 - exp * exp) / (1.0 + C.N0 - ephatp * ephatp))
    g = jnp.where(cond, g * g_att, g)
    r = jnp.where(cond, 0.99, r)
    return g, r


def make_labels(clean_out: dict, noisy_out: dict, *,
                apply_postfilter: bool = True):
    """Per-frame training targets (g, r) from both streams' analyses.

    Args:
      clean_out, noisy_out: outputs of features.analyze_utterance on the
        clean and noisy signals (raw int16-amplitude scale, NORM_RATIO=1).
    Returns:
      dict(g=[T,34], r=[T,34], eyp=[T,34], ephatp=[T,34]).
    """
    ex, ey = clean_out["ex"], noisy_out["ex"]
    g = calc_ideal_gain(ex, ey)

    # Eyp: noisy spectrum vs CLEAN comb spectrum (denoise.cpp:736-737)
    eyp = bands.band_corr(noisy_out["xr"], noisy_out["xi"],
                          clean_out["pr"], clean_out["pi"])
    eyp = jnp.clip(eyp / jnp.sqrt(1e-3 + ey * clean_out["ep"]), 0.0, 1.0)

    ephatp = estimate_phat_corr(noisy_out["exp"])
    r = filter_strength_calc(clean_out["exp"], noisy_out["exp"], ephatp)
    g, r = adjust_gain_strength(ephatp, clean_out["exp"], g, r)
    if apply_postfilter:
        g = post_filter(g, ey)
    return dict(g=g, r=r, eyp=eyp, ephatp=ephatp)


def make_records(clean_out: dict, noisy_out: dict, *,
                 apply_postfilter: bool = True) -> jax.Array:
    """[..., T, 138] training records in the reference layout
    (denoise.cpp:761-773); accepts single-utterance [T, ...] or batched
    [B, T, ...] analysis dicts."""
    labels = make_labels(clean_out, noisy_out,
                         apply_postfilter=apply_postfilter)
    t = noisy_out["period"].astype(jnp.float32) / C.PITCH_T_NORM
    return jnp.concatenate([
        noisy_out["ey_look"],
        noisy_out["exp"],
        t[..., None],
        noisy_out["corr"][..., None],
        labels["g"],
        labels["r"],
    ], axis=-1)
