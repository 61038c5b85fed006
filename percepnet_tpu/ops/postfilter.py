"""TeaPoly envelope post-filter (post_filtering, denoise.cpp:216-250)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from percepnet_tpu import constants as C


def post_filter(g: jax.Array, ey: jax.Array) -> jax.Array:
    """Warp per-band gains and apply global energy compensation.

    g_w = g * sin(pi/2 * g);  E_div = sum(g*Ey) / (sum(g_w*Ey) + 1e-6);
    G = sqrt((1+beta) E_div / (1 + beta E_div^2));  returns G * g_w.

    In the reference this runs only on the oracle/TEST path
    (denoise.cpp:743), which means the dumped training targets are
    post-filtered gains — we reproduce that in the label generator.

    Args:
      g:  [..., NB_BANDS] gains.
      ey: [..., NB_BANDS] noisy band energies.
    """
    beta = C.ENVELOPE_POSTFILTERING_BETA
    g_w = g * jnp.sin((jnp.pi / 2.0) * g)
    e0 = jnp.sum(g * ey, axis=-1, keepdims=True)
    e1 = jnp.sum(g_w * ey, axis=-1, keepdims=True)
    e_div = e0 / (e1 + 1e-6)
    big_g = jnp.sqrt(((1 + beta) * e_div) / (1 + beta * e_div * e_div))
    return big_g * g_w
