"""Activation functions, including bit-compat variants of the reference's
table-based approximations (vec.h:33-75).

The default model path uses exact jnp.tanh / jax.nn.sigmoid (faster on the
VPU and smoother for training).  `tansig_approx` / `sigmoid_approx` reproduce
the C inference kernels' 201-entry-table approximation for parity testing of
imported C models.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from percepnet_tpu import constants as C


def tansig_approx(x: jax.Array) -> jax.Array:
    """Table-based tanh matching vec.h:53-70 (tansig_approx).

    i = clip(floor(.5 + 25|x|), 0, 200); dx = |x| - .04i; y = T[i];
    y += dx*(1-y^2)*(1 - y*dx); result takes x's sign.
    """
    table = jnp.asarray(C.tansig_table())
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    i = jnp.clip(jnp.floor(0.5 + 25.0 * ax).astype(jnp.int32), 0, 200)
    dx = ax - 0.04 * i.astype(jnp.float32)
    y = table[i]
    dy = 1.0 - y * y
    y = y + dx * dy * (1.0 - y * dx)
    # sign(0) = 0 would zero the (already zero) result at x=0; fine.
    return sign * y


def sigmoid_approx(x: jax.Array) -> jax.Array:
    """Matches vec.h:72-75: .5 + .5*tansig_approx(.5x)."""
    return 0.5 + 0.5 * tansig_approx(0.5 * x)
