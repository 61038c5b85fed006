"""34-band ERB filterbank operations as dense matrix contractions.

The reference walks FFT bins per band with triangular interpolation weights
(compute_band_energy / compute_band_corr / interp_band_gain,
denoise.cpp:89-182).  On TPU these become [34, 481] / [481, 34] matmuls with
precomputed weight matrices (constants.band_energy_matrix /
band_interp_matrix), batched over all frames at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from percepnet_tpu import constants as C


def _energy_mat():
    return jnp.asarray(C.band_energy_matrix())


def _interp_mat():
    return jnp.asarray(C.band_interp_matrix())


def band_energy(xr: jax.Array, xi: jax.Array, *,
                precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Per-band energy [..., NB_BANDS] from half spectrum [..., FREQ_SIZE].

    Mirrors compute_band_energy (denoise.cpp:89-123): triangular split of
    |X|^2 between adjacent bands, edge bands doubled, bins >= 20 kHz ignored.
    """
    power = xr * xr + xi * xi
    return jnp.matmul(power, _energy_mat().T, precision=precision)


def band_corr(xr: jax.Array, xi: jax.Array, pr: jax.Array, pi: jax.Array, *,
              precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Per-band Re<X, P> [..., NB_BANDS] (compute_band_corr, denoise.cpp:125-160)."""
    prod = xr * pr + xi * pi
    return jnp.matmul(prod, _energy_mat().T, precision=precision)


def interp_band_gain(band_g: jax.Array, *,
                     precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Linear interpolation of band values onto bins, [..., FREQ_SIZE].

    Mirrors interp_band_gain (denoise.cpp:162-182) as observed by its
    callers: bins below the top band border get linearly interpolated gains,
    bins at/above the 20 kHz border (400..480) get exactly zero.
    """
    return jnp.matmul(band_g, _interp_mat().T, precision=precision)
