#!/usr/bin/env python3
"""Strict single-device CPU parity check vs the reference binaries.

Asserts the north-star gate: enhanced PCM allclose 1e-4 (normalized) against
`percepNet_run`, and oracle/featgen parity against `percepNet`, on true
host-CPU f32 so reduction semantics are closest to the C binary:

  PYTHONPATH=. python3 tools/check_parity.py

(The axon TPU shim rewrites jax_platforms at import, so the cpu override
below is done via jax.config, not env vars.)
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from percepnet_tpu.enhance import enhance_spectra  # noqa: E402
from percepnet_tpu.features import analyze_utterance, make_labels  # noqa: E402
from percepnet_tpu.io.flat_npz import params_from_flat  # noqa: E402
from percepnet_tpu.models import forward, init_params  # noqa: E402
from percepnet_tpu.ops.activations import (  # noqa: E402
    sigmoid_approx, tansig_approx)

GOLD = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def main():
    assert len(jax.devices()) == 1, "run single-device for matched rounding"
    g = np.load(os.path.join(GOLD, "featgen.npz"))
    nn = np.load(os.path.join(GOLD, "nn.npz"))

    # oracle path
    clean_out, _ = analyze_utterance(jnp.asarray(g["clean16"].astype(np.float32)))
    noisy_out, _ = analyze_utterance(jnp.asarray(g["noisy16"].astype(np.float32)))
    lab = make_labels(clean_out, noisy_out)
    pcm, _ = enhance_spectra(noisy_out, lab["g"], lab["r"])
    oracle_err = np.abs(np.asarray(pcm) - g["oracle_pcm"].astype(np.float32)).max() / 32768.0
    print(f"oracle PCM max normalized err: {oracle_err:.3g}")
    assert oracle_err < 1e-4

    # NN path
    params = params_from_flat(init_params(jax.random.PRNGKey(0)), nn)
    front, _ = analyze_utterance(
        jnp.asarray(g["noisy16"].astype(np.float32) / 32768.0))
    gains, strengths, _ = forward(params, front["features"][None],
                                  act_tanh=tansig_approx,
                                  act_sigmoid=sigmoid_approx)
    gr_err = max(np.abs(np.asarray(gains[0]) - nn["gr"][:, :34]).max(),
                 np.abs(np.asarray(strengths[0]) - nn["gr"][:, 34:]).max())
    print(f"g/r max err vs C inference: {gr_err:.3g}")
    # On host CPU f32, our matmuls track the reference's sgemv_accum16
    # within a few ulps even through the 200-step GRU recurrence (measured
    # 4.2e-7).  NOTE this strict gate holds on CPU only: TPU execution
    # (bf16x6 matmuls, different tiling) drifts to a saturated ~1e-3 in
    # g/r by frame ~20 via the same recurrence — see test_nn_parity.py.
    assert gr_err < 1e-5

    pcm, _ = enhance_spectra(front, gains[0], strengths[0])
    ours = np.asarray(pcm)[480:] * 32768.0
    ref = nn["out_pcm"].astype(np.float32)
    nn_err = np.abs(ours[: len(ref)] - ref).max() / 32768.0
    print(f"NN-enhanced PCM max normalized err: {nn_err:.3g}")
    assert nn_err < 1e-4
    print("PARITY OK: all paths < 1e-4 normalized PCM on host CPU")


if __name__ == "__main__":
    main()
