"""End-to-end NN inference parity vs the reference `percepNet_run` binary.

Goldens (tests/goldens/nn.npz, from tools/make_nn_goldens.py): random
PyTorch-init weights emitted as nnet_data.cpp, compiled into the reference
runtime, run over 200 frames of synthetic noisy PCM.  With compat
activations (the C tansig table), our whole pipeline — frontend features,
scanned GRU model, pitch filter, gains, OLA — must reproduce the C output
within the 1e-4 normalized-PCM gate.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from percepnet_tpu.enhance import enhance_spectra
from percepnet_tpu.features import analyze_utterance
from percepnet_tpu.io.flat_npz import params_from_flat
from percepnet_tpu.models import forward, init_params
from percepnet_tpu.ops.activations import sigmoid_approx, tansig_approx

GOLD = os.path.join(os.path.dirname(__file__), "goldens", "nn.npz")


@pytest.fixture(scope="module")
def nn_run(featgen_goldens):
    nn = np.load(GOLD)
    params = params_from_flat(init_params(jax.random.PRNGKey(0)), nn)
    noisy = jnp.asarray(featgen_goldens["noisy16"].astype(np.float32) / 32768.0)
    front, _ = analyze_utterance(noisy)
    g, r, _ = forward(params, front["features"][None],
                      act_tanh=tansig_approx, act_sigmoid=sigmoid_approx)
    return nn, front, g[0], r[0]


# Tolerance note: on single-device host CPU f32 the strict gates hold
# end-to-end (g/r 4.2e-7, PCM 3.1e-5 — tools/check_parity.py asserts
# 1e-5/1e-4).  On TPU, bf16x6 matmuls and different tiling perturb each GRU
# step by ~1e-7..1e-5 and the recurrence amplifies that to a saturated
# ~1e-3 in g/r by frame ~20 (measured on identical reference-dumped
# features).  The bounds are therefore BACKEND-CONDITIONAL: the strict
# gate is asserted in-suite whenever the suite runs on CPU (the hermetic
# test mesh), so a parity regression cannot hide behind the TPU bound.

_ON_CPU = jax.default_backend() == "cpu"
_GR_ATOL = 1e-5 if _ON_CPU else 3e-3
_PCM_ATOL = 1e-4 if _ON_CPU else 5e-4


def test_gains_strengths_match_c(nn_run):
    nn, _, g, r = nn_run
    gr = nn["gr"]
    np.testing.assert_allclose(np.asarray(g), gr[:, :34], atol=_GR_ATOL)
    np.testing.assert_allclose(np.asarray(r), gr[:, 34:], atol=_GR_ATOL)


def test_enhanced_pcm_matches_c(nn_run):
    nn, front, g, r = nn_run
    pcm, _ = enhance_spectra(front, g, r)
    ours = np.asarray(pcm) * 32768.0
    ref = nn["out_pcm"].astype(np.float32)
    # the reference drops its first output frame (main.cpp:37)
    ours = ours[480 : 480 + len(ref)]
    err = np.abs(ours - ref) / 32768.0
    assert err.max() < _PCM_ATOL, f"max normalized PCM err {err.max():.3g}"
