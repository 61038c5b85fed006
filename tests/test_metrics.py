"""Sanity properties of the objective quality metrics."""

import numpy as np

from percepnet_tpu.utils import metrics


def _speechlike(n, seed=0, fs=48_000):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    f0 = 140 + 40 * np.sin(2 * np.pi * 1.3 * t)
    sig = np.zeros(n)
    for h in range(1, 6):
        sig += np.sin(2 * np.pi * np.cumsum(h * f0) / fs) / h
    sig *= 0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t) ** 2   # syllabic envelope
    return sig + 0.01 * rng.normal(size=n)


def test_si_sdr_properties():
    x = _speechlike(48_000)
    assert metrics.si_sdr_db(x, x) > 60            # identity: near-perfect
    assert metrics.si_sdr_db(x, 3.7 * x) > 60      # scale-invariant
    noisy = x + 0.3 * np.random.default_rng(1).normal(size=len(x))
    mid = metrics.si_sdr_db(x, noisy)
    assert 0 < mid < 20
    assert metrics.snr_db(x, x) > 60


def test_stoi_orders_degradations():
    x = _speechlike(2 * 48_000)
    rng = np.random.default_rng(2)
    clean_score = metrics.stoi(x, x)
    light = metrics.stoi(x, x + 0.1 * rng.normal(size=len(x)))
    heavy = metrics.stoi(x, x + 2.0 * rng.normal(size=len(x)))
    assert clean_score > 0.95
    assert clean_score >= light > heavy
    assert heavy < 0.6
