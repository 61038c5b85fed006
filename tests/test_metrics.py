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


def test_stoi_identity_is_one():
    x = _speechlike(3 * 48_000, seed=3)
    assert abs(metrics.stoi(x, x) - 1.0) < 1e-9


def test_stoi_ignores_ultrasonic_noise():
    """STOI is defined on 150 Hz-4.3 kHz third-octave bands at 10 kHz; a
    proper band-limited resampler must reject noise above 5 kHz entirely
    (a linear-interp resampler aliases it into the bands and fails this)."""
    fs = 48_000
    x = _speechlike(2 * fs, seed=4)
    rng = np.random.default_rng(5)
    noise = rng.normal(size=len(x))
    # keep only 6-20 kHz content
    spec = np.fft.rfft(noise)
    f = np.fft.rfftfreq(len(x), 1 / fs)
    spec[(f < 6000) | (f > 20000)] = 0
    hf_noise = np.fft.irfft(spec, len(x))
    hf_noise *= np.sqrt(np.mean(x**2) / np.mean(hf_noise**2))  # 0 dB SNR
    assert metrics.stoi(x, x + hf_noise) > 0.97


def test_stoi_silence_removal():
    """Appending shared silence must not move the score (silent-frame
    removal, Taal et al. 2011 sec. II-A)."""
    fs = 48_000
    x = _speechlike(2 * fs, seed=6)
    rng = np.random.default_rng(7)
    y = x + 0.2 * rng.normal(size=len(x))
    pad = np.zeros(fs)
    a = metrics.stoi(x, y)
    b = metrics.stoi(np.concatenate([x, pad]), np.concatenate([y, pad]))
    assert abs(a - b) < 0.02


def test_stoi_anchor_ranges():
    """Coarse calibration anchors: white noise at moderate/severe SNR on
    BROADBAND modulated speech-like signals should land in the ranges the
    STOI paper's speech-in-noise curves show (Taal et al. 2011, fig. 5).
    The signal must cover all 15 third-octave bands (150 Hz-4.3 kHz) like
    real speech, or noise-only bands drag the mean down."""
    fs = 48_000
    n = 3 * fs
    t = np.arange(n) / fs
    f0 = 120 + 30 * np.sin(2 * np.pi * 1.7 * t)
    phase = np.cumsum(f0) / fs
    x = np.zeros(n)
    for h in range(1, 40):                      # harmonics up to ~4.8 kHz
        x += np.sin(2 * np.pi * h * phase) / np.sqrt(h)
    x *= 0.4 + 0.6 * np.sin(2 * np.pi * 3.0 * t) ** 2
    rng = np.random.default_rng(9)
    noise = rng.normal(size=len(x))

    def at_snr(db):
        n = noise * np.sqrt(np.mean(x**2) / np.mean(noise**2)
                            * 10 ** (-db / 10))
        return metrics.stoi(x, x + n)

    assert at_snr(20) > 0.9
    assert 0.55 < at_snr(0) < 0.95
    assert at_snr(-10) < at_snr(0)
    assert at_snr(-10) < 0.75


def test_pesq_like_behavior():
    """P.862-structured score: identity near ceiling, monotonic vs SNR,
    constant-delay invariant (see utils.pesq calibration caveat)."""
    from percepnet_tpu.utils.pesq import pesq_like
    fs = 48_000
    n = 3 * fs
    t = np.arange(n) / fs
    f0 = 120 + 30 * np.sin(2 * np.pi * 1.7 * t)
    phase = np.cumsum(f0) / fs
    x = np.zeros(n)
    for h in range(1, 40):
        x += np.sin(2 * np.pi * h * phase) / np.sqrt(h)
    x *= 0.4 + 0.6 * np.sin(2 * np.pi * 3.0 * t) ** 2
    rng = np.random.default_rng(10)
    noise = rng.normal(size=n)

    def at_snr(db):
        nn = noise * np.sqrt(np.mean(x**2) / np.mean(noise**2)
                             * 10 ** (-db / 10))
        return pesq_like(x, x + nn)

    assert pesq_like(x, x) > 4.3
    s20, s10, s0 = at_snr(20), at_snr(10), at_snr(0)
    assert 4.64 >= s20 > s10 > s0 >= 1.0
    assert s0 < 2.0
    delayed = np.concatenate([np.zeros(4800), x])[:n]
    assert abs(pesq_like(x, delayed) - pesq_like(x, x)) < 0.1


def test_pesq_like_silent_reference_is_nan_not_warning():
    """A silent reference has no defined quality score: explicit NaN, no
    numpy empty-slice warnings (observed leaking into quality_gate JSON)."""
    import warnings

    from percepnet_tpu.utils.pesq import pesq_like
    rng = np.random.default_rng(0)
    deg = rng.normal(0, 100, 48000)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        score = pesq_like(np.zeros(48000), deg)
    assert np.isnan(score)


def test_synth_dns_finite_for_tiny_tail_segments():
    """A 1-sample tail segment used to produce 0/0 in the f0 drift track
    (t[-1]=0) and NaN the WHOLE utterance, which int16-cast to an all-zero
    pair (observed: fileid_4029).  Every synth output must be finite and
    non-silent."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "synth_dns", os.path.join(os.path.dirname(__file__), os.pardir,
                                  "tools", "synth_dns.py"))
    sd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sd)

    rng = np.random.default_rng(1)
    seg = sd._voiced_segment(1, 120.0, rng)   # the degenerate length
    assert np.isfinite(seg).all()
    for seed in range(3):
        clean, noisy, _ = sd.make_pair(1.0, np.random.default_rng(seed))
        assert np.count_nonzero(clean) > 0 and np.count_nonzero(noisy) > 0
