"""End-to-end parity of the feature/label/oracle-enhance pipeline against
the compiled reference `percepNet` binary (TRAINING=1) on synthetic PCM.

Golden data: tests/goldens/featgen.npz, produced by tools/make_goldens.py
(200 frames of harmonic 'speech' + noise, raw int16-amplitude scale).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from percepnet_tpu.enhance import enhance_spectra
from percepnet_tpu.features import analyze_utterance, make_labels, make_records


@pytest.fixture(scope="module")
def pipeline(featgen_goldens):
    g = featgen_goldens
    clean = jnp.asarray(g["clean16"].astype(np.float32))
    noisy = jnp.asarray(g["noisy16"].astype(np.float32))
    clean_out, _ = analyze_utterance(clean)
    noisy_out, _ = analyze_utterance(noisy)
    return g, clean_out, noisy_out


def test_records_parity(pipeline):
    g, clean_out, noisy_out = pipeline
    ref = g["records"]
    rec = np.asarray(make_records(clean_out, noisy_out))
    assert rec.shape == ref.shape

    def relerr(a, b, floor=1e-3):
        return np.abs(a - b) / np.maximum(np.abs(b), floor)

    # band-energy features: f32 rounding level
    assert relerr(rec[:, :34], ref[:, :34]).max() < 1e-4
    # pitch coherence
    assert np.abs(rec[:, 34:68] - ref[:, 34:68]).max() < 1e-4
    # pitch period: exact discrete parity (T = period/588 may differ by
    # 1 ulp of f32 division, so compare the recovered integer periods)
    np.testing.assert_array_equal(
        np.round(rec[:, 68] * 588), np.round(ref[:, 68] * 588))
    # raw pitch correlation
    assert relerr(rec[:, 69], ref[:, 69]).max() < 1e-3
    # gains (post-filtered, as the reference dumps them)
    assert np.abs(rec[:, 70:104] - ref[:, 70:104]).max() < 1e-4
    # strengths: continuous values match to f32; the only allowed
    # discrepancy is the discrete r=0.99 override (denoise.cpp:581,
    # `Ephatp < Exp`) flipping at entries where the two sides are within
    # the coherence chain's cross-implementation f32 tolerance (~2e-4 —
    # DFT matmul vs KISS FFT, amplified through the band-corr division).
    # Root-caused on this golden set: exactly one flip, frame 123 band 22,
    # margin Ephatp-Exp = +1.6e-4 (we skip the override, the C binary
    # takes it).  Any flip at a NON-borderline entry is a real bug.
    from percepnet_tpu.features.labels import estimate_phat_corr
    margin = np.asarray(estimate_phat_corr(noisy_out["exp"])) - np.asarray(
        clean_out["exp"])
    r_diff = np.abs(rec[:, 104:138] - ref[:, 104:138])
    flips = np.argwhere(r_diff > 0.02)
    # pinned COUNT: exactly one tolerated flip (root-caused: the r=0.99
    # override at a borderline margin — frame 123 band 22 on the original
    # host).  The location is NOT pinned: this VM live-migrates between
    # hosts whose XLA:CPU instruction selection shifts borderline values,
    # which may move the single flip; the margin assert below proves
    # whichever frame flips is borderline, not a numerics change.
    assert len(flips) == 1, flips
    for t, b in flips:
        assert abs(margin[t, b]) < 5e-4, (
            f"r flip at frame {t} band {b} with non-borderline "
            f"override margin {margin[t, b]:+.2e}")
    assert np.median(r_diff) < 1e-5


def test_oracle_enhance_parity(pipeline):
    """Full DSP loop (pitch filter + gains + postfilter + OLA) must match
    the reference's oracle-enhanced PCM within the 1e-4 normalized gate."""
    g, clean_out, noisy_out = pipeline
    lab = make_labels(clean_out, noisy_out)
    pcm, _ = enhance_spectra(noisy_out, lab["g"], lab["r"])
    ours = np.asarray(pcm)
    oracle = g["oracle_pcm"].astype(np.float32)
    n = min(len(ours), len(oracle))
    err = np.abs(ours[:n] - oracle[:n]) / 32768.0
    assert err.max() < 1e-4


def test_streaming_matches_batch(pipeline):
    g, _, noisy_out = pipeline
    noisy = jnp.asarray(g["noisy16"].astype(np.float32))
    state = None
    feats = []
    for i in range(4):
        out, state = analyze_utterance(noisy[i * 24000 : (i + 1) * 24000], state)
        feats.append(np.asarray(out["features"]))
    stream = np.concatenate(feats)
    batch = np.asarray(noisy_out["features"])[: stream.shape[0]]
    # discrete pitch features must be exact across chunk boundaries
    np.testing.assert_array_equal(stream[:, 68], batch[:, 68])
    rel = np.abs(stream - batch) / np.maximum(np.abs(batch), 1e-3)
    assert rel.max() < 1e-3


def test_zero_input_is_silent():
    out, _ = analyze_utterance(jnp.zeros(4800, jnp.float32))
    assert bool(np.all(np.asarray(out["silence"])))
    assert bool(np.all(np.isfinite(np.asarray(out["features"]))))


def test_augmented_records_in_distribution(featgen_goldens):
    """The reference's dormant augmentation (denoise.cpp:670-718), ported
    as features.augment: augmented pairs must still produce valid training
    records — finite everywhere, g/r in [0, 1]."""
    from percepnet_tpu.cli.featgen import generate_pair
    from percepnet_tpu.features import augment

    g = featgen_goldens
    clean = g["clean16"].astype(np.float32)
    noisy = g["noisy16"].astype(np.float32)
    rng = np.random.default_rng(3)
    for trial in range(3):
        ca, na = augment.augment_pair(clean, noisy, rng,
                                      highpass=(trial == 2))
        assert ca.shape == clean.shape and na.shape == noisy.shape
        # raw labels must stay in [0, 1]; the post-filtered variant (the
        # reference's dump, whose compensation can exceed 1) just finite
        rec, _ = generate_pair(ca, na, 50, apply_postfilter=False)
        rec_pf, _ = generate_pair(ca, na, 50)
        assert np.isfinite(rec).all() and np.isfinite(rec_pf).all()
        gg, rr = rec[:, 70:104], rec[:, 104:138]
        assert gg.min() >= 0.0 and gg.max() <= 1.0
        assert rr.min() >= 0.0 and rr.max() <= 1.0
    # determinism: the same seed redraws the same augmentation
    a1 = augment.augment_pair(clean, noisy, np.random.default_rng(7))
    a2 = augment.augment_pair(clean, noisy, np.random.default_rng(7))
    np.testing.assert_array_equal(a1[0], a2[0])


def test_biquad_matches_reference_recurrence():
    """augment.biquad (scipy path) == the C recurrence (denoise.cpp:361-370)."""
    from percepnet_tpu.features import augment
    rng = np.random.default_rng(0)
    x = rng.standard_normal(256).astype(np.float32) * 1000
    a, b = augment.rand_resp(rng)
    y = augment.biquad(x, b, a)
    m0 = m1 = 0.0
    ref = np.empty_like(x)
    for i in range(len(x)):
        yi = float(x[i]) + m0
        m0 = m1 + (b[0] * float(x[i]) - a[0] * yi)
        m1 = b[1] * float(x[i]) - a[1] * yi
        ref[i] = yi
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-4)
    # the scipy-free prefix-doubling fallback must match the recurrence
    # exactly too (it is what a featgen sweep gets without scipy)
    ys = augment._biquad_scan(np.asarray(x, np.float64), b, a)
    np.testing.assert_allclose(ys, ref, rtol=1e-5, atol=1e-4)
    for n in (0, 1, 2, 3):   # degenerate lengths
        xs = np.asarray(x[:n], np.float64)
        np.testing.assert_allclose(
            augment._biquad_scan(xs, b, a), ref[:n], rtol=1e-5, atol=1e-4)
