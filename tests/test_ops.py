"""Per-op golden tests vs the compiled reference (tests/goldens/unit.npz)."""
import jax.numpy as jnp
import numpy as np

from percepnet_tpu import constants as C
from percepnet_tpu.ops import activations, bands, dft, pitch


def test_forward_dft_vs_kissfft(unit_goldens):
    x = unit_goldens["fft_in"]
    ref = unit_goldens["fft_out"].reshape(-1, 2)
    xr, xi = dft.forward_dft(jnp.asarray(x)[None])
    np.testing.assert_allclose(np.asarray(xr[0]), ref[:, 0], atol=2e-7)
    np.testing.assert_allclose(np.asarray(xi[0]), ref[:, 1], atol=2e-7)


def test_inverse_dft_roundtrip(unit_goldens):
    x = unit_goldens["fft_in"]
    xr, xi = dft.forward_dft(jnp.asarray(x)[None])
    back = dft.inverse_dft(xr, xi)
    np.testing.assert_allclose(np.asarray(back[0]), x, atol=1e-5)


def test_band_energy(unit_goldens):
    X = unit_goldens["band_X"].reshape(-1, 2)
    got = bands.band_energy(jnp.asarray(X[:, 0])[None], jnp.asarray(X[:, 1])[None])
    np.testing.assert_allclose(
        np.asarray(got[0]), unit_goldens["band_energy"], rtol=2e-6)


def test_band_corr(unit_goldens):
    X = unit_goldens["band_X"].reshape(-1, 2)
    P = unit_goldens["band_P"].reshape(-1, 2)
    got = bands.band_corr(jnp.asarray(X[:, 0])[None], jnp.asarray(X[:, 1])[None],
                          jnp.asarray(P[:, 0])[None], jnp.asarray(P[:, 1])[None])
    np.testing.assert_allclose(
        np.asarray(got[0]), unit_goldens["band_corr"], rtol=2e-5, atol=1e-6)


def test_interp_band_gain(unit_goldens):
    g = unit_goldens["band_g_in"]
    got = bands.interp_band_gain(jnp.asarray(g)[None])
    np.testing.assert_allclose(
        np.asarray(got[0]), unit_goldens["band_g_interp"], atol=1e-6)


def test_pitch_downsample(unit_goldens):
    bufs = unit_goldens["pitch_buf"].reshape(3, C.PITCH_BUF_SIZE)
    ref = unit_goldens["pitch_ds"].reshape(3, C.PITCH_BUF_SIZE // 2)
    got = np.asarray(pitch.pitch_downsample(jnp.asarray(bufs)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-4)


def test_pitch_search_and_doubling(unit_goldens):
    """End-to-end pitch stack must reproduce the reference's discrete
    period decisions exactly, and gains closely."""
    bufs = unit_goldens["pitch_buf"].reshape(3, C.PITCH_BUF_SIZE)
    track = pitch.pitch_track(jnp.asarray(bufs))
    # pitch_search indices (before doubling removal)
    ds = pitch.pitch_downsample(jnp.asarray(bufs))
    xc = pitch.full_xcorr(ds)
    t0, corr = pitch.pitch_search(ds, xc)
    np.testing.assert_array_equal(
        np.asarray(t0), unit_goldens["pitch_index_search"])
    np.testing.assert_allclose(
        np.asarray(corr), unit_goldens["pitch_corr"], rtol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(track["period"]), unit_goldens["pitch_index_final"])
    np.testing.assert_allclose(
        np.asarray(track["gain"]), unit_goldens["pitch_gain"], rtol=1e-3, atol=1e-4)


def test_levinson_vs_reference(unit_goldens):
    ac = unit_goldens["lpc_ac"].astype(np.float32)
    ac2 = ac.copy()
    ac2[0] *= 1.0001
    for i in range(1, 5):
        ac2[i] -= ac2[i] * (0.008 * i) ** 2
    got = np.asarray(pitch._levinson4(jnp.asarray(ac2)[None]))[0]
    np.testing.assert_allclose(got, unit_goldens["lpc_coef"], rtol=1e-4, atol=1e-5)


def test_tansig_approx_matches_tanh():
    x = jnp.linspace(-8, 8, 1001)
    got = np.asarray(activations.tansig_approx(x))
    np.testing.assert_allclose(got, np.tanh(np.asarray(x)), atol=2e-6)
    s = np.asarray(activations.sigmoid_approx(x))
    np.testing.assert_allclose(s, 1 / (1 + np.exp(-np.asarray(x))), atol=2e-6)


def test_corr_dft_matches_grouped_conv():
    """The TPU frequency-domain correlation must match the CPU grouped
    conv at both pitch-search shapes (full-lag and coarse)."""
    import numpy as np
    from percepnet_tpu.ops import pitch as P
    rng = np.random.default_rng(20)
    for sig_len, ker_len, out_len in ((864, 480, 385), (387, 240, 147)):
        sig = jnp.asarray(rng.normal(size=(3, sig_len)).astype(np.float32))
        ker = jnp.asarray(rng.normal(size=(3, ker_len)).astype(np.float32))
        a = np.asarray(P._batched_corr(sig, ker, out_len))
        b = np.asarray(P._corr_dft(sig, ker, out_len))
        rel = np.abs(a - b).max() / np.abs(a).max()
        assert rel < 1e-5, (sig_len, rel)
