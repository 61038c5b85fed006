"""Golden tests for precomputed tables vs the compiled reference."""
import numpy as np

from percepnet_tpu import constants as C


def test_erb_borders(unit_goldens):
    np.testing.assert_array_equal(
        C.erb_band_borders(), unit_goldens["erb_borders"])


def test_border_shape_and_range():
    b = C.erb_band_borders()
    assert b.shape == (C.NB_BANDS,)
    assert b[0] == 0 and b[-1] == 400
    assert np.all(np.diff(b) >= 2)


def test_band_matrices_consistency():
    e = C.band_energy_matrix()
    t = C.band_interp_matrix()
    # interp of all-ones bands = 1 on covered bins, 0 above 20 kHz
    ones = np.ones(C.NB_BANDS, np.float32)
    gf = t @ ones
    borders = C.erb_band_borders()
    np.testing.assert_allclose(gf[: borders[-1]], 1.0, atol=1e-6)
    np.testing.assert_array_equal(gf[borders[-1]:], 0.0)
    # energy matrix: interior bins sum to 1 across bands, edge bands doubled
    colsum = e.sum(axis=0)
    assert colsum.shape == (C.FREQ_SIZE,)


def test_windows():
    h = C.half_vorbis_window()
    assert h.shape == (C.FRAME_SIZE,)
    assert 0 < h[0] < 1e-4 and h[-1] > 0.999
    w = C.comb_hann_window()
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    # sum of squared normalized 7-tap Hann = 0.1875
    np.testing.assert_allclose(C.power_noise_attenuation(), 0.1875, rtol=1e-6)


def test_rdft_roundtrip():
    rng = np.random.RandomState(0)
    x = rng.randn(C.WINDOW_SIZE).astype(np.float32)
    c, s = C.rdft_matrices()
    xr = c @ x
    xi = -(s @ x)
    ref = np.fft.rfft(x.astype(np.float64)) / C.WINDOW_SIZE
    np.testing.assert_allclose(xr, ref.real, atol=1e-6)
    np.testing.assert_allclose(xi, ref.imag, atol=1e-6)
    ci, si = C.irdft_matrices()
    back = ci @ xr - si @ xi
    np.testing.assert_allclose(back, x, atol=2e-5)
