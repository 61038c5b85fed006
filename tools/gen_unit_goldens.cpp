// Golden-vector dumper: links against the reference PercepNet objects
// (compiled out-of-tree from /root/reference/src) and records the outputs of
// its public DSP functions on deterministic pseudo-random inputs.  The
// resulting raw files are packed into tests/goldens/*.npz by
// tools/make_goldens.py and used by the JAX test suite for bit-level parity
// checks.  This tool contains no reference code — it only calls it.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <string>
#include <vector>

#include "kiss_fft.h"
#include "erbband.h"
#include "rnnoise.h"

#define NB_BANDS 34
#define FRAME_SIZE 480
#define WINDOW_SIZE 960
#define FREQ_SIZE 481
#define PITCH_BUF_SIZE 1728
#define PITCH_FRAME_SIZE 960
#define PITCH_MAX_PERIOD 768
#define PITCH_MIN_PERIOD 60

// Reference symbols (declared here; defined in the reference objects).
extern ERBBand *erb_band;
void compute_band_energy(float *bandE, const kiss_fft_cpx *X);
void compute_band_corr(float *bandE, const kiss_fft_cpx *X, const kiss_fft_cpx *P);
void interp_band_gain(float *g, const float *bandE);
void pitch_downsample(float *x[], float *x_lp, int len, int C);
void pitch_search(const float *x_lp, float *y, int len, int max_pitch,
                  int *pitch, float *pitch_corr);
float remove_doubling(float *x, int maxperiod, int minperiod, int N,
                      int *T0_, int prev_period, float prev_gain);
void _celt_lpc(float *_lpc, const float *ac, int p);
int _celt_autocorr(const float *x, float *ac, const float *window, int overlap,
                   int lag, int n);

static uint32_t rng_state = 0x12345678u;
static float frand() {  // deterministic LCG in [-1, 1)
  rng_state = rng_state * 1664525u + 1013904223u;
  return (float)((int32_t)rng_state) / 2147483648.0f;
}

static void dump(const std::string &dir, const char *name, const void *data,
                 size_t bytes) {
  std::string path = dir + "/" + name;
  FILE *f = fopen(path.c_str(), "wb");
  if (!f) { fprintf(stderr, "cannot open %s\n", path.c_str()); exit(1); }
  fwrite(data, 1, bytes, f);
  fclose(f);
}

int main(int argc, char **argv) {
  if (argc != 2) { fprintf(stderr, "usage: %s <outdir>\n", argv[0]); return 1; }
  std::string dir = argv[1];

  // --- ERB borders ---------------------------------------------------------
  {
    std::vector<int32_t> borders(erb_band->nfftborder.begin(),
                                 erb_band->nfftborder.end());
    dump(dir, "erb_borders.i32", borders.data(), borders.size() * 4);
  }

  // --- forward FFT golden: random window -> spectrum -----------------------
  kiss_fft_state *kfft = opus_fft_alloc_twiddles(WINDOW_SIZE, NULL, NULL, NULL, 0);
  {
    float in[WINDOW_SIZE];
    for (int i = 0; i < WINDOW_SIZE; i++) in[i] = frand();
    kiss_fft_cpx x[WINDOW_SIZE], y[WINDOW_SIZE];
    for (int i = 0; i < WINDOW_SIZE; i++) { x[i].r = in[i]; x[i].i = 0; }
    opus_fft(kfft, x, y, 0);
    dump(dir, "fft_in.f32", in, sizeof(in));
    dump(dir, "fft_out.f32", y, FREQ_SIZE * sizeof(kiss_fft_cpx));
  }

  // --- band energy / corr / interp on random spectra -----------------------
  {
    kiss_fft_cpx X[FREQ_SIZE], P[FREQ_SIZE];
    for (int i = 0; i < FREQ_SIZE; i++) {
      X[i].r = frand(); X[i].i = frand();
      P[i].r = frand(); P[i].i = frand();
    }
    float Ex[NB_BANDS], Exp[NB_BANDS];
    compute_band_energy(Ex, X);
    compute_band_corr(Exp, X, P);
    float bandg[NB_BANDS];
    for (int i = 0; i < NB_BANDS; i++) bandg[i] = 0.5f + 0.5f * frand();
    float gf[FREQ_SIZE] = {0};
    interp_band_gain(gf, bandg);
    dump(dir, "band_X.f32", X, sizeof(X));
    dump(dir, "band_P.f32", P, sizeof(P));
    dump(dir, "band_energy.f32", Ex, sizeof(Ex));
    dump(dir, "band_corr.f32", Exp, sizeof(Exp));
    dump(dir, "band_g_in.f32", bandg, sizeof(bandg));
    dump(dir, "band_g_interp.f32", gf, sizeof(gf));
  }

  // --- pitch stack on a harmonic-ish random signal --------------------------
  {
    const int NSIG = 3;
    float all_buf[NSIG][PITCH_BUF_SIZE];
    float all_ds[NSIG][PITCH_BUF_SIZE / 2];
    int32_t all_index[NSIG];
    float all_corr[NSIG];
    int32_t all_index2[NSIG];
    float all_gain[NSIG];
    int prev_period = 0;
    float prev_gain = 0.f;
    for (int s = 0; s < NSIG; s++) {
      float period = 110.0f + 97.0f * s;
      for (int i = 0; i < PITCH_BUF_SIZE; i++) {
        float t = (float)i;
        all_buf[s][i] = 0.8f * sinf(2.0f * (float)M_PI * t / period)
                      + 0.3f * sinf(4.0f * (float)M_PI * t / period + 0.7f)
                      + 0.15f * frand();
      }
      float *pre[1] = { all_buf[s] };
      pitch_downsample(pre, all_ds[s], PITCH_BUF_SIZE, 1);
      int pitch_index; float pitch_corr;
      pitch_search(all_ds[s] + (PITCH_MAX_PERIOD >> 1), all_ds[s],
                   PITCH_FRAME_SIZE, PITCH_MAX_PERIOD - 3 * PITCH_MIN_PERIOD,
                   &pitch_index, &pitch_corr);
      pitch_index = PITCH_MAX_PERIOD - pitch_index;
      all_index[s] = pitch_index;
      all_corr[s] = pitch_corr;
      float gain = remove_doubling(all_ds[s], PITCH_MAX_PERIOD, PITCH_MIN_PERIOD,
                                   PITCH_FRAME_SIZE, &pitch_index,
                                   prev_period, prev_gain);
      all_index2[s] = pitch_index;
      all_gain[s] = gain;
      prev_period = pitch_index;
      prev_gain = gain;
    }
    dump(dir, "pitch_buf.f32", all_buf, sizeof(all_buf));
    dump(dir, "pitch_ds.f32", all_ds, sizeof(all_ds));
    dump(dir, "pitch_index_search.i32", all_index, sizeof(all_index));
    dump(dir, "pitch_corr.f32", all_corr, sizeof(all_corr));
    dump(dir, "pitch_index_final.i32", all_index2, sizeof(all_index2));
    dump(dir, "pitch_gain.f32", all_gain, sizeof(all_gain));
  }

  // --- LPC / autocorrelation ------------------------------------------------
  {
    const int N = 864;  // PITCH_BUF_SIZE/2, as used by pitch_downsample
    float x[N];
    for (int i = 0; i < N; i++)
      x[i] = sinf(0.05f * i) + 0.3f * frand();
    float ac[5];
    _celt_autocorr(x, ac, NULL, 0, 4, N);
    float lpc[4];
    // apply the same conditioning as pitch_downsample before _celt_lpc
    float ac2[5];
    memcpy(ac2, ac, sizeof(ac));
    ac2[0] *= 1.0001f;
    for (int i = 1; i <= 4; i++) ac2[i] -= ac2[i] * (.008f * i) * (.008f * i);
    _celt_lpc(lpc, ac2, 4);
    dump(dir, "lpc_x.f32", x, sizeof(x));
    dump(dir, "lpc_ac.f32", ac, sizeof(ac));
    dump(dir, "lpc_coef.f32", lpc, sizeof(lpc));
  }

  printf("unit goldens written to %s\n", dir.c_str());
  return 0;
}
