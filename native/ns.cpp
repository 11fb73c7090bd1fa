// Native noise-suppression library for openwakeword_tpu.
//
// Stateful single-channel spectral-subtraction noise suppressor operating on
// fixed-size int16 frames (default 160 samples = 10 ms @ 16 kHz), the same
// frame contract as the SpeexDSP preprocessor the reference binds
// (reference openwakeword/model.py:200-205, 481-504).
//
// Algorithm: 50%-overlap sqrt-Hann analysis/synthesis, per-bin smoothed
// power estimate, minimum-statistics-style noise floor tracking (fast decay
// toward minima, slow rise), Wiener-style gain with a spectral floor, and
// overlap-add resynthesis. One frame of algorithmic latency.
//
// Build: make -C native   ->  libowwns.so (loaded via ctypes in
// openwakeword_tpu/ns.py).

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr float kPi = 3.14159265358979323846f;

struct NsState {
  int frame_size;     // F samples per process() call
  int win_size;       // 2F analysis window (50% overlap)
  int n_bins;         // F + 1 real-DFT bins
  float noise_rise;   // slow multiplicative rise of the noise floor
  float gain_floor;   // minimum spectral gain
  float over_sub;     // over-subtraction factor
  float psd_alpha;    // power smoothing

  std::vector<float> window;       // sqrt-Hann, win_size
  std::vector<float> cos_tab;      // win_size * n_bins
  std::vector<float> sin_tab;
  std::vector<float> prev_in;      // previous frame (analysis look-back)
  std::vector<float> overlap;      // synthesis overlap tail
  std::vector<float> psd;          // smoothed power per bin
  std::vector<float> noise;        // noise floor per bin
  std::vector<float> re, im, gain; // scratch
  long frames_seen;
};

}  // namespace

extern "C" {

void* owwns_create(int frame_size, int sample_rate) {
  if (frame_size <= 0 || frame_size > 4096) return nullptr;
  (void)sample_rate;
  NsState* st = new NsState();
  st->frame_size = frame_size;
  st->win_size = 2 * frame_size;
  st->n_bins = frame_size + 1;
  st->noise_rise = 1.0020f;   // ~ +0.9 dB/s at 10 ms frames
  st->gain_floor = 0.18f;     // ~ -15 dB max attenuation
  st->over_sub = 1.4f;
  st->psd_alpha = 0.82f;

  st->window.resize(st->win_size);
  for (int n = 0; n < st->win_size; ++n) {
    float hann = 0.5f - 0.5f * std::cos(2.0f * kPi * n / st->win_size);
    st->window[n] = std::sqrt(hann);
  }
  st->cos_tab.resize((size_t)st->win_size * st->n_bins);
  st->sin_tab.resize((size_t)st->win_size * st->n_bins);
  for (int k = 0; k < st->n_bins; ++k) {
    for (int n = 0; n < st->win_size; ++n) {
      float ang = 2.0f * kPi * k * n / st->win_size;
      st->cos_tab[(size_t)k * st->win_size + n] = std::cos(ang);
      st->sin_tab[(size_t)k * st->win_size + n] = std::sin(ang);
    }
  }
  st->prev_in.assign(frame_size, 0.0f);
  st->overlap.assign(frame_size, 0.0f);
  st->psd.assign(st->n_bins, 0.0f);
  st->noise.assign(st->n_bins, 1e6f);  // start high; first frames adapt down
  st->re.resize(st->n_bins);
  st->im.resize(st->n_bins);
  st->gain.resize(st->n_bins);
  st->frames_seen = 0;
  return st;
}

void owwns_process(void* handle, const short* in, short* out) {
  NsState* st = static_cast<NsState*>(handle);
  const int F = st->frame_size;
  const int W = st->win_size;
  const int K = st->n_bins;

  // Assemble the 2F analysis window: [prev frame | current frame] * sqrt-Hann
  std::vector<float> buf(W);
  for (int n = 0; n < F; ++n) buf[n] = st->prev_in[n] * st->window[n];
  for (int n = 0; n < F; ++n) buf[F + n] = (float)in[n] * st->window[F + n];
  for (int n = 0; n < F; ++n) st->prev_in[n] = (float)in[n];

  // Forward real DFT (table-driven; W=320 keeps this cheap)
  for (int k = 0; k < K; ++k) {
    const float* ct = &st->cos_tab[(size_t)k * W];
    const float* stab = &st->sin_tab[(size_t)k * W];
    float re = 0.0f, im = 0.0f;
    for (int n = 0; n < W; ++n) {
      re += buf[n] * ct[n];
      im -= buf[n] * stab[n];
    }
    st->re[k] = re;
    st->im[k] = im;
  }

  // Noise tracking + Wiener-style gain
  st->frames_seen++;
  const bool warmup = st->frames_seen <= 20;
  for (int k = 0; k < K; ++k) {
    float p = st->re[k] * st->re[k] + st->im[k] * st->im[k];
    st->psd[k] = st->psd_alpha * st->psd[k] + (1.0f - st->psd_alpha) * p;
    if (warmup) {
      // fast initial adaptation
      st->noise[k] = 0.7f * st->noise[k] + 0.3f * st->psd[k];
      if (st->noise[k] > st->psd[k]) st->noise[k] = st->psd[k];
    } else if (st->psd[k] < st->noise[k]) {
      st->noise[k] = st->psd[k];
    } else {
      st->noise[k] *= st->noise_rise;
    }
    float snr_num = st->psd[k] - st->over_sub * st->noise[k];
    float g = (st->psd[k] > 1e-12f) ? snr_num / st->psd[k] : 0.0f;
    if (g < st->gain_floor) g = st->gain_floor;
    if (g > 1.0f) g = 1.0f;
    st->gain[k] = g;
    st->re[k] *= g;
    st->im[k] *= g;
  }

  // Inverse real DFT + sqrt-Hann synthesis window + overlap-add
  const float scale = 1.0f / W;
  for (int n = 0; n < W; ++n) buf[n] = 0.0f;
  for (int k = 0; k < K; ++k) {
    const float w = (k == 0 || k == K - 1) ? 1.0f : 2.0f;  // conjugate symmetry
    const float* ct = &st->cos_tab[(size_t)k * W];
    const float* stab = &st->sin_tab[(size_t)k * W];
    const float re = st->re[k] * w, im = st->im[k] * w;
    for (int n = 0; n < W; ++n) {
      buf[n] += re * ct[n] - im * stab[n];
    }
  }
  for (int n = 0; n < W; ++n) buf[n] *= scale * st->window[n];

  for (int n = 0; n < F; ++n) {
    float v = buf[n] + st->overlap[n];
    if (v > 32767.0f) v = 32767.0f;
    if (v < -32768.0f) v = -32768.0f;
    out[n] = (short)std::lrintf(v);
    st->overlap[n] = buf[F + n];
  }
}

void owwns_destroy(void* handle) {
  delete static_cast<NsState*>(handle);
}

}  // extern "C"
