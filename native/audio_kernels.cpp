// Native audio-preprocessing kernels (C++17, no external deps).
//
// The reference outsources its preprocessing inner loop to native code
// inside librosa/scipy/sox (SURVEY.md §2.9); this library is the
// framework's own equivalent, driven from Python via ctypes
// (cookietts_tpu/data/native.py). Covers the per-file hot path of
// _1_preprocess: polyphase resampling, biquad filtering (zero-phase),
// silence-trim bound search, and ITU-R BS.1770-4 gated loudness.
//
// Build: `make -C native` -> native/libcookieaudio.so
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Windowed-sinc polyphase resampler (Kaiser-windowed, zero-phase).
// Matches scipy.signal.resample_poly semantics closely enough for audio
// (both are linear-phase FIR low-pass interpolators).
// ---------------------------------------------------------------------------
static double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 64; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-21 * sum) break;
  }
  return sum;
}

long resample_poly(const float* in, long n_in, int up, int down,
                   float* out, long out_cap) {
  if (up == down) {
    long n = std::min(n_in, out_cap);
    std::memcpy(out, in, sizeof(float) * n);
    return n;
  }
  const int max_rate = std::max(up, down);
  const double f_c = 1.0 / (2.0 * max_rate);   // normalized cutoff
  const int half_len = 10 * max_rate;          // scipy default: 10 periods
  const int n_taps = 2 * half_len + 1;
  const double beta = 5.0;                     // Kaiser beta (scipy default)

  std::vector<double> h(n_taps);
  const double i0b = bessel_i0(beta);
  for (int i = 0; i < n_taps; ++i) {
    const double m = i - half_len;
    // windowed sinc
    double sinc = (m == 0.0) ? 2.0 * f_c
                             : std::sin(2.0 * M_PI * f_c * m) / (M_PI * m);
    const double r = m / half_len;
    const double w = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r)))
                     / i0b;
    h[i] = up * sinc * w;
  }

  const long n_out = (n_in * (long)up + down - 1) / down;
  const long n = std::min(n_out, out_cap);
  // polyphase evaluation: y[j] = sum_k h[j*down - k*up + half_len] * x[k]
  for (long j = 0; j < n; ++j) {
    const long t = (long)j * down;             // position in upsampled grid
    double acc = 0.0;
    // k range where (t - k*up + half_len) in [0, n_taps)
    long k_min = (t + half_len - (n_taps - 1) + up - 1) / up;
    long k_max = (t + half_len) / up;
    k_min = std::max(k_min, 0L);
    k_max = std::min(k_max, n_in - 1);
    for (long k = k_min; k <= k_max; ++k) {
      acc += h[t - k * up + half_len] * in[k];
    }
    out[j] = (float)acc;
  }
  return n;
}

// ---------------------------------------------------------------------------
// Biquad second-order-section filtering; forward-backward for zero phase
// (the reference's sosfiltfilt high-pass chain).
// coefficients: per section [b0, b1, b2, a1, a2] (a0 normalized to 1)
// ---------------------------------------------------------------------------
static void biquad_forward(float* x, long n, const double* c) {
  double w1 = 0.0, w2 = 0.0;
  const double b0 = c[0], b1 = c[1], b2 = c[2], a1 = c[3], a2 = c[4];
  for (long i = 0; i < n; ++i) {
    const double w0 = (double)x[i] - a1 * w1 - a2 * w2;
    x[i] = (float)(b0 * w0 + b1 * w1 + b2 * w2);
    w2 = w1;
    w1 = w0;
  }
}

void sos_filtfilt(float* x, long n, const double* sos, int n_sections) {
  for (int s = 0; s < n_sections; ++s) {
    const double* c = sos + 5 * s;
    biquad_forward(x, n, c);
    std::reverse(x, x + n);
    biquad_forward(x, n, c);
    std::reverse(x, x + n);
  }
}

// ---------------------------------------------------------------------------
// Energy-trim bound search (librosa.effects.trim semantics: frames whose
// RMS dB is within top_db of the peak frame are kept).
// ---------------------------------------------------------------------------
void trim_bounds(const float* x, long n, long frame, long hop,
                 double top_db, long* start, long* end) {
  *start = 0;
  *end = n;
  if (n < frame) return;
  const long n_frames = 1 + (n - frame) / hop;
  std::vector<double> db(n_frames);
  double max_db = -1e30;
  for (long f = 0; f < n_frames; ++f) {
    double acc = 0.0;
    const float* p = x + f * hop;
    for (long i = 0; i < frame; ++i) acc += (double)p[i] * p[i];
    db[f] = 10.0 * std::log10(acc / frame + 1e-12);
    max_db = std::max(max_db, db[f]);
  }
  long first = -1, last = -1;
  for (long f = 0; f < n_frames; ++f) {
    if (db[f] > max_db - top_db) {
      if (first < 0) first = f;
      last = f;
    }
  }
  if (first < 0) return;
  *start = first * hop;
  *end = std::min(n, (last + 1) * hop + frame);
}

// ---------------------------------------------------------------------------
// ITU-R BS.1770-4 integrated loudness (K-weighting + absolute/relative
// gating). Mirrors cookietts_tpu/data/audio_io.py:bs1770_loudness.
// ---------------------------------------------------------------------------
double bs1770_loudness(const float* in, long n, int sr) {
  std::vector<float> x(in, in + n);

  // stage 1: high shelf
  {
    const double db = 3.999843853973347, f0 = 1681.974450955533,
                 Q = 0.7071752369554196;
    const double K = std::tan(M_PI * f0 / sr);
    const double Vh = std::pow(10.0, db / 20.0);
    const double Vb = std::pow(Vh, 0.4996667741545416);
    const double a0 = 1.0 + K / Q + K * K;
    const double c[5] = {
        (Vh + Vb * K / Q + K * K) / a0, 2.0 * (K * K - Vh) / a0,
        (Vh - Vb * K / Q + K * K) / a0, 2.0 * (K * K - 1.0) / a0,
        (1.0 - K / Q + K * K) / a0};
    biquad_forward(x.data(), n, c);
  }
  // stage 2: RLB high-pass
  {
    const double f0 = 38.13547087602444, Q = 0.5003270373238773;
    const double K = std::tan(M_PI * f0 / sr);
    const double a0 = 1.0 + K / Q + K * K;
    const double c[5] = {1.0 / a0, -2.0 / a0, 1.0 / a0,
                         2.0 * (K * K - 1.0) / a0,
                         (1.0 - K / Q + K * K) / a0};
    biquad_forward(x.data(), n, c);
  }

  const long block = (long)(0.400 * sr);
  const long hop = (long)(0.100 * sr);
  if (n < block) {
    double ms = 0.0;
    for (long i = 0; i < n; ++i) ms += (double)x[i] * x[i];
    ms = ms / std::max(n, 1L) + 1e-12;
    return -0.691 + 10.0 * std::log10(ms);
  }
  const long n_blocks = 1 + (n - block) / hop;
  std::vector<double> ms(n_blocks);
  for (long b = 0; b < n_blocks; ++b) {
    double acc = 0.0;
    const float* p = x.data() + b * hop;
    for (long i = 0; i < block; ++i) acc += (double)p[i] * p[i];
    ms[b] = acc / block + 1e-12;
  }
  double sum = 0.0;
  long cnt = 0;
  for (long b = 0; b < n_blocks; ++b) {
    const double lk = -0.691 + 10.0 * std::log10(ms[b]);
    if (lk > -70.0) {
      sum += ms[b];
      ++cnt;
    }
  }
  if (cnt == 0) return -70.0;
  const double rel = -0.691 + 10.0 * std::log10(sum / cnt) - 10.0;
  double sum2 = 0.0;
  long cnt2 = 0;
  for (long b = 0; b < n_blocks; ++b) {
    const double lk = -0.691 + 10.0 * std::log10(ms[b]);
    if (lk > -70.0 && lk > rel) {
      sum2 += ms[b];
      ++cnt2;
    }
  }
  if (cnt2 == 0) {
    sum2 = sum;
    cnt2 = cnt;
  }
  return -0.691 + 10.0 * std::log10(sum2 / cnt2);
}

}  // extern "C"
