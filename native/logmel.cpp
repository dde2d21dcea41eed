// Native host-side log-mel front-end.
//
// Same math as the on-device DSP (doubleattentionspeakerverification_tpu/
// dsp/features.py), which itself reproduces the reference
// scripts/featureExtractor.py:8-23: rescale x32768 -> pre-emphasis 0.97 ->
// framed Hamming STFT (n_fft 512, hop 160, center=False) -> 80-mel
// (Slaney triangles, norm=None) -> log(max(1, .)); plus the CMN/CMVN of
// scripts/data.py:21-30.
//
// Purpose: when the host->device link (not the chip) bounds wav-mode
// training, computing features on the host and shipping them as bfloat16
// halves the transfer bytes vs int16 PCM (80 mels x T/352 frames vs raw
// samples). The FFT is a radix-2 real FFT (N/2 complex packing) and the mel
// projection uses the filterbank's sparsity (each triangle spans a few
// bins), so a full training batch costs ~10 ms/core — far below the step
// time it overlaps with.
//
// The mel filterbank and analysis window are PASSED IN from python
// (dsp/mel.py) so the filterbank math exists in exactly one place.
//
// C ABI for ctypes (no pybind11 dependency).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

#include "wav_decode.h"

namespace {

struct Sparse {
  int start = 0;                // first nonzero FFT bin
  std::vector<float> w;         // contiguous weights
};

struct LogmelPlan {
  int n_fft = 0;
  int n_bins = 0;               // 1 + n_fft/2
  int half = 0;                 // n_fft/2 = complex FFT size
  int hop = 0;
  int n_mels = 0;
  float preemph = 0.f;
  float rescale = 1.f;
  float log_floor = 1.f;
  bool fast_log = true;   // polynomial log; false (log_floor <= 0) -> libm
  std::vector<float> window;    // n_fft (win_length Hamming, zero-padded)
  std::vector<Sparse> mel;      // per mel bin
  // FFT tables for the size-`half` complex FFT
  std::vector<int> bitrev;      // size half
  std::vector<float> tw_re, tw_im;  // per-stage twiddles, concatenated
  std::vector<float> un_re, un_im;  // e^{-2pi i k / n_fft}, k = 0..half
};

LogmelPlan* plan_cast(void* p) { return reinterpret_cast<LogmelPlan*>(p); }

void build_fft_tables(LogmelPlan& p) {
  const int m = p.half;
  p.bitrev.resize(m);
  int log2m = 0;
  while ((1 << log2m) < m) log2m++;
  for (int i = 0; i < m; i++) {
    int r = 0;
    for (int b = 0; b < log2m; b++) r |= ((i >> b) & 1) << (log2m - 1 - b);
    p.bitrev[i] = r;
  }
  // stage s (len = 2^(s+1)): len/2 twiddles e^{-2pi i j / len}
  for (int len = 2; len <= m; len <<= 1) {
    for (int j = 0; j < len / 2; j++) {
      double a = -2.0 * M_PI * j / len;
      p.tw_re.push_back((float)std::cos(a));
      p.tw_im.push_back((float)std::sin(a));
    }
  }
  p.un_re.resize(m + 1);
  p.un_im.resize(m + 1);
  for (int k = 0; k <= m; k++) {
    double a = -2.0 * M_PI * k / p.n_fft;
    p.un_re[k] = (float)std::cos(a);
    p.un_im[k] = (float)std::sin(a);
  }
}

// Frames are processed in blocks of VL, with the frame index as the
// innermost (contiguous, unit-stride) dimension — every FFT butterfly,
// untangle step and mel accumulation below is a straight-line loop over VL
// adjacent floats, which the compiler turns into SIMD across frames. The
// working set of one block (2 x half x VL complex + bins x VL magnitudes
// ~ 24 KB at n_fft=512) stays in L1.
constexpr int VL = 8;

// Branchless float log (frexp-style exponent split + minimax polynomial for
// log(m) on [sqrt(1/2), sqrt(2))), ~1 ulp — the libm call is the one thing
// in the mel loop the compiler cannot vectorize, and it costs ~20% of the
// kernel. Valid for normal positive x, which log(max(log_floor>0, mel))
// guarantees; logmel_create falls back to libm when log_floor <= 0.
inline float fast_logf(float x) {
  union {
    float f;
    uint32_t i;
  } u = {x};
  int e = (int)((u.i >> 23) & 0xFF) - 126;          // x = m * 2^e, m in [0.5,1)
  u.i = (u.i & 0x007FFFFFu) | 0x3F000000u;
  float m = u.f;
  const int low = m < 0.70710678f;                  // fold into [sqrt(.5),sqrt(2))
  e -= low;
  m += low ? m : 0.0f;
  m -= 1.0f;
  const float z = m * m;
  float p = 7.0376836292e-2f;
  p = p * m + -1.1514610310e-1f;
  p = p * m + 1.1676998740e-1f;
  p = p * m + -1.2420140846e-1f;
  p = p * m + 1.4249322787e-1f;
  p = p * m + -1.6668057665e-1f;
  p = p * m + 2.0000714765e-1f;
  p = p * m + -2.4999993993e-1f;
  p = p * m + 3.3333331174e-1f;
  p = p * m * z;
  const float fe = (float)e;
  p += fe * -2.12194440e-4f;
  p -= 0.5f * z;
  return m + p + fe * 0.693359375f;
}

// In-place radix-2 DIT complex FFT over VL interleaved sequences:
// element k of sequence `lane` lives at (re|im)[k*VL + lane].
void cfft_block(const LogmelPlan& p, float* re, float* im) {
  const int m = p.half;
  for (int i = 0; i < m; i++) {
    int j = p.bitrev[i];
    if (j > i) {
      for (int l = 0; l < VL; l++) {
        std::swap(re[i * VL + l], re[j * VL + l]);
        std::swap(im[i * VL + l], im[j * VL + l]);
      }
    }
  }
  size_t tw_off = 0;
  for (int len = 2; len <= m; len <<= 1) {
    const int h = len / 2;
    const float* twr = p.tw_re.data() + tw_off;
    const float* twi = p.tw_im.data() + tw_off;
    for (int base = 0; base < m; base += len) {
      for (int j = 0; j < h; j++) {
        float* ra = re + (size_t)(base + j) * VL;
        float* ia = im + (size_t)(base + j) * VL;
        float* rb = ra + (size_t)h * VL;
        float* ib = ia + (size_t)h * VL;
        const float wr = twr[j], wi = twi[j];
#pragma GCC ivdep
        for (int l = 0; l < VL; l++) {
          const float xr = rb[l] * wr - ib[l] * wi;
          const float xi = rb[l] * wi + ib[l] * wr;
          rb[l] = ra[l] - xr;
          ib[l] = ia[l] - xi;
          ra[l] += xr;
          ia[l] += xi;
        }
      }
    }
    tw_off += h;
  }
}

// VL windowed frames starting at frame t0 -> magnitudes (n_bins x VL).
// Real FFT via N/2 complex packing: z[k] = x[2k] + i x[2k+1]. Lanes beyond
// n_lanes compute garbage from the last valid frame and are never stored.
void block_magnitudes(const LogmelPlan& p, const float* y, long t0,
                      int n_lanes, float* zre, float* zim, float* mag) {
  const int m = p.half;
  const float* starts[VL];
  for (int l = 0; l < VL; l++)
    starts[l] = y + (t0 + std::min(l, n_lanes - 1)) * p.hop;
  for (int k = 0; k < m; k++) {
    const float we = p.window[2 * k], wo = p.window[2 * k + 1];
    float* zr = zre + (size_t)k * VL;
    float* zi = zim + (size_t)k * VL;
#pragma GCC ivdep
    for (int l = 0; l < VL; l++) {
      zr[l] = starts[l][2 * k] * we;
      zi[l] = starts[l][2 * k + 1] * wo;
    }
  }
  cfft_block(p, zre, zim);
  // untangle: X[k] = E[k] + e^{-2pi i k/N} O[k]
  //   E[k] = (Z[k] + conj(Z[m-k]))/2, O[k] = -i (Z[k] - conj(Z[m-k]))/2
  for (int l = 0; l < VL; l++) {
    mag[0 * VL + l] = std::fabs(zre[l] + zim[l]);          // DC
    mag[(size_t)m * VL + l] = std::fabs(zre[l] - zim[l]);  // Nyquist
  }
  for (int k = 1; k < m / 2; k++) {
    const int kk = m - k;
    const float* zrk = zre + (size_t)k * VL;
    const float* zik = zim + (size_t)k * VL;
    const float* zrkk = zre + (size_t)kk * VL;
    const float* zikk = zim + (size_t)kk * VL;
    float* mk = mag + (size_t)k * VL;
    float* mkk = mag + (size_t)kk * VL;
    const float cr = p.un_re[k], ci = p.un_im[k];
    const float dr = p.un_re[kk], di = p.un_im[kk];
#pragma GCC ivdep
    for (int l = 0; l < VL; l++) {
      const float er = 0.5f * (zrk[l] + zrkk[l]);
      const float ei = 0.5f * (zik[l] - zikk[l]);
      const float or_ = 0.5f * (zik[l] + zikk[l]);
      const float oi = 0.5f * (zrkk[l] - zrk[l]);
      const float xr = er + or_ * cr - oi * ci;
      const float xi = ei + or_ * ci + oi * cr;
      mk[l] = std::sqrt(xr * xr + xi * xi);
      // X[m-k]: E and O conjugated, twiddle at m-k
      const float yr = er + or_ * dr + oi * di;
      const float yi = -ei + or_ * di - oi * dr;
      mkk[l] = std::sqrt(yr * yr + yi * yi);
    }
  }
  {  // k == m/2 (self-paired: Z[k] pairs with itself)
    const int k = m / 2;
    const float* zrk = zre + (size_t)k * VL;
    const float* zik = zim + (size_t)k * VL;
    float* mk = mag + (size_t)k * VL;
    const float cr = p.un_re[k], ci = p.un_im[k];
#pragma GCC ivdep
    for (int l = 0; l < VL; l++) {
      const float er = zrk[l];            // E[k] = Re(Z[k])
      const float or_ = zik[l];           // O[k] = Im(Z[k])
      const float xr = er + or_ * cr;
      const float xi = or_ * ci;
      mk[l] = std::sqrt(xr * xr + xi * xi);
    }
  }
}

struct Scratch {
  std::vector<float> y;          // pre-emphasized samples
  std::vector<float> zre, zim;   // half x VL
  std::vector<float> mag;        // n_bins x VL
};

// samples (n) -> out (frames x n_mels) raw log-mel; returns frame count.
long compute_logmel(const LogmelPlan& p, const float* samples, long n,
                    float* out, Scratch& s) {
  if (n < p.n_fft) return 0;
  const long frames = 1 + (n - p.n_fft) / p.hop;
  s.y.resize((size_t)n);
  // rescale + pre-emphasis (featureExtractor.py:16-18 order)
  s.y[0] = samples[0] * p.rescale * (1.0f - p.preemph);
  for (long i = 1; i < n; i++)
    s.y[i] = samples[i] * p.rescale - p.preemph * samples[i - 1] * p.rescale;
  s.zre.resize((size_t)p.half * VL);
  s.zim.resize((size_t)p.half * VL);
  s.mag.resize((size_t)p.n_bins * VL);
  for (long t0 = 0; t0 < frames; t0 += VL) {
    const int n_lanes = (int)std::min<long>(VL, frames - t0);
    block_magnitudes(p, s.y.data(), t0, n_lanes, s.zre.data(), s.zim.data(),
                     s.mag.data());
    for (int mbin = 0; mbin < p.n_mels; mbin++) {
      const Sparse& sp = p.mel[mbin];
      float acc[VL] = {0.f};
      const float* w = sp.w.data();
      const float* mg = s.mag.data() + (size_t)sp.start * VL;
      const int cnt = (int)sp.w.size();
      for (int j = 0; j < cnt; j++) {
        const float wj = w[j];
        const float* mrow = mg + (size_t)j * VL;
#pragma GCC ivdep
        for (int l = 0; l < VL; l++) acc[l] += wj * mrow[l];
      }
      float* const orow = out + (size_t)t0 * p.n_mels + mbin;
      if (p.fast_log) {
        for (int l = 0; l < n_lanes; l++)
          orow[(size_t)l * p.n_mels] = fast_logf(std::max(p.log_floor, acc[l]));
      } else {
        for (int l = 0; l < n_lanes; l++)
          orow[(size_t)l * p.n_mels] = std::log(std::max(p.log_floor, acc[l]));
      }
    }
  }
  return frames;
}

// CMN / CMVN over the first `frames` rows (scripts/data.py:21-30; biased
// std, floor std<=std_floor -> 1.0).
void normalize_rows(float* feats, long frames, int n_mels, int mode,
                    float std_floor) {
  if (mode == 0 || frames <= 0) return;
  std::vector<double> mean(n_mels, 0.0);
  for (long t = 0; t < frames; t++) {
    const float* row = feats + (size_t)t * n_mels;
    for (int m = 0; m < n_mels; m++) mean[m] += row[m];
  }
  std::vector<float> mu(n_mels), inv(n_mels, 1.0f);
  for (int m = 0; m < n_mels; m++) mu[m] = (float)(mean[m] / frames);
  if (mode == 2) {
    // two-pass variance (numpy.std semantics; the one-pass E[x^2]-mu^2 form
    // loses ~4 digits to cancellation on near-constant mel bins)
    std::vector<double> sq(n_mels, 0.0);
    for (long t = 0; t < frames; t++) {
      const float* row = feats + (size_t)t * n_mels;
      for (int m = 0; m < n_mels; m++) {
        const double d = (double)row[m] - mu[m];
        sq[m] += d * d;
      }
    }
    for (int m = 0; m < n_mels; m++) {
      float sd = (float)std::sqrt(sq[m] / frames);
      inv[m] = (sd > std_floor) ? 1.0f / sd : 1.0f;
    }
  }
  for (long t = 0; t < frames; t++) {
    float* row = feats + (size_t)t * n_mels;
    for (int m = 0; m < n_mels; m++) row[m] = (row[m] - mu[m]) * inv[m];
  }
}

}  // namespace

extern "C" {

// window: n_fft floats (analysis window, zero-padded to n_fft).
// mel_fb: n_mels * n_bins row-major (dsp/mel.py:mel_filterbank).
void* logmel_create(int n_fft, int hop, int n_mels, const float* window,
                    const float* mel_fb, float preemph, float rescale,
                    float log_floor) {
  if (n_fft <= 0 || (n_fft & (n_fft - 1)) != 0 || hop <= 0 || n_mels <= 0)
    return nullptr;
  auto* p = new LogmelPlan();
  p->n_fft = n_fft;
  p->half = n_fft / 2;
  p->n_bins = 1 + n_fft / 2;
  p->hop = hop;
  p->n_mels = n_mels;
  p->preemph = preemph;
  p->rescale = rescale;
  p->log_floor = log_floor;
  p->fast_log = log_floor > 0.f;
  p->window.assign(window, window + n_fft);
  p->mel.resize(n_mels);
  for (int m = 0; m < n_mels; m++) {
    const float* row = mel_fb + (size_t)m * p->n_bins;
    int first = 0, last = -1;
    for (int k = 0; k < p->n_bins; k++) {
      if (row[k] != 0.f) {
        if (last < 0) first = k;
        last = k;
      }
    }
    Sparse& sp = p->mel[m];
    if (last >= 0) {
      sp.start = first;
      sp.w.assign(row + first, row + last + 1);
    }
  }
  build_fft_tables(*p);
  return p;
}

void logmel_destroy(void* plan) { delete plan_cast(plan); }

long logmel_num_frames(void* plan, long n_samples) {
  LogmelPlan* p = plan_cast(plan);
  if (n_samples < p->n_fft) return 0;
  return 1 + (n_samples - p->n_fft) / p->hop;
}

// Single utterance: wave (n float32 in [-1,1]) -> out (frames * n_mels raw
// log-mel, caller-sized via logmel_num_frames). norm_mode: 0 none, 1 cmn,
// 2 cmvn. Returns the frame count.
long logmel_compute(void* plan, const float* wave, long n, int norm_mode,
                    float std_floor, float* out) {
  LogmelPlan* p = plan_cast(plan);
  Scratch s;
  long frames = compute_logmel(*p, wave, n, out, s);
  normalize_rows(out, frames, p->n_mels, norm_mode, std_floor);
  return frames;
}

// Fused batch: decode n wavs in parallel, sample a random window of
// `window_samples` per file (same distribution/seeding as wav_read_windows:
// start ~ U[0, max(0, len - window - 1)], mt19937_64(seed)), compute
// log-mel + CMN/CMVN over the window's valid frames, zero-pad to
// max_frames = logmel_num_frames(window_samples).
//
// out:            n * max_frames * n_mels float32 (fully written)
// frame_lengths:  valid frames per file; -1 marks a failed read
void wav_logmel_windows(void* plan, const char* paths, int n,
                        long window_samples, const uint64_t* seeds,
                        int norm_mode, float std_floor, float* out,
                        long* frame_lengths, int n_threads) {
  LogmelPlan* p = plan_cast(plan);
  const long max_frames = logmel_num_frames(plan, window_samples);
  const size_t stride = (size_t)max_frames * p->n_mels;

  std::vector<const char*> ptrs(n);
  const char* cp = paths;
  for (int i = 0; i < n; i++) {
    ptrs[i] = cp;
    cp += strlen(cp) + 1;
  }
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  n_threads = std::max(1, std::min(n_threads, n));

  std::atomic<int> next(0);
  auto worker = [&]() {
    Scratch s;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      float* dst = out + (size_t)i * stride;
      memset(dst, 0, stride * sizeof(float));
      dmha::WavData w = dmha::read_wav_file(ptrs[i]);
      if (!w.ok) {
        frame_lengths[i] = -1;
        continue;
      }
      const long len = (long)w.samples.size();
      long start = 0;
      const long take = std::min(len, window_samples);
      if (len > window_samples) {
        std::mt19937_64 rng(seeds[i]);
        long hi = std::max<long>(0, len - window_samples - 1);
        std::uniform_int_distribution<long> dist(0, hi);
        start = dist(rng);
      }
      long frames = compute_logmel(*p, w.samples.data() + start, take, dst, s);
      normalize_rows(dst, frames, p->n_mels, norm_mode, std_floor);
      frame_lengths[i] = frames;
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; t++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

}  // extern "C"
