// Native data-loading core.
//
// The reference reads audio through libsndfile (C, via the soundfile python
// package) and parallelizes loading with torch DataLoader worker processes
// (scripts/train.py:78-79). This library is the TPU-framework equivalent:
// a RIFF/WAVE decoder (PCM 8/16/24/32-bit + IEEE float32/64, multichannel
// averaged to mono) plus a std::thread batch loader that decodes and
// window-samples a whole training batch in parallel into one contiguous
// float32 buffer — no worker processes, no pickle IPC.
//
// Exposed as a C ABI for ctypes (no pybind11 dependency).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

#include "wav_decode.h"

using dmha::WavData;
using dmha::read_wav_file;

extern "C" {

// Read one wav to mono float32. Returns #samples written (clipped at
// max_samples), or -1 on failure. *sample_rate receives the rate.
long wav_read(const char* path, float* out, long max_samples, int* sample_rate) {
  WavData w = read_wav_file(path);
  if (!w.ok) return -1;
  if (sample_rate) *sample_rate = w.sample_rate;
  long n = (long)std::min<size_t>(w.samples.size(), (size_t)max_samples);
  memcpy(out, w.samples.data(), (size_t)n * sizeof(float));
  return n;
}

// Return total samples of a wav (for length queries), -1 on failure.
long wav_length(const char* path, int* sample_rate) {
  WavData w = read_wav_file(path);
  if (!w.ok) return -1;
  if (sample_rate) *sample_rate = w.sample_rate;
  return (long)w.samples.size();
}

// Decode n files in parallel and write fixed-size sample windows.
//
// paths:    n concatenated NUL-terminated strings
// window:   window length in samples
// seeds:    per-file RNG seeds; the start is uniform over
//           [0, max(0, len - window - 1)] (reference data.py:50-55 in the
//           sample domain); files shorter than the window are zero-padded
// out:      n * window float32 (pre-allocated)
// lengths:  per-file valid sample counts (<= window), -1 on read failure
// n_threads: worker threads (0 -> hardware_concurrency)
void wav_read_windows(const char* paths, int n, long window, const uint64_t* seeds,
                      float* out, long* lengths, int n_threads) {
  std::vector<const char*> ptrs(n);
  const char* p = paths;
  for (int i = 0; i < n; i++) {
    ptrs[i] = p;
    p += strlen(p) + 1;
  }
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  n_threads = std::max(1, std::min(n_threads, n));

  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      float* dst = out + (size_t)i * (size_t)window;
      WavData w = read_wav_file(ptrs[i]);
      if (!w.ok) {
        memset(dst, 0, (size_t)window * sizeof(float));
        lengths[i] = -1;
        continue;
      }
      long len = (long)w.samples.size();
      long start = 0;
      long take = std::min(len, window);
      if (len > window) {
        std::mt19937_64 rng(seeds[i]);
        long hi = std::max<long>(0, len - window - 1);
        std::uniform_int_distribution<long> dist(0, hi);
        start = dist(rng);
      }
      memcpy(dst, w.samples.data() + start, (size_t)take * sizeof(float));
      if (take < window)
        memset(dst + take, 0, (size_t)(window - take) * sizeof(float));
      lengths[i] = take;
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; t++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

}  // extern "C"
