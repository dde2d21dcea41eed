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

namespace {

struct WavData {
  std::vector<float> samples;  // mono
  int sample_rate = 0;
  bool ok = false;
};

uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
uint16_t rd_u16(const uint8_t* p) { return (uint16_t)p[0] | ((uint16_t)p[1] << 8); }

WavData decode_wav(const uint8_t* data, size_t len) {
  WavData out;
  if (len < 12 || memcmp(data, "RIFF", 4) != 0 || memcmp(data + 8, "WAVE", 4) != 0)
    return out;
  size_t pos = 12;
  uint16_t fmt = 0, channels = 0, bits = 0;
  bool have_fmt = false;
  while (pos + 8 <= len) {
    const uint8_t* ck = data + pos;
    uint32_t ck_size = rd_u32(ck + 4);
    size_t body = pos + 8;
    if (body + ck_size > len) ck_size = (uint32_t)(len - body);
    if (memcmp(ck, "fmt ", 4) == 0 && ck_size >= 16) {
      fmt = rd_u16(data + body);
      channels = rd_u16(data + body + 2);
      out.sample_rate = (int)rd_u32(data + body + 4);
      bits = rd_u16(data + body + 14);
      if (fmt == 0xFFFE && ck_size >= 40) fmt = rd_u16(data + body + 24);
      have_fmt = true;
    } else if (memcmp(ck, "data", 4) == 0 && have_fmt) {
      const uint8_t* raw = data + body;
      size_t nbytes = ck_size;
      size_t bps = bits / 8;
      if (bps == 0 || channels == 0) return out;
      size_t n_frames = nbytes / (bps * channels);
      out.samples.resize(n_frames);
      const double ch_scale = 1.0 / channels;
      for (size_t i = 0; i < n_frames; i++) {
        double acc = 0.0;
        for (int c = 0; c < channels; c++) {
          const uint8_t* s = raw + (i * channels + c) * bps;
          double v = 0.0;
          if (fmt == 1) {  // PCM
            if (bits == 16) {
              v = (double)(int16_t)rd_u16(s) / 32768.0;
            } else if (bits == 24) {
              int32_t x = (int32_t)s[0] | ((int32_t)s[1] << 8) | ((int32_t)s[2] << 16);
              if (x >= (1 << 23)) x -= (1 << 24);
              v = (double)x / 8388608.0;
            } else if (bits == 32) {
              v = (double)(int32_t)rd_u32(s) / 2147483648.0;
            } else if (bits == 8) {
              v = ((double)s[0] - 128.0) / 128.0;
            }
          } else if (fmt == 3) {  // IEEE float
            if (bits == 32) {
              float f;
              memcpy(&f, s, 4);
              v = f;
            } else if (bits == 64) {
              double d;
              memcpy(&d, s, 8);
              v = d;
            }
          }
          acc += v;
        }
        out.samples[i] = (float)(acc * ch_scale);
      }
      out.ok = true;
      return out;
    }
    pos = body + ck_size + (ck_size & 1);
  }
  return out;
}

WavData read_wav_file(const char* path) {
  WavData bad;
  FILE* f = fopen(path, "rb");
  if (!f) return bad;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (sz <= 0) {
    fclose(f);
    return bad;
  }
  std::vector<uint8_t> buf((size_t)sz);
  size_t got = fread(buf.data(), 1, (size_t)sz, f);
  fclose(f);
  if (got != (size_t)sz) return bad;
  return decode_wav(buf.data(), buf.size());
}

}  // namespace

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
