// RIFF/WAVE decoding shared by the native loader (wavio.cpp) and the native
// host-side DSP (logmel.cpp). PCM 8/16/24/32-bit + IEEE float32/64,
// multichannel averaged to mono. Header-only so both translation units can
// link into one libdmha_native.so without an extra object file.
//
// The reference reads audio through libsndfile (C, via the soundfile python
// package); this is the framework's own decoder (no third-party C deps).
#pragma once

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace dmha {

struct WavData {
  std::vector<float> samples;  // mono
  int sample_rate = 0;
  bool ok = false;
};

inline uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
inline uint16_t rd_u16(const uint8_t* p) {
  return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

inline WavData decode_wav(const uint8_t* data, size_t len) {
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

inline WavData read_wav_file(const char* path) {
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

}  // namespace dmha
