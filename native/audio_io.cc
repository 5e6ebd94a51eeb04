// Native audio IO + host-side framing for the TPU input pipeline.
//
// The reference is pure NumPy (SURVEY.md section 2b: no native
// components recalled), but this framework's corpus scan is a
// production input pipeline: decoding NIST SPHERE / RIFF WAV and
// cutting frames for 100h corpora (BASELINE.json:11) is host work
// that must not stall the chip.  This library provides:
//
//   tsr_probe_audio   - sniff container, return sample count + rate
//   tsr_read_audio    - decode to float32 mono in [-1, 1]
//   tsr_read_frames   - decode + preemphasis + strided framing into a
//                       caller-provided [T, frame_length] buffer (the
//                       layout the fused Pallas frontend kernel eats)
//   tsr_read_batch    - std::thread fan-out of tsr_read_audio over a
//                       list of files into one padded [N, max_len] arena
//
// Bit-compatibility contract with io/audio.py + ops/framing.py is
// covered by tests/test_native_io.py.
//
// C ABI (ctypes); all functions return 0 on success, negative codes on
// failure.  Thread-safe; no global state.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kErrOpen = -1;
constexpr int kErrFormat = -2;
constexpr int kErrUnsupported = -3;
constexpr int kErrSpace = -4;

struct Decoded {
  std::vector<float> samples;  // mono, [-1, 1]
  int sample_rate = 0;
};

struct FileBuf {
  std::vector<uint8_t> data;
};

int read_file(const char* path, FileBuf* out) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return kErrOpen;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->data.resize(static_cast<size_t>(n));
  size_t got = n ? std::fread(out->data.data(), 1, static_cast<size_t>(n), f) : 0;
  std::fclose(f);
  if (got != static_cast<size_t>(n)) return kErrOpen;
  return 0;
}

int16_t load_i16(const uint8_t* p, bool big_endian) {
  uint16_t v = big_endian ? (uint16_t)((p[0] << 8) | p[1])
                          : (uint16_t)((p[1] << 8) | p[0]);
  return static_cast<int16_t>(v);
}

uint32_t load_u32le(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}

void pcm_to_mono_float(const uint8_t* data, size_t count, int nbytes,
                       bool big_endian, int channels, Decoded* out) {
  size_t frames = channels > 0 ? count / channels : count;
  out->samples.resize(frames);
  for (size_t i = 0; i < frames; ++i) {
    float acc = 0.f;
    for (int c = 0; c < channels; ++c) {
      size_t s = i * channels + c;
      if (nbytes == 2) {
        acc += load_i16(data + 2 * s, big_endian) / 32768.0f;
      } else {
        acc += (data[s] - 128.0f) / 128.0f;
      }
    }
    out->samples[i] = acc / channels;
  }
}

// ---------------- NIST SPHERE ----------------

int decode_sphere(const FileBuf& buf, Decoded* out) {
  constexpr size_t kHeader = 1024;
  if (buf.data.size() < kHeader) return kErrFormat;
  std::string head(reinterpret_cast<const char*>(buf.data.data()), kHeader);
  long sample_rate = 16000, channels = 1, nbytes = 2, count = -1;
  bool big_endian = false;
  std::string coding = "pcm";
  size_t pos = 0;
  while (pos < head.size()) {
    size_t eol = head.find('\n', pos);
    if (eol == std::string::npos) break;
    std::string line = head.substr(pos, eol - pos);
    pos = eol + 1;
    if (line == "end_head") break;
    // "key -TYPE value"
    size_t sp1 = line.find(' ');
    if (sp1 == std::string::npos) continue;
    size_t sp2 = line.find(' ', sp1 + 1);
    if (sp2 == std::string::npos) continue;
    std::string key = line.substr(0, sp1);
    std::string val = line.substr(sp2 + 1);
    if (key == "sample_rate") sample_rate = std::atol(val.c_str());
    else if (key == "channel_count") channels = std::atol(val.c_str());
    else if (key == "sample_n_bytes") nbytes = std::atol(val.c_str());
    else if (key == "sample_count") count = std::atol(val.c_str());
    else if (key == "sample_byte_format") big_endian = (val == "10");
    else if (key == "sample_coding") coding = val;
  }
  if (coding.find("pcm") == std::string::npos) return kErrUnsupported;
  if (nbytes != 1 && nbytes != 2) return kErrUnsupported;
  const uint8_t* pcm = buf.data.data() + kHeader;
  size_t avail = (buf.data.size() - kHeader) / nbytes;
  size_t n = count >= 0 ? std::min<size_t>(count, avail) : avail;
  pcm_to_mono_float(pcm, n, (int)nbytes, big_endian, (int)channels, out);
  out->sample_rate = (int)sample_rate;
  return 0;
}

// ---------------- RIFF WAV ----------------

int decode_wav(const FileBuf& buf, Decoded* out) {
  const uint8_t* d = buf.data.data();
  size_t n = buf.data.size();
  if (n < 44 || std::memcmp(d, "RIFF", 4) || std::memcmp(d + 8, "WAVE", 4))
    return kErrFormat;
  int channels = 1, nbytes = 2, sample_rate = 16000, audio_fmt = 1;
  const uint8_t* pcm = nullptr;
  size_t pcm_len = 0;
  size_t pos = 12;
  while (pos + 8 <= n) {
    uint32_t sz = load_u32le(d + pos + 4);
    const uint8_t* body = d + pos + 8;
    if (!std::memcmp(d + pos, "fmt ", 4) && sz >= 16) {
      audio_fmt = body[0] | (body[1] << 8);
      channels = body[2] | (body[3] << 8);
      sample_rate = (int)load_u32le(body + 4);
      int bits = body[14] | (body[15] << 8);
      nbytes = bits / 8;
    } else if (!std::memcmp(d + pos, "data", 4)) {
      pcm = body;
      pcm_len = std::min<size_t>(sz, n - (pos + 8));
    }
    pos += 8 + sz + (sz & 1);  // chunks are word-aligned
  }
  if (!pcm) return kErrFormat;
  if (audio_fmt != 1 || (nbytes != 1 && nbytes != 2)) return kErrUnsupported;
  pcm_to_mono_float(pcm, pcm_len / nbytes, nbytes, /*big_endian=*/false,
                    channels, out);
  out->sample_rate = sample_rate;
  return 0;
}

int decode_any(const char* path, Decoded* out) {
  FileBuf buf;
  int rc = read_file(path, &buf);
  if (rc) return rc;
  if (buf.data.size() >= 7 && !std::memcmp(buf.data.data(), "NIST_1A", 7))
    return decode_sphere(buf, out);
  return decode_wav(buf, out);
}

}  // namespace

extern "C" {

int tsr_probe_audio(const char* path, int64_t* out_count, int* out_rate) {
  Decoded dec;
  int rc = decode_any(path, &dec);
  if (rc) return rc;
  *out_count = (int64_t)dec.samples.size();
  *out_rate = dec.sample_rate;
  return 0;
}

int tsr_read_audio(const char* path, float* out, int64_t max_samples,
                   int64_t* out_count, int* out_rate) {
  Decoded dec;
  int rc = decode_any(path, &dec);
  if (rc) return rc;
  if ((int64_t)dec.samples.size() > max_samples) return kErrSpace;
  std::memcpy(out, dec.samples.data(), dec.samples.size() * sizeof(float));
  *out_count = (int64_t)dec.samples.size();
  *out_rate = dec.sample_rate;
  return 0;
}

// Decode + preemphasis (y[t] = x[t] - alpha*x[t-1], y[0] = x[0]) +
// strided framing.  frames_out must hold max_frames * frame_length
// floats; writes the actual frame count (rows beyond it untouched).
int tsr_read_frames(const char* path, float preemph, int64_t frame_length,
                    int64_t hop_length, float* frames_out,
                    int64_t max_frames, int64_t* out_frames, int* out_rate) {
  Decoded dec;
  int rc = decode_any(path, &dec);
  if (rc) return rc;
  const std::vector<float>& x = dec.samples;
  int64_t s = (int64_t)x.size();
  int64_t t = s >= frame_length ? 1 + (s - frame_length) / hop_length : 0;
  if (t > max_frames) return kErrSpace;
  std::vector<float> y(x.size());
  if (!x.empty()) {
    y[0] = x[0];
    for (size_t i = 1; i < x.size(); ++i) y[i] = x[i] - preemph * x[i - 1];
  }
  for (int64_t r = 0; r < t; ++r)
    std::memcpy(frames_out + r * frame_length, y.data() + r * hop_length,
                frame_length * sizeof(float));
  *out_frames = t;
  *out_rate = dec.sample_rate;
  return 0;
}

// Threaded batch decode into one [n, max_samples] float32 arena
// (zero-padded).  counts[i] < 0 carries that file's error code.
int tsr_read_batch(const char** paths, int64_t n, float* arena,
                   int64_t max_samples, int64_t* counts, int* rates,
                   int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::vector<std::thread> pool;
  std::vector<int> rcs(static_cast<size_t>(n), 0);
  auto work = [&](int64_t tid) {
    for (int64_t i = tid; i < n; i += num_threads) {
      float* row = arena + i * max_samples;
      std::memset(row, 0, max_samples * sizeof(float));
      int64_t cnt = 0;
      int rate = 0;
      int rc = tsr_read_audio(paths[i], row, max_samples, &cnt, &rate);
      counts[i] = rc ? rc : cnt;
      rates[i] = rate;
      rcs[i] = rc;
    }
  };
  for (int t = 0; t < num_threads; ++t) pool.emplace_back(work, t);
  for (auto& th : pool) th.join();
  for (int64_t i = 0; i < n; ++i)
    if (rcs[i]) return rcs[i];
  return 0;
}

}  // extern "C"
