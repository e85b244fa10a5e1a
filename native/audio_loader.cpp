// Native audio loader: multithreaded WAV decode + linear resample.
//
// The reference delegates audio IO to torchaudio/ffmpeg inside torch
// DataLoader worker *processes* (reference: speech/cosyvoice/dataset/
// dataset.py + torchaudio.load in processor.py:275-301). Here the data
// pipeline is host-side generators in one process, so decode parallelism
// comes from this extension: a std::thread pool decodes a batch of wavs
// with the GIL released, returning float32 numpy arrays.
//
// Supports RIFF/WAVE PCM16, PCM24, PCM32, and IEEE float32, any channel
// count (averaged to mono). Built by native/build.py with g++; the
// python wrapper (minimax_speech_tpu/data/native_loader.py) falls back
// to the pure-python loader when the extension is unavailable.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <dlfcn.h>

#include <atomic>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Decoded {
  std::vector<float> samples;
  int sample_rate = 0;
  std::string error;
};

uint32_t rd_u32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}
uint16_t rd_u16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}

Decoded decode_wav(const std::string& path) {
  Decoded out;
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    out.error = "cannot open " + path;
    return out;
  }
  std::vector<uint8_t> buf((std::istreambuf_iterator<char>(f)),
                           std::istreambuf_iterator<char>());
  if (buf.size() < 44 || std::memcmp(buf.data(), "RIFF", 4) != 0 ||
      std::memcmp(buf.data() + 8, "WAVE", 4) != 0) {
    out.error = "not a RIFF/WAVE file: " + path;
    return out;
  }
  size_t pos = 12;
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  const uint8_t* data = nullptr;
  size_t data_len = 0;
  while (pos + 8 <= buf.size()) {
    const uint8_t* hdr = buf.data() + pos;
    uint32_t chunk_len = rd_u32(hdr + 4);
    const uint8_t* body = hdr + 8;
    // never read a chunk body past the end of the file (truncated or
    // lying chunk headers must not cause an over-read)
    size_t avail = buf.size() - pos - 8;
    size_t body_len = chunk_len < avail ? chunk_len : avail;
    if (std::memcmp(hdr, "fmt ", 4) == 0 && chunk_len >= 16 &&
        body_len >= 16) {
      fmt = rd_u16(body);
      channels = rd_u16(body + 2);
      rate = rd_u32(body + 4);
      bits = rd_u16(body + 14);
    } else if (std::memcmp(hdr, "data", 4) == 0) {
      data = body;
      data_len = body_len;
    }
    pos += 8 + chunk_len + (chunk_len & 1);
    if (chunk_len > buf.size()) break;  // overflow-proof: header is bogus
  }
  if (!data || channels == 0 || rate == 0) {
    out.error = "missing fmt/data chunk: " + path;
    return out;
  }
  if (bits != 16 && bits != 24 && bits != 32) {
    out.error = "unsupported bits-per-sample in " + path;
    return out;
  }
  size_t bytes_per = bits / 8;
  size_t n_frames = data_len / (bytes_per * channels);
  out.samples.resize(n_frames);
  out.sample_rate = static_cast<int>(rate);
  const float inv_ch = 1.0f / channels;
  for (size_t i = 0; i < n_frames; ++i) {
    float acc = 0.0f;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* p = data + (i * channels + c) * bytes_per;
      float v = 0.0f;
      if (fmt == 3 && bits == 32) {  // IEEE float
        float fv;
        std::memcpy(&fv, p, 4);
        v = fv;
      } else if (bits == 16) {
        int16_t s;
        std::memcpy(&s, p, 2);
        v = s / 32768.0f;
      } else if (bits == 24) {
        int32_t s = (p[0] << 8) | (p[1] << 16) | (p[2] << 24);
        v = (s >> 8) / 8388608.0f;
      } else if (bits == 32) {
        int32_t s;
        std::memcpy(&s, p, 4);
        v = s / 2147483648.0f;
      }
      acc += v;
    }
    out.samples[i] = acc * inv_ch;
  }
  return out;
}

// ---------------------------------------------------------------------------
// MP3 decode via the system's libmpg123, resolved with dlopen at first
// use (the reference likewise delegates non-wav decode to an external
// native runtime — ffmpeg, audiotools/core/ffmpeg.py). Emilia-style
// corpora ship mp3; writing a Layer III decoder from scratch is not
// verifiable here (no independent encoder to produce vectors), while
// libmpg123 is the independent, battle-tested decoder itself.
// ---------------------------------------------------------------------------

namespace mp3 {

typedef void handle_t;  // opaque mpg123_handle

int (*p_init)() = nullptr;
handle_t* (*p_new)(const char*, int*) = nullptr;
int (*p_open)(handle_t*, const char*) = nullptr;
int (*p_close)(handle_t*) = nullptr;
void (*p_delete)(handle_t*) = nullptr;
int (*p_getformat)(handle_t*, long*, int*, int*) = nullptr;
int (*p_format_none)(handle_t*) = nullptr;
int (*p_format)(handle_t*, long, int, int) = nullptr;
int (*p_read)(handle_t*, unsigned char*, size_t, size_t*) = nullptr;
const char* (*p_strerror)(handle_t*) = nullptr;

// mpg123.h constants (stable public ABI)
constexpr int kOk = 0;
constexpr int kDone = -12;
constexpr int kNewFormat = -11;
constexpr int kEncSigned16 = 0xD0;  // MPG123_ENC_SIGNED_16 (the default)
constexpr int kEncFloat32 = 0x200;  // MPG123_ENC_FLOAT_32

bool available = false;
std::once_flag once;

void init_lib() {
  void* h = dlopen("libmpg123.so.0", RTLD_NOW | RTLD_LOCAL);
  if (!h) h = dlopen("libmpg123.so", RTLD_NOW | RTLD_LOCAL);
  if (!h) return;
  auto sym = [&](const char* name) { return dlsym(h, name); };
  p_init = reinterpret_cast<decltype(p_init)>(sym("mpg123_init"));
  p_new = reinterpret_cast<decltype(p_new)>(sym("mpg123_new"));
  p_open = reinterpret_cast<decltype(p_open)>(sym("mpg123_open"));
  p_close = reinterpret_cast<decltype(p_close)>(sym("mpg123_close"));
  p_delete = reinterpret_cast<decltype(p_delete)>(sym("mpg123_delete"));
  p_getformat =
      reinterpret_cast<decltype(p_getformat)>(sym("mpg123_getformat"));
  p_format_none =
      reinterpret_cast<decltype(p_format_none)>(sym("mpg123_format_none"));
  p_format = reinterpret_cast<decltype(p_format)>(sym("mpg123_format"));
  p_read = reinterpret_cast<decltype(p_read)>(sym("mpg123_read"));
  p_strerror = reinterpret_cast<decltype(p_strerror)>(sym("mpg123_strerror"));
  if (!(p_new && p_open && p_close && p_delete && p_getformat &&
        p_format_none && p_format && p_read))
    return;
  if (p_init && p_init() != kOk) return;  // no-op in modern libmpg123
  available = true;
}

}  // namespace mp3

Decoded decode_mp3(const std::string& path) {
  Decoded out;
  std::call_once(mp3::once, mp3::init_lib);
  if (!mp3::available) {
    out.error = "libmpg123 unavailable, cannot decode mp3: " + path;
    return out;
  }
  int err = 0;
  mp3::handle_t* mh = mp3::p_new(nullptr, &err);
  if (!mh) {
    out.error = "mpg123_new failed for " + path;
    return out;
  }
  auto fail = [&](const std::string& what) {
    const char* detail = mp3::p_strerror ? mp3::p_strerror(mh) : "";
    out.error = what + " for " + path + ": " + (detail ? detail : "");
    out.samples.clear();
    mp3::p_close(mh);
    mp3::p_delete(mh);
    return out;
  };
  if (mp3::p_open(mh, path.c_str()) != mp3::kOk) return fail("mpg123_open");
  long rate = 0;
  int channels = 0, enc = 0;
  if (mp3::p_getformat(mh, &rate, &channels, &enc) != mp3::kOk)
    return fail("mpg123_getformat");
  // lock the negotiated format so it cannot change mid-stream (format
  // requests only apply to the NEXT track once decoding has started,
  // so we decode whatever encoding was negotiated — int16 everywhere
  // in practice — instead of forcing one)
  mp3::p_format_none(mh);
  mp3::p_format(mh, rate, channels, enc);
  if (enc != mp3::kEncSigned16 && enc != mp3::kEncFloat32)
    return fail("unsupported mpg123 output encoding");
  out.sample_rate = static_cast<int>(rate);
  std::vector<uint8_t> buf(1 << 16);
  while (true) {
    size_t done = 0;
    int r = mp3::p_read(mh, buf.data(), buf.size(), &done);
    size_t bytes_per = enc == mp3::kEncFloat32 ? 4 : 2;
    size_t n_frames = done / (bytes_per * channels);
    const float inv_ch = 1.0f / channels;
    for (size_t i = 0; i < n_frames; ++i) {
      float acc = 0.0f;
      for (int c = 0; c < channels; ++c) {
        if (enc == mp3::kEncFloat32) {
          float fv;
          std::memcpy(&fv, buf.data() + (i * channels + c) * 4, 4);
          acc += fv;
        } else {
          int16_t s;
          std::memcpy(&s, buf.data() + (i * channels + c) * 2, 2);
          acc += s / 32768.0f;
        }
      }
      out.samples.push_back(acc * inv_ch);
    }
    if (r == mp3::kDone) break;
    if (r == mp3::kNewFormat) {
      long r2 = rate;
      int e2 = enc;
      mp3::p_getformat(mh, &r2, &channels, &e2);
      if (r2 != rate || e2 != enc)
        return fail("unexpected mid-stream format change");
      continue;
    }
    if (r != mp3::kOk) {
      // measured: mpg123 returns DONE even for files truncated
      // mid-frame, so any other code is a real decode error — fail
      // loudly rather than return silently truncated audio
      return fail("mpg123_read");
    }
  }
  mp3::p_close(mh);
  mp3::p_delete(mh);
  if (out.samples.empty()) out.error = "no audio frames decoded in " + path;
  return out;
}

// total ID3v2 tag bytes at the start of the buffer, 0 if none
size_t id3v2_size(const std::vector<uint8_t>& buf) {
  if (buf.size() < 10 || std::memcmp(buf.data(), "ID3", 3) != 0) return 0;
  size_t size = (static_cast<size_t>(buf[6] & 0x7F) << 21) |
                (static_cast<size_t>(buf[7] & 0x7F) << 14) |
                (static_cast<size_t>(buf[8] & 0x7F) << 7) |
                (buf[9] & 0x7F);
  return 10 + size + ((buf[5] & 0x10) ? 10 : 0);  // + footer if flagged
}

bool looks_like_mp3(const std::vector<uint8_t>& buf, const std::string& path) {
  if (buf.size() >= 3 && std::memcmp(buf.data(), "ID3", 3) == 0) return true;
  if (buf.size() >= 2 && buf[0] == 0xFF && (buf[1] & 0xE0) == 0xE0)
    return true;
  // extension fallback for streams with leading junk
  return path.size() >= 4 &&
         path.compare(path.size() - 4, 4, ".mp3") == 0;
}

// ---------------------------------------------------------------------------
// FLAC decode (native-format path; the reference loads non-wav corpora
// through ffmpeg — audiotools/core/ffmpeg.py. Emilia-style corpora ship
// flac/mp3; FLAC is decoded natively here, wav below, mp3 above.)
// Implements the full mandatory subset: CONSTANT / VERBATIM / FIXED /
// LPC subframes, rice + rice2 + escape residual partitions, wasted
// bits, left-side / right-side / mid-side stereo decorrelation.
// ---------------------------------------------------------------------------

class BitReader {
 public:
  BitReader(const uint8_t* data, size_t len) : data_(data), len_(len) {}

  bool ok() const { return !fail_; }
  size_t byte_pos() const { return pos_; }

  uint64_t bits(int n) {
    uint64_t v = 0;
    for (int i = 0; i < n; ++i) {
      if (pos_ >= len_) {
        fail_ = true;
        return 0;
      }
      v = (v << 1) | ((data_[pos_] >> (7 - bit_)) & 1);
      if (++bit_ == 8) {
        bit_ = 0;
        ++pos_;
      }
    }
    return v;
  }

  int64_t sbits(int n) {
    uint64_t v = bits(n);
    if (n > 0 && (v >> (n - 1)) & 1) return static_cast<int64_t>(v) - (1LL << n);
    return static_cast<int64_t>(v);
  }

  uint32_t unary() {
    uint32_t q = 0;
    while (ok() && bits(1) == 0) {
      if (++q > 1u << 24) {  // corrupt stream guard
        fail_ = true;
        return 0;
      }
    }
    return q;
  }

  void align() {
    if (bit_) {
      bit_ = 0;
      ++pos_;
    }
  }

 private:
  const uint8_t* data_;
  size_t len_;
  size_t pos_ = 0;
  int bit_ = 0;
  bool fail_ = false;
};

bool read_utf8_coded(BitReader& br, uint64_t* out) {
  uint64_t b0 = br.bits(8);
  int extra = 0;
  uint64_t v = 0;
  if ((b0 & 0x80) == 0) {
    v = b0;
  } else {
    uint8_t mask = 0x40;
    while (b0 & mask) {
      ++extra;
      mask >>= 1;
    }
    if (extra < 1 || extra > 6) return false;
    v = b0 & (mask - 1);
    for (int i = 0; i < extra; ++i) {
      uint64_t b = br.bits(8);
      if ((b & 0xC0) != 0x80) return false;
      v = (v << 6) | (b & 0x3F);
    }
  }
  *out = v;
  return br.ok();
}

bool decode_residual(BitReader& br, int blocksize, int pred_order,
                     std::vector<int64_t>& res) {
  uint32_t method = static_cast<uint32_t>(br.bits(2));
  if (method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  uint32_t porder = static_cast<uint32_t>(br.bits(4));
  uint32_t nparts = 1u << porder;
  if (blocksize % nparts != 0) return false;
  int idx = pred_order;  // residuals align to SAMPLE indices: res[i] is
                         // the residual of sample i (warmup has none)
  for (uint32_t p = 0; p < nparts; ++p) {
    int count = blocksize >> porder;
    if (p == 0) count -= pred_order;
    if (count < 0) return false;
    uint32_t param = static_cast<uint32_t>(br.bits(plen));
    if (param == escape) {
      int nbits = static_cast<int>(br.bits(5));
      for (int i = 0; i < count; ++i)
        res[idx++] = nbits ? br.sbits(nbits) : 0;
    } else {
      for (int i = 0; i < count; ++i) {
        uint32_t q = br.unary();
        uint64_t r = br.bits(param);
        uint64_t zz = (static_cast<uint64_t>(q) << param) | r;
        res[idx++] = (zz >> 1) ^ -static_cast<int64_t>(zz & 1);
      }
    }
    if (!br.ok()) return false;
  }
  return true;
}

bool decode_subframe(BitReader& br, int blocksize, int bps,
                     std::vector<int64_t>& out) {
  if (br.bits(1) != 0) return false;  // mandatory zero pad bit
  uint32_t type = static_cast<uint32_t>(br.bits(6));
  int wasted = 0;
  if (br.bits(1)) wasted = 1 + static_cast<int>(br.unary());
  bps -= wasted;
  out.assign(blocksize, 0);

  if (type == 0) {  // CONSTANT
    int64_t v = br.sbits(bps);
    for (int i = 0; i < blocksize; ++i) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < blocksize; ++i) out[i] = br.sbits(bps);
  } else if (type >= 8 && type <= 12) {  // FIXED, order 0-4
    int order = static_cast<int>(type - 8);
    for (int i = 0; i < order; ++i) out[i] = br.sbits(bps);
    std::vector<int64_t> res(blocksize);
    if (!decode_residual(br, blocksize, order, res)) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t p = 0;
      switch (order) {
        case 0: p = 0; break;
        case 1: p = out[i - 1]; break;
        case 2: p = 2 * out[i - 1] - out[i - 2]; break;
        case 3: p = 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3]; break;
        case 4:
          p = 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] - out[i - 4];
          break;
      }
      out[i] = p + res[i];
    }
  } else if (type >= 32) {  // LPC, order 1-32
    int order = static_cast<int>(type - 31);
    for (int i = 0; i < order; ++i) out[i] = br.sbits(bps);
    uint32_t prec_code = static_cast<uint32_t>(br.bits(4));
    if (prec_code == 0xF) return false;
    int precision = static_cast<int>(prec_code) + 1;
    int shift = static_cast<int>(br.sbits(5));
    if (shift < 0) return false;
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; ++i) coef[i] = br.sbits(precision);
    std::vector<int64_t> res(blocksize);
    if (!decode_residual(br, blocksize, order, res)) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j) acc += coef[j] * out[i - 1 - j];
      out[i] = (acc >> shift) + res[i];
    }
  } else {
    return false;  // reserved type
  }
  if (wasted)
    for (auto& v : out) v = static_cast<int64_t>(
        static_cast<uint64_t>(v) << wasted);
  return br.ok();
}

Decoded decode_flac(const std::vector<uint8_t>& buf,
                    const std::string& path) {
  Decoded out;
  if (buf.size() < 42 || std::memcmp(buf.data(), "fLaC", 4) != 0) {
    out.error = "not a FLAC file: " + path;
    return out;
  }
  size_t pos = 4;
  uint32_t sample_rate = 0;
  int channels = 0, bps = 0;
  uint64_t total_samples = 0;
  bool last = false;
  while (!last && pos + 4 <= buf.size()) {
    uint8_t hdr = buf[pos];
    last = hdr & 0x80;
    uint8_t type = hdr & 0x7F;
    uint32_t len = (buf[pos + 1] << 16) | (buf[pos + 2] << 8) | buf[pos + 3];
    pos += 4;
    if (pos + len > buf.size()) {
      out.error = "truncated metadata: " + path;
      return out;
    }
    if (type == 0 && len >= 34) {  // STREAMINFO
      const uint8_t* p = buf.data() + pos;
      sample_rate = (p[10] << 12) | (p[11] << 4) | (p[12] >> 4);
      channels = ((p[12] >> 1) & 0x7) + 1;
      bps = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
      total_samples = (static_cast<uint64_t>(p[13] & 0xF) << 32) |
                      (static_cast<uint64_t>(p[14]) << 24) |
                      (p[15] << 16) | (p[16] << 8) | p[17];
    }
    pos += len;
  }
  if (sample_rate == 0 || channels == 0 || channels > 8) {
    out.error = "bad STREAMINFO: " + path;
    return out;
  }
  out.sample_rate = static_cast<int>(sample_rate);
  if (total_samples) out.samples.reserve(total_samples);

  static const int kBlk[16] = {0,    192,  576,  1152, 2304, 4608, -1, -2,
                               256,  512,  1024, 2048, 4096, 8192, 16384,
                               32768};
  BitReader br(buf.data() + pos, buf.size() - pos);
  std::vector<std::vector<int64_t>> ch(channels);
  const float scale = 1.0f / static_cast<float>(1LL << (bps - 1));
  while (true) {
    // locate the next frame sync (14 bits 0b11111111111110)
    uint64_t sync = br.bits(14);
    if (!br.ok()) break;  // clean EOF
    if (sync != 0x3FFE) {
      out.error = "lost frame sync in " + path;
      return out;
    }
    br.bits(1);                       // reserved
    br.bits(1);                       // blocking strategy
    uint32_t bs_code = static_cast<uint32_t>(br.bits(4));
    uint32_t sr_code = static_cast<uint32_t>(br.bits(4));
    uint32_t ch_code = static_cast<uint32_t>(br.bits(4));
    uint32_t ss_code = static_cast<uint32_t>(br.bits(3));
    br.bits(1);                       // reserved
    uint64_t frame_no;
    if (!read_utf8_coded(br, &frame_no)) {
      out.error = "bad frame number in " + path;
      return out;
    }
    int blocksize;
    if (bs_code == 6)
      blocksize = static_cast<int>(br.bits(8)) + 1;
    else if (bs_code == 7)
      blocksize = static_cast<int>(br.bits(16)) + 1;
    else if (kBlk[bs_code] > 0)
      blocksize = kBlk[bs_code];
    else {
      out.error = "reserved blocksize code in " + path;
      return out;
    }
    if (sr_code == 12) br.bits(8);
    else if (sr_code == 13 || sr_code == 14) br.bits(16);
    br.bits(8);  // CRC-8 (not verified)

    int frame_bps = bps;
    static const int kBps[8] = {0, 8, 12, -1, 16, 20, 24, 32};
    if (ss_code != 0 && kBps[ss_code] > 0) frame_bps = kBps[ss_code];

    int nch = channels;
    int assign = -1;  // 0 = left/side, 1 = right/side, 2 = mid/side
    if (ch_code <= 7) {
      nch = static_cast<int>(ch_code) + 1;
    } else if (ch_code <= 10) {
      nch = 2;
      assign = static_cast<int>(ch_code) - 8;
    } else {
      out.error = "reserved channel assignment in " + path;
      return out;
    }
    for (int c = 0; c < nch; ++c) {
      int sub_bps = frame_bps;
      // the side channel carries one extra bit
      if ((assign == 0 && c == 1) || (assign == 1 && c == 0) ||
          (assign == 2 && c == 1))
        sub_bps += 1;
      if (!decode_subframe(br, blocksize, sub_bps, ch[c])) {
        out.error = "subframe decode failed in " + path;
        return out;
      }
    }
    br.align();
    br.bits(16);  // frame CRC-16 (not verified)
    if (!br.ok()) {
      out.error = "truncated frame in " + path;
      return out;
    }

    if (assign == 0) {  // left/side: right = left - side
      for (int i = 0; i < blocksize; ++i) ch[1][i] = ch[0][i] - ch[1][i];
    } else if (assign == 1) {  // right/side: left = right + side
      for (int i = 0; i < blocksize; ++i) ch[0][i] = ch[1][i] + ch[0][i];
    } else if (assign == 2) {  // mid/side
      for (int i = 0; i < blocksize; ++i) {
        int64_t m = ch[0][i], s = ch[1][i];
        m = (m << 1) | (s & 1);
        ch[0][i] = (m + s) >> 1;
        ch[1][i] = (m - s) >> 1;
      }
    }
    const float inv_ch = 1.0f / nch;
    for (int i = 0; i < blocksize; ++i) {
      float acc = 0.0f;
      for (int c = 0; c < nch; ++c) acc += ch[c][i] * scale;
      out.samples.push_back(acc * inv_ch);
    }
    if (total_samples && out.samples.size() >= total_samples) {
      out.samples.resize(total_samples);
      break;
    }
  }
  return out;
}

Decoded decode_file(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    Decoded out;
    out.error = "cannot open " + path;
    return out;
  }
  std::vector<uint8_t> buf((std::istreambuf_iterator<char>(f)),
                           std::istreambuf_iterator<char>());
  if (buf.size() >= 4 && std::memcmp(buf.data(), "fLaC", 4) == 0)
    return decode_flac(buf, path);
  if (buf.size() >= 4 && std::memcmp(buf.data(), "RIFF", 4) == 0)
    return decode_wav(path);
  // container magic may hide behind an ID3v2 tag (real-world flac
  // taggers prepend one); mp3 must NOT capture those — mpg123's
  // resync could misread FLAC frames as MPEG sync and emit garbage
  size_t skip = id3v2_size(buf);
  if (skip && skip + 4 <= buf.size()) {
    if (std::memcmp(buf.data() + skip, "fLaC", 4) == 0) {
      std::vector<uint8_t> inner(buf.begin() + skip, buf.end());
      return decode_flac(inner, path);
    }
    if (std::memcmp(buf.data() + skip, "RIFF", 4) == 0) {
      Decoded out;
      out.error = "ID3-tagged RIFF not supported: " + path;
      return out;
    }
  }
  if (looks_like_mp3(buf, path)) return decode_mp3(path);
  return decode_wav(path);  // keeps the precise wav error messages
}

void resample_linear(std::vector<float>& x, int sr_in, int sr_out) {
  if (sr_in == sr_out || x.empty()) return;
  size_t n_out =
      static_cast<size_t>(static_cast<double>(x.size()) * sr_out / sr_in + 0.5);
  std::vector<float> y(n_out);
  double step = static_cast<double>(x.size()) / n_out;
  for (size_t i = 0; i < n_out; ++i) {
    double src = i * step;
    size_t lo = static_cast<size_t>(src);
    size_t hi = lo + 1 < x.size() ? lo + 1 : x.size() - 1;
    double w = src - lo;
    y[i] = static_cast<float>(x[lo] * (1.0 - w) + x[hi] * w);
  }
  x.swap(y);
}

// batch decode with a thread pool (GIL released)
std::vector<Decoded> decode_batch(const std::vector<std::string>& paths,
                                  int target_sr, int num_threads) {
  std::vector<Decoded> results(paths.size());
  std::atomic<size_t> next{0};
  auto worker = [&]() {
    while (true) {
      size_t i = next.fetch_add(1);
      if (i >= paths.size()) break;
      results[i] = decode_file(paths[i]);
      if (results[i].error.empty() && target_sr > 0)
        resample_linear(results[i].samples, results[i].sample_rate, target_sr);
    }
  };
  int n = num_threads > 0 ? num_threads : 4;
  std::vector<std::thread> threads;
  for (int i = 0; i < n; ++i) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return results;
}

PyObject* make_float_array(const std::vector<float>& v) {
  // build a bytes object and let numpy wrap it on the python side;
  // to avoid a numpy C-API dependency we return (bytes, length)
  return PyBytes_FromStringAndSize(reinterpret_cast<const char*>(v.data()),
                                   static_cast<Py_ssize_t>(v.size() * 4));
}

PyObject* py_load_batch(PyObject*, PyObject* args) {
  PyObject* list;
  int target_sr = 0, num_threads = 4;
  if (!PyArg_ParseTuple(args, "O|ii", &list, &target_sr, &num_threads))
    return nullptr;
  if (!PyList_Check(list)) {
    PyErr_SetString(PyExc_TypeError, "expected a list of paths");
    return nullptr;
  }
  std::vector<std::string> paths;
  Py_ssize_t n = PyList_Size(list);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* item = PyList_GetItem(list, i);
    const char* s = PyUnicode_AsUTF8(item);
    if (!s) return nullptr;
    paths.emplace_back(s);
  }
  std::vector<Decoded> results;
  Py_BEGIN_ALLOW_THREADS;
  results = decode_batch(paths, target_sr, num_threads);
  Py_END_ALLOW_THREADS;

  PyObject* out = PyList_New(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    const Decoded& d = results[i];
    if (!d.error.empty()) {
      PyObject* tup = Py_BuildValue("(Ois)", Py_None, 0, d.error.c_str());
      PyList_SetItem(out, i, tup);
    } else {
      PyObject* bytes = make_float_array(d.samples);
      PyObject* tup = Py_BuildValue("(NiO)", bytes, d.sample_rate, Py_None);
      PyList_SetItem(out, i, tup);
    }
  }
  return out;
}

PyMethodDef methods[] = {
    {"load_batch", py_load_batch, METH_VARARGS,
     "load_batch(paths, target_sr=0, num_threads=4) -> "
     "[(float32_bytes, sample_rate, error_or_None), ...]"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_native_audio",
                      "native wav decode + resample", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__native_audio() { return PyModule_Create(&module); }
