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

#include <atomic>
#include <cstdint>
#include <cstring>
#include <fstream>
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
      results[i] = decode_wav(paths[i]);
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
