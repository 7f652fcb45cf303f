/*
 * nspeech_tpu native host data loader.
 *
 * The reference delegated its performance-critical host work to librosa's
 * C extensions and TensorFlow's C++ runtime (SURVEY.md §2: the repo itself
 * is pure Python). This extension is the TPU-host equivalent for the input
 * pipeline: WAV decode (PCM 8/16/24/32 + float32), mono mixdown,
 * Kaiser-windowed polyphase resampling, and framewise RMS — all executed
 * with the GIL released so feeder threads genuinely overlap with the
 * training step. Falls back transparently to the scipy implementations
 * when the extension is not built (nspeech_tpu/native/__init__.py).
 *
 * Uses the CPython C API + numpy only (no pybind11 in this environment).
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cmath>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// WAV decoding
// ---------------------------------------------------------------------------

struct WavData {
  std::vector<float> samples;  // mono, [-1, 1]
  int sample_rate = 0;
  std::string error;
};

uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
uint16_t rd_u16(const uint8_t* p) {
  return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

WavData decode_wav(const uint8_t* data, size_t size) {
  WavData out;
  if (size < 44 || std::memcmp(data, "RIFF", 4) != 0 ||
      std::memcmp(data + 8, "WAVE", 4) != 0) {
    out.error = "not a RIFF/WAVE file";
    return out;
  }
  size_t pos = 12;
  uint16_t format = 0, channels = 0, bits = 0;
  const uint8_t* payload = nullptr;
  size_t payload_size = 0;
  while (pos + 8 <= size) {
    const uint8_t* hdr = data + pos;
    uint32_t chunk_size = rd_u32(hdr + 4);
    const uint8_t* body = hdr + 8;
    if (pos + 8 + chunk_size > size) chunk_size = (uint32_t)(size - pos - 8);
    if (std::memcmp(hdr, "fmt ", 4) == 0 && chunk_size >= 16) {
      format = rd_u16(body);
      channels = rd_u16(body + 2);
      out.sample_rate = (int)rd_u32(body + 4);
      bits = rd_u16(body + 14);
      if (format == 0xFFFE && chunk_size >= 40) {
        format = rd_u16(body + 24);  // WAVE_FORMAT_EXTENSIBLE subformat tag
      }
    } else if (std::memcmp(hdr, "data", 4) == 0) {
      payload = body;
      payload_size = chunk_size;
    }
    pos += 8 + chunk_size + (chunk_size & 1);  // chunks are 2-byte aligned
  }
  if (!payload || channels == 0) {
    out.error = "missing fmt/data chunk";
    return out;
  }
  const size_t bytes_per_sample = bits / 8;
  if (bytes_per_sample == 0) {
    out.error = "bad bits-per-sample";
    return out;
  }
  const size_t n_frames = payload_size / (bytes_per_sample * channels);
  out.samples.resize(n_frames);
  const double inv_channels = 1.0 / channels;

  for (size_t i = 0; i < n_frames; ++i) {
    double acc = 0.0;
    for (unsigned c = 0; c < channels; ++c) {
      const uint8_t* p = payload + (i * channels + c) * bytes_per_sample;
      double v = 0.0;
      if (format == 3 && bits == 32) {  // IEEE float
        float f;
        std::memcpy(&f, p, 4);
        v = f;
      } else if (bits == 16) {
        int16_t s = (int16_t)rd_u16(p);
        v = s / 32768.0;
      } else if (bits == 32) {
        int32_t s = (int32_t)rd_u32(p);
        v = s / 2147483648.0;
      } else if (bits == 24) {
        int32_t s = ((int32_t)p[0] << 8) | ((int32_t)p[1] << 16) |
                    ((int32_t)p[2] << 24);
        v = (s >> 8) / 8388608.0;
      } else if (bits == 8) {
        v = ((int)p[0] - 128) / 128.0;
      }
      acc += v;
    }
    out.samples[i] = (float)(acc * inv_channels);
  }
  return out;
}

// ---------------------------------------------------------------------------
// Polyphase resampling (scipy.signal.resample_poly-compatible filter design:
// Kaiser window beta=5.0, 10*max(up,down) taps each side of center)
// ---------------------------------------------------------------------------

double bessel_i0(double x) {
  // series expansion; converges quickly for the beta values used here
  double sum = 1.0, term = 1.0;
  const double x2 = x * x / 4.0;
  for (int k = 1; k < 64; ++k) {
    term *= x2 / (k * (double)k);
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

std::vector<double> design_lowpass(int up, int down, double beta = 5.0) {
  const int max_rate = up > down ? up : down;
  const double f_c = 1.0 / (2.0 * max_rate);  // cutoff in normalized freq
  const int half_len = 10 * max_rate;
  const int n = 2 * half_len + 1;
  std::vector<double> h(n);
  const double i0b = bessel_i0(beta);
  for (int i = 0; i < n; ++i) {
    const double m = i - half_len;
    // sinc lowpass
    const double x = 2.0 * f_c * m;
    double s = (m == 0) ? 2.0 * f_c : std::sin(M_PI * x) / (M_PI * m);
    // kaiser window
    const double r = 2.0 * i / (n - 1) - 1.0;
    const double w = bessel_i0(beta * std::sqrt(1.0 - r * r)) / i0b;
    h[i] = s * w * up;  // gain compensation for zero-stuffing
  }
  return h;
}

struct PolyphaseFilter {
  // taps reorganized per phase for contiguous access:
  // phases[p] = {first_x_offset_rel_center, contiguous taps (reversed in x)}
  int up = 0, down = 0, taps_per_phase = 0;
  std::vector<float> taps;       // [up, taps_per_phase]
  std::vector<int> first_rel;    // x index of tap 0 relative to center/up
};

const PolyphaseFilter& cached_filter(int up, int down) {
  // GIL-released callers run concurrently: guard the cache with a mutex and
  // use a deque so returned references stay valid across later insertions.
  static std::mutex mu;
  static std::deque<PolyphaseFilter> cache;
  std::lock_guard<std::mutex> lock(mu);
  for (const auto& f : cache) {
    if (f.up == up && f.down == down) return f;
  }
  const std::vector<double> h = design_lowpass(up, down);
  const int half_len = (int)(h.size() / 2);
  PolyphaseFilter f;
  f.up = up;
  f.down = down;
  f.taps_per_phase = (int)(h.size() / up) + 2;
  f.taps.assign((size_t)up * f.taps_per_phase, 0.0f);
  f.first_rel.assign(up, 0);
  for (int p = 0; p < up; ++p) {
    // Output with phase p has upsampled center c with c % up == p... we use
    // phase = center % up; filter index k covers j0 + k where
    // j0 = center - half_len; j must be multiple of up.
    // k0 = (up - ((center - half_len) % up)) % up, independent of center
    // except through p:
    int64_t j0_mod = ((int64_t)p - half_len) % up;
    if (j0_mod < 0) j0_mod += up;
    int k0 = (int)((up - j0_mod) % up);
    f.first_rel[p] = (int)((p - half_len + k0) / up)
        - (int)((p - half_len + k0) % up != 0 ? 1 : 0);
    // recompute exactly: xi_first = floor((center - half_len + k0)/up)
    // center = m*up + p for integer m => xi_first = m + (p - half_len + k0)/up
    f.first_rel[p] = (int)std::floor(((double)p - half_len + k0) / up);
    int i = 0;
    for (int k = k0; k < (int)h.size(); k += up, ++i) {
      f.taps[(size_t)p * f.taps_per_phase + i] = (float)h[(size_t)k];
    }
  }
  cache.push_back(std::move(f));
  return cache.back();
}

std::vector<float> resample_poly(const std::vector<float>& x, int up, int down) {
  if (up == down) return x;
  const PolyphaseFilter& f = cached_filter(up, down);
  const int64_t n_in = (int64_t)x.size();
  const int64_t n_out = (n_in * up + down - 1) / down;
  std::vector<float> y((size_t)n_out);
  for (int64_t t = 0; t < n_out; ++t) {
    const int64_t center = t * down;
    const int p = (int)(center % up);
    const int64_t m = center / up;
    const float* taps = &f.taps[(size_t)p * f.taps_per_phase];
    int64_t xi = m + f.first_rel[p];
    float acc = 0.0f;
    int i = 0;
    // clip leading out-of-range input indices
    if (xi < 0) {
      i = (int)(-xi);
      xi = 0;
    }
    const int i_end = (int)std::min<int64_t>(f.taps_per_phase,
                                             i + (n_in - xi));
    for (; i < i_end; ++i, ++xi) acc += taps[i] * x[(size_t)xi];
    y[(size_t)t] = acc;
  }
  return y;
}

// ---------------------------------------------------------------------------
// Framewise RMS (center-padded, librosa.feature.rms convention)
// ---------------------------------------------------------------------------

std::vector<float> rms_frames(const float* x, int64_t n, int frame_length,
                              int hop_length) {
  const int pad = frame_length / 2;
  const int64_t padded = n + 2 * pad;
  const int64_t n_frames = (padded >= frame_length)
                               ? 1 + (padded - frame_length) / hop_length
                               : 0;
  std::vector<float> out((size_t)n_frames);
  for (int64_t f = 0; f < n_frames; ++f) {
    double acc = 0.0;
    const int64_t start = f * hop_length - pad;
    for (int i = 0; i < frame_length; ++i) {
      const int64_t idx = start + i;
      if (idx >= 0 && idx < n) {
        const double v = x[idx];
        acc += v * v;
      }
    }
    out[(size_t)f] = (float)std::sqrt(acc / frame_length);
  }
  return out;
}

// ---------------------------------------------------------------------------
// Python bindings
// ---------------------------------------------------------------------------

PyObject* vector_to_array(const std::vector<float>& v) {
  npy_intp dims[1] = {(npy_intp)v.size()};
  PyObject* arr = PyArray_SimpleNew(1, dims, NPY_FLOAT32);
  if (!arr) return nullptr;
  std::memcpy(PyArray_DATA((PyArrayObject*)arr), v.data(),
              v.size() * sizeof(float));
  return arr;
}

PyObject* py_load_wav(PyObject*, PyObject* args) {
  const char* path;
  int target_sr;
  if (!PyArg_ParseTuple(args, "si", &path, &target_sr)) return nullptr;

  WavData wav;
  Py_BEGIN_ALLOW_THREADS;
  FILE* f = fopen(path, "rb");
  if (f) {
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf((size_t)size);
    size_t got = fread(buf.data(), 1, (size_t)size, f);
    fclose(f);
    wav = decode_wav(buf.data(), got);
    if (wav.error.empty() && target_sr > 0 && wav.sample_rate != target_sr) {
      // reduce up/down by gcd
      int a = target_sr, b = wav.sample_rate;
      while (b) { int t = a % b; a = b; b = t; }
      wav.samples = resample_poly(wav.samples, target_sr / a,
                                  wav.sample_rate / a);
      wav.sample_rate = target_sr;
    }
  } else {
    wav.error = "cannot open file";
  }
  Py_END_ALLOW_THREADS;

  if (!wav.error.empty()) {
    PyErr_Format(PyExc_IOError, "%s: %s", path, wav.error.c_str());
    return nullptr;
  }
  PyObject* arr = vector_to_array(wav.samples);
  if (!arr) return nullptr;
  return Py_BuildValue("Ni", arr, wav.sample_rate);
}

PyObject* py_resample(PyObject*, PyObject* args) {
  PyObject* obj;
  int up, down;
  if (!PyArg_ParseTuple(args, "Oii", &obj, &up, &down)) return nullptr;
  PyArrayObject* in = (PyArrayObject*)PyArray_FROM_OTF(
      obj, NPY_FLOAT32, NPY_ARRAY_IN_ARRAY);
  if (!in) return nullptr;
  std::vector<float> x((float*)PyArray_DATA(in),
                       (float*)PyArray_DATA(in) + PyArray_SIZE(in));
  Py_DECREF(in);
  std::vector<float> y;
  Py_BEGIN_ALLOW_THREADS;
  y = resample_poly(x, up, down);
  Py_END_ALLOW_THREADS;
  return vector_to_array(y);
}

PyObject* py_rms_frames(PyObject*, PyObject* args) {
  PyObject* obj;
  int frame_length, hop_length;
  if (!PyArg_ParseTuple(args, "Oii", &obj, &frame_length, &hop_length))
    return nullptr;
  PyArrayObject* in = (PyArrayObject*)PyArray_FROM_OTF(
      obj, NPY_FLOAT32, NPY_ARRAY_IN_ARRAY);
  if (!in) return nullptr;
  std::vector<float> out;
  Py_BEGIN_ALLOW_THREADS;
  out = rms_frames((float*)PyArray_DATA(in), PyArray_SIZE(in), frame_length,
                   hop_length);
  Py_END_ALLOW_THREADS;
  Py_DECREF(in);
  return vector_to_array(out);
}

PyMethodDef methods[] = {
    {"load_wav", py_load_wav, METH_VARARGS,
     "load_wav(path, target_sr) -> (float32 mono array, sr)"},
    {"resample", py_resample, METH_VARARGS,
     "resample(x, up, down) -> float32 array (polyphase, kaiser 5.0)"},
    {"rms_frames", py_rms_frames, METH_VARARGS,
     "rms_frames(x, frame_length, hop_length) -> float32 array"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_loader",
                      "Native host audio loader", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__loader(void) {
  import_array();
  return PyModule_Create(&module);
}
