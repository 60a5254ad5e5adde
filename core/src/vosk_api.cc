// vosk_tpu C ABI implementation.
//
// The compute engine is the vosk_tpu Python package (jax/XLA); this shim
// embeds a CPython interpreter and proxies the reference C API surface
// (exception -> NULL/-1 mapping like the reference src/vosk_api.cc), so the
// existing language bindings (nodejs/java/c#/go style FFI) can bind against
// libvosk_tpu the same way they bind libvosk.

#include "vosk_api.h"

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <mutex>
#include <string>

namespace {

std::once_flag g_init_once;
PyObject *g_module = nullptr;  // vosk_tpu

void ensure_python() {
  std::call_once(g_init_once, [] {
    if (!Py_IsInitialized()) {
      Py_InitializeEx(0);
#if PY_VERSION_HEX < 0x03090000
      PyEval_InitThreads();
#endif
      // release the GIL acquired by Py_Initialize
      PyEval_SaveThread();
    }
    PyGILState_STATE st = PyGILState_Ensure();
    g_module = PyImport_ImportModule("vosk_tpu");
    if (!g_module) PyErr_Print();
    PyGILState_Release(st);
  });
}

struct Gil {
  PyGILState_STATE st;
  Gil() { st = PyGILState_Ensure(); }
  ~Gil() { PyGILState_Release(st); }
};

PyObject *call_method(PyObject *obj, const char *name, PyObject *args) {
  PyObject *fn = PyObject_GetAttrString(obj, name);
  if (!fn) return nullptr;
  PyObject *out = PyObject_CallObject(fn, args);
  Py_DECREF(fn);
  Py_XDECREF(args);
  return out;
}

}  // namespace

struct VoskModel {
  PyObject *obj;
};
struct VoskSpkModel {
  PyObject *obj;
};
struct VoskRecognizer {
  PyObject *obj;
  std::string last;
};
struct VoskBatchModel {
  PyObject *obj;
};
struct VoskBatchRecognizer {
  PyObject *obj;
  std::string last;
};

extern "C" {

VoskModel *vosk_model_new(const char *model_path) {
  ensure_python();
  if (!g_module) return nullptr;
  Gil gil;
  PyObject *cls = PyObject_GetAttrString(g_module, "Model");
  if (!cls) return nullptr;
  PyObject *obj =
      PyObject_CallFunction(cls, "s", model_path ? model_path : "");
  Py_DECREF(cls);
  if (!obj) {
    PyErr_Print();
    return nullptr;
  }
  return new VoskModel{obj};
}

void vosk_model_free(VoskModel *model) {
  if (!model) return;
  Gil gil;
  Py_XDECREF(model->obj);
  delete model;
}

int vosk_model_find_word(VoskModel *model, const char *word) {
  if (!model) return -1;
  Gil gil;
  PyObject *r = call_method(model->obj, "FindWord", Py_BuildValue("(s)", word));
  if (!r) {
    PyErr_Print();
    return -1;
  }
  long v = PyLong_AsLong(r);
  Py_DECREF(r);
  return (int)v;
}

VoskSpkModel *vosk_spk_model_new(const char *model_path) {
  ensure_python();
  if (!g_module) return nullptr;
  Gil gil;
  PyObject *cls = PyObject_GetAttrString(g_module, "SpkModel");
  if (!cls) return nullptr;
  PyObject *obj = PyObject_CallFunction(cls, "s", model_path);
  Py_DECREF(cls);
  if (!obj) {
    PyErr_Print();
    return nullptr;
  }
  return new VoskSpkModel{obj};
}

void vosk_spk_model_free(VoskSpkModel *model) {
  if (!model) return;
  Gil gil;
  Py_XDECREF(model->obj);
  delete model;
}

static VoskRecognizer *make_rec(PyObject *args) {
  ensure_python();
  if (!g_module) return nullptr;
  Gil gil;
  PyObject *cls = PyObject_GetAttrString(g_module, "KaldiRecognizer");
  if (!cls) return nullptr;
  PyObject *obj = PyObject_CallObject(cls, args);
  Py_DECREF(cls);
  Py_XDECREF(args);
  if (!obj) {
    PyErr_Print();
    return nullptr;
  }
  return new VoskRecognizer{obj, {}};
}

VoskRecognizer *vosk_recognizer_new(VoskModel *model, float sample_rate) {
  if (!model) return nullptr;
  Gil gil;
  return make_rec(Py_BuildValue("(Of)", model->obj, sample_rate));
}

VoskRecognizer *vosk_recognizer_new_spk(VoskModel *model, float sample_rate,
                                        VoskSpkModel *spk_model) {
  if (!model || !spk_model) return nullptr;
  Gil gil;
  return make_rec(
      Py_BuildValue("(OfO)", model->obj, sample_rate, spk_model->obj));
}

VoskRecognizer *vosk_recognizer_new_grm(VoskModel *model, float sample_rate,
                                        const char *grammar) {
  if (!model) return nullptr;
  Gil gil;
  return make_rec(Py_BuildValue("(Ofs)", model->obj, sample_rate, grammar));
}

void vosk_recognizer_set_spk_model(VoskRecognizer *rec,
                                   VoskSpkModel *spk_model) {
  if (!rec || !spk_model) return;
  Gil gil;
  PyObject *r = call_method(rec->obj, "SetSpkModel",
                            Py_BuildValue("(O)", spk_model->obj));
  if (!r) PyErr_Print();
  Py_XDECREF(r);
}

static void set_int_opt(VoskRecognizer *rec, const char *name, int v) {
  if (!rec) return;
  Gil gil;
  PyObject *r = call_method(rec->obj, name, Py_BuildValue("(i)", v));
  if (!r) PyErr_Print();
  Py_XDECREF(r);
}

void vosk_recognizer_set_max_alternatives(VoskRecognizer *rec, int n) {
  set_int_opt(rec, "SetMaxAlternatives", n);
}
void vosk_recognizer_set_words(VoskRecognizer *rec, int v) {
  set_int_opt(rec, "SetWords", v);
}
void vosk_recognizer_set_partial_words(VoskRecognizer *rec, int v) {
  set_int_opt(rec, "SetPartialWords", v);
}
void vosk_recognizer_set_word_times(VoskRecognizer *rec, int v) {
  /* word timing entries ride the words option (the reference documents
   * vosk_recognizer_set_word_times at vosk_api.h:248 as the switch for the
   * per-word time fields of result()) */
  set_int_opt(rec, "SetWords", v);
}
void vosk_recognizer_set_nlsml(VoskRecognizer *rec, int v) {
  set_int_opt(rec, "SetNLSML", v);
}

int vosk_recognizer_accept_waveform(VoskRecognizer *rec, const char *data,
                                    int length) {
  if (!rec) return -1;
  Gil gil;
  PyObject *bytes = PyBytes_FromStringAndSize(data, length);
  if (!bytes) {
    PyErr_Clear();
    return -1;
  }
  PyObject *args = PyTuple_Pack(1, bytes);
  Py_DECREF(bytes);
  PyObject *r = call_method(rec->obj, "AcceptWaveform", args);
  if (!r) {
    if (getenv("VOSK_TPU_DEBUG")) PyErr_Print(); else PyErr_Clear();
    return -1;
  }
  long v = PyLong_AsLong(r);
  Py_DECREF(r);
  return (int)v;
}

int vosk_recognizer_accept_waveform_s(VoskRecognizer *rec, const short *data,
                                      int length) {
  return vosk_recognizer_accept_waveform(rec, (const char *)data, length * 2);
}

int vosk_recognizer_accept_waveform_f(VoskRecognizer *rec, const float *data,
                                      int length) {
  if (!rec) return -1;
  // convert float samples to 16-bit range bytes via python path
  Gil gil;
  PyObject *mv = PyMemoryView_FromMemory((char *)data, (Py_ssize_t)length * 4,
                                         PyBUF_READ);
  if (!mv) return -1;
  PyObject *np = PyImport_ImportModule("numpy");
  PyObject *arr = nullptr;
  if (np) {
    PyObject *fb = PyObject_GetAttrString(np, "frombuffer");
    if (fb) {
      arr = PyObject_CallFunction(fb, "Os", mv, "float32");
      Py_DECREF(fb);
    }
    Py_DECREF(np);
  }
  Py_DECREF(mv);
  if (!arr) {
    PyErr_Clear();
    return -1;
  }
  PyObject *r =
      call_method(rec->obj, "AcceptWaveform", Py_BuildValue("(O)", arr));
  Py_DECREF(arr);
  if (!r) {
    PyErr_Clear();
    return -1;
  }
  long v = PyLong_AsLong(r);
  Py_DECREF(r);
  return (int)v;
}

static const char *string_result(VoskRecognizer *rec, const char *name) {
  if (!rec) return "";
  Gil gil;
  PyObject *r = call_method(rec->obj, name, nullptr);
  if (!r) {
    PyErr_Print();
    return "";
  }
  const char *s = PyUnicode_AsUTF8(r);
  rec->last = s ? s : "";
  Py_DECREF(r);
  return rec->last.c_str();
}

const char *vosk_recognizer_result(VoskRecognizer *rec) {
  return string_result(rec, "Result");
}
const char *vosk_recognizer_partial_result(VoskRecognizer *rec) {
  return string_result(rec, "PartialResult");
}
const char *vosk_recognizer_final_result(VoskRecognizer *rec) {
  return string_result(rec, "FinalResult");
}

void vosk_recognizer_reset(VoskRecognizer *rec) {
  if (!rec) return;
  Gil gil;
  PyObject *r = call_method(rec->obj, "Reset", nullptr);
  if (!r) PyErr_Print();
  Py_XDECREF(r);
}

void vosk_recognizer_free(VoskRecognizer *rec) {
  if (!rec) return;
  {
    Gil gil;
    Py_XDECREF(rec->obj);
  }
  delete rec;
}

void vosk_set_log_level(int log_level) {
  ensure_python();
  if (!g_module) return;
  Gil gil;
  PyObject *r = call_method(g_module, "SetLogLevel",
                            Py_BuildValue("(i)", log_level));
  Py_XDECREF(r);
}

void vosk_gpu_init() {
  ensure_python();
  if (!g_module) return;
  Gil gil;
  PyObject *r = call_method(g_module, "GpuInit", nullptr);
  if (!r) PyErr_Print();
  Py_XDECREF(r);
}

void vosk_gpu_thread_init() { /* jax manages per-thread device state */ }

VoskBatchModel *vosk_batch_model_new() {
  ensure_python();
  if (!g_module) return nullptr;
  Gil gil;
  PyObject *cls = PyObject_GetAttrString(g_module, "BatchModel");
  if (!cls) return nullptr;
  PyObject *obj = PyObject_CallObject(cls, nullptr);
  Py_DECREF(cls);
  if (!obj) {
    PyErr_Print();
    return nullptr;
  }
  return new VoskBatchModel{obj};
}

void vosk_batch_model_free(VoskBatchModel *m) {
  if (!m) return;
  Gil gil;
  Py_XDECREF(m->obj);
  delete m;
}

void vosk_batch_model_wait(VoskBatchModel *m) {
  if (!m) return;
  Gil gil;
  PyObject *r = call_method(m->obj, "Wait", nullptr);
  if (!r) PyErr_Print();
  Py_XDECREF(r);
}

VoskBatchRecognizer *vosk_batch_recognizer_new(VoskBatchModel *m,
                                               float sample_rate) {
  if (!m) return nullptr;
  ensure_python();
  Gil gil;
  PyObject *cls = PyObject_GetAttrString(g_module, "BatchRecognizer");
  if (!cls) return nullptr;
  PyObject *obj = PyObject_CallFunction(cls, "Of", m->obj, sample_rate);
  Py_DECREF(cls);
  if (!obj) {
    PyErr_Print();
    return nullptr;
  }
  return new VoskBatchRecognizer{obj, {}};
}

void vosk_batch_recognizer_free(VoskBatchRecognizer *r) {
  if (!r) return;
  {
    Gil gil;
    Py_XDECREF(r->obj);
  }
  delete r;
}

void vosk_batch_recognizer_accept_waveform(VoskBatchRecognizer *rec,
                                           const char *data, int length) {
  if (!rec) return;
  Gil gil;
  PyObject *bytes = PyBytes_FromStringAndSize(data, length);
  PyObject *args = bytes ? PyTuple_Pack(1, bytes) : nullptr;
  Py_XDECREF(bytes);
  PyObject *r = call_method(rec->obj, "AcceptWaveform", args);
  if (!r) PyErr_Print();
  Py_XDECREF(r);
}

void vosk_batch_recognizer_set_nlsml(VoskBatchRecognizer *rec, int v) {
  if (!rec) return;
  Gil gil;
  PyObject *r = call_method(rec->obj, "SetNLSML", Py_BuildValue("(i)", v));
  if (!r) PyErr_Print();
  Py_XDECREF(r);
}

void vosk_batch_recognizer_finish_stream(VoskBatchRecognizer *rec) {
  if (!rec) return;
  Gil gil;
  PyObject *r = call_method(rec->obj, "FinishStream", nullptr);
  if (!r) PyErr_Print();
  Py_XDECREF(r);
}

const char *vosk_batch_recognizer_front_result(VoskBatchRecognizer *rec) {
  if (!rec) return "";
  Gil gil;
  PyObject *r = call_method(rec->obj, "FrontResult", nullptr);
  if (!r) {
    PyErr_Print();
    return "";
  }
  const char *s = PyUnicode_AsUTF8(r);
  rec->last = s ? s : "";
  Py_DECREF(r);
  return rec->last.c_str();
}

void vosk_batch_recognizer_pop(VoskBatchRecognizer *rec) {
  if (!rec) return;
  Gil gil;
  PyObject *r = call_method(rec->obj, "Pop", nullptr);
  if (!r) PyErr_Print();
  Py_XDECREF(r);
}

int vosk_batch_recognizer_get_pending_chunks(VoskBatchRecognizer *rec) {
  if (!rec) return 0;
  Gil gil;
  PyObject *r = call_method(rec->obj, "GetPendingChunks", nullptr);
  if (!r) {
    PyErr_Print();
    return 0;
  }
  long v = PyLong_AsLong(r);
  Py_DECREF(r);
  return (int)v;
}

}  // extern "C"
