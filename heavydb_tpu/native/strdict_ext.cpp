// CPython extension: native string dictionary operating directly on Python
// lists — one C loop over PyUnicode objects, no intermediate buffers.
//
// Role of the reference's StringDictionary (StringDictionary/
// StringDictionary.h:119 getOrAddBulk): the bulk-interning hot path of
// import.  Built with g++ against the venv's Python headers (no pybind11 in
// this image); loaded as module `_strdict_ext`.
//
// API:
//   h = create()                      → capsule
//   ids_bytes = intern_bulk(h, list)  → bytes of int32 ids (null→INT32_MIN)
//   ids_bytes = lookup_bulk(h, list)  → bytes of int32 ids (missing→-1)
//   n = count(h)
//   (payload, offsets) = export_payload(h)  → (bytes utf8, bytes int64[n+1])

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline uint64_t hash_bytes(const char* p, Py_ssize_t len) {
  uint64_t h = 1469598103934665603ull;
  for (Py_ssize_t i = 0; i < len; ++i) {
    h ^= static_cast<unsigned char>(p[i]);
    h *= 1099511628211ull;
  }
  return h;
}

struct Dict {
  std::vector<char> bytes;
  std::vector<int64_t> offsets;
  std::vector<int32_t> table;
  uint64_t mask;

  Dict() : mask(1023) {
    offsets.push_back(0);
    table.assign(1024, -1);
  }
  int32_t count() const { return (int32_t)offsets.size() - 1; }
  const char* sp(int32_t id) const { return bytes.data() + offsets[id]; }
  int64_t sl(int32_t id) const { return offsets[id + 1] - offsets[id]; }

  void maybe_grow() {
    if ((uint64_t)count() * 2 < table.size()) return;
    std::vector<int32_t> big(table.size() * 2, -1);
    uint64_t nm = big.size() - 1;
    for (int32_t id = 0; id < count(); ++id) {
      uint64_t h = hash_bytes(sp(id), sl(id)) & nm;
      while (big[h] != -1) h = (h + 1) & nm;
      big[h] = id;
    }
    table.swap(big);
    mask = nm;
  }

  int32_t get(const char* p, Py_ssize_t len) const {
    uint64_t h = hash_bytes(p, len) & mask;
    while (true) {
      int32_t id = table[h];
      if (id == -1) return -1;
      if (sl(id) == len && memcmp(sp(id), p, len) == 0) return id;
      h = (h + 1) & mask;
    }
  }

  int32_t get_or_add(const char* p, Py_ssize_t len) {
    uint64_t h = hash_bytes(p, len) & mask;
    while (true) {
      int32_t id = table[h];
      if (id == -1) {
        int32_t nid = count();
        bytes.insert(bytes.end(), p, p + len);
        offsets.push_back((int64_t)bytes.size());
        table[h] = nid;
        maybe_grow();
        return nid;
      }
      if (sl(id) == len && memcmp(sp(id), p, len) == 0) return id;
      h = (h + 1) & mask;
    }
  }
};

void capsule_free(PyObject* cap) {
  delete static_cast<Dict*>(PyCapsule_GetPointer(cap, "strdict"));
}

Dict* get_dict(PyObject* cap) {
  return static_cast<Dict*>(PyCapsule_GetPointer(cap, "strdict"));
}

PyObject* py_create(PyObject*, PyObject*) {
  return PyCapsule_New(new Dict(), "strdict", capsule_free);
}

constexpr int32_t kNullId = INT32_MIN;

// shared body for intern/lookup
template <bool kIntern>
PyObject* bulk_impl(PyObject* args) {
  PyObject* cap;
  PyObject* seq;
  if (!PyArg_ParseTuple(args, "OO", &cap, &seq)) return nullptr;
  Dict* d = get_dict(cap);
  if (!d) return nullptr;
  PyObject* fast = PySequence_Fast(seq, "expected a sequence");
  if (!fast) return nullptr;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
  PyObject* out = PyBytes_FromStringAndSize(nullptr, n * sizeof(int32_t));
  if (!out) {
    Py_DECREF(fast);
    return nullptr;
  }
  int32_t* ids = reinterpret_cast<int32_t*>(PyBytes_AS_STRING(out));
  PyObject** items = PySequence_Fast_ITEMS(fast);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* o = items[i];
    if (o == Py_None) {
      ids[i] = kIntern ? kNullId : -1;
      continue;
    }
    Py_ssize_t len;
    const char* p;
    if (PyUnicode_Check(o)) {
      p = PyUnicode_AsUTF8AndSize(o, &len);
      if (!p) {
        Py_DECREF(fast);
        Py_DECREF(out);
        return nullptr;
      }
    } else if (PyFloat_Check(o) && Py_IS_NAN(PyFloat_AS_DOUBLE(o))) {
      ids[i] = kIntern ? kNullId : -1;
      continue;
    } else {
      PyObject* s = PyObject_Str(o);
      if (!s) {
        Py_DECREF(fast);
        Py_DECREF(out);
        return nullptr;
      }
      p = PyUnicode_AsUTF8AndSize(s, &len);
      ids[i] = kIntern ? d->get_or_add(p, len) : d->get(p, len);
      Py_DECREF(s);
      continue;
    }
    ids[i] = kIntern ? d->get_or_add(p, len) : d->get(p, len);
  }
  Py_DECREF(fast);
  return out;
}

PyObject* py_intern_bulk(PyObject*, PyObject* args) {
  return bulk_impl<true>(args);
}

// bulk get-or-add straight from a CSV parser payload: (capsule,
// payload bytes, int64 offsets[n+1] bytes, uint8 null-mask[n] bytes) →
// int32 ids bytes.  No per-row Python string objects — the whole import
// path stays in native code (reference: parallel getOrAddBulk over the
// import worker's string views, StringDictionary.cpp).
PyObject* py_intern_payload(PyObject*, PyObject* args) {
  PyObject* cap;
  Py_buffer payload, offs, nulls;
  if (!PyArg_ParseTuple(args, "Oy*y*y*", &cap, &payload, &offs, &nulls))
    return nullptr;
  Dict* d = get_dict(cap);
  if (!d) {
    PyBuffer_Release(&payload);
    PyBuffer_Release(&offs);
    PyBuffer_Release(&nulls);
    return nullptr;
  }
  const char* base = reinterpret_cast<const char*>(payload.buf);
  const int64_t* off = reinterpret_cast<const int64_t*>(offs.buf);
  const uint8_t* ok = reinterpret_cast<const uint8_t*>(nulls.buf);
  Py_ssize_t n = nulls.len;
  // bounds validation: offsets must cover n+1 entries and stay within
  // the payload, else the loop below would read out of bounds
  if (offs.len < (Py_ssize_t)((n + 1) * sizeof(int64_t)) ||
      (n > 0 && (off[0] < 0 || off[n] > (int64_t)payload.len))) {
    PyBuffer_Release(&payload);
    PyBuffer_Release(&offs);
    PyBuffer_Release(&nulls);
    PyErr_SetString(PyExc_ValueError,
                    "intern_payload: offsets/payload size mismatch");
    return nullptr;
  }
  for (Py_ssize_t i = 0; i < n; ++i) {
    if (off[i + 1] < off[i]) {
      PyBuffer_Release(&payload);
      PyBuffer_Release(&offs);
      PyBuffer_Release(&nulls);
      PyErr_SetString(PyExc_ValueError,
                      "intern_payload: non-monotone offsets");
      return nullptr;
    }
  }
  PyObject* out = PyBytes_FromStringAndSize(nullptr, n * sizeof(int32_t));
  if (out) {
    int32_t* ids = reinterpret_cast<int32_t*>(PyBytes_AS_STRING(out));
    for (Py_ssize_t i = 0; i < n; ++i) {
      if (!ok[i]) {
        ids[i] = kNullId;
      } else {
        ids[i] = d->get_or_add(base + off[i],
                               (size_t)(off[i + 1] - off[i]));
      }
    }
  }
  PyBuffer_Release(&payload);
  PyBuffer_Release(&offs);
  PyBuffer_Release(&nulls);
  return out;
}

PyObject* py_lookup_bulk(PyObject*, PyObject* args) {
  return bulk_impl<false>(args);
}

PyObject* py_count(PyObject*, PyObject* args) {
  PyObject* cap;
  if (!PyArg_ParseTuple(args, "O", &cap)) return nullptr;
  return PyLong_FromLong(get_dict(cap)->count());
}

PyObject* py_export_payload(PyObject*, PyObject* args) {
  PyObject* cap;
  if (!PyArg_ParseTuple(args, "O", &cap)) return nullptr;
  Dict* d = get_dict(cap);
  PyObject* payload =
      PyBytes_FromStringAndSize(d->bytes.data(), (Py_ssize_t)d->bytes.size());
  PyObject* offsets = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(d->offsets.data()),
      (Py_ssize_t)(d->offsets.size() * sizeof(int64_t)));
  if (!payload || !offsets) {
    Py_XDECREF(payload);
    Py_XDECREF(offsets);
    return nullptr;
  }
  // "NN" steals both references (PyTuple_Pack would incref and leak them)
  return Py_BuildValue("(NN)", payload, offsets);
}

PyMethodDef methods[] = {
    {"create", py_create, METH_NOARGS, "new dictionary"},
    {"intern_bulk", py_intern_bulk, METH_VARARGS, "bulk get-or-add"},
    {"intern_payload", py_intern_payload, METH_VARARGS,
     "bulk get-or-add from (payload, offsets, mask) buffers"},
    {"lookup_bulk", py_lookup_bulk, METH_VARARGS, "bulk lookup"},
    {"count", py_count, METH_VARARGS, "entry count"},
    {"export_payload", py_export_payload, METH_VARARGS, "payload bytes"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_strdict_ext", nullptr, -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__strdict_ext(void) {
  return PyModule_Create(&moduledef);
}
