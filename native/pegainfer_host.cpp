/* pegainfer_host — native host-side runtime core.
 *
 * The TPU compute path is JAX/XLA/Pallas; this extension is the native
 * replacement for the reference's Rust host runtime hot path
 * (pegainfer-core/src/page_pool.rs, kv_pool.rs KvState grow/advance,
 * qwen3-4b/src/scheduler.rs admission math, and the per-step decode batch
 * assembly the executor runs once per token block). Python fallbacks with
 * identical semantics live in pegainfer_tpu/engine/kv.py; parity is pinned
 * by tests/test_native_host.py.
 *
 * Exposed API (CPython C API, no pybind11 in this image):
 *   HostPool(num_pages, reserve_null_page=True)
 *     .alloc(n) -> list[int]        .free(list[int])
 *     .available -> int             .allocated -> int
 *   HostKv(pool, page_size)
 *     .ensure(request_id, total_tokens)   (grow pages)
 *     .advance(request_id, n)
 *     .length(request_id) -> int
 *     .pages(request_id) -> list[int]
 *     .release(request_id)
 *     .assemble(request_ids, token_ids, B, P, extra_tokens, dead_slot)
 *         -> (tokens, positions, tables, seq_lens, slots) int32 bytes
 *            packed in one contiguous buffer (numpy frombuffer on the
 *            Python side) — one C call per decode block instead of a
 *            Python loop over requests.
 *   admit(deferred[(prompt_len, max_tokens)], active[(prompt_len,
 *         max_tokens, generated)], page_size, available, max_request_pages)
 *     -> (admit_mask list[int 0/1/2])   0=defer 1=admit 2=reject
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Pool {
  std::vector<int32_t> free_list;
  int64_t allocated = 0;
  int32_t num_pages = 0;
};

struct KvEntry {
  std::vector<int32_t> pages;
  int64_t length = 0;
};

struct HostPoolObject {
  PyObject_HEAD
  Pool* pool;
};

struct HostKvObject {
  PyObject_HEAD
  HostPoolObject* pool_obj;  // owned reference
  int32_t page_size;
  std::unordered_map<int64_t, KvEntry>* states;
};

static int64_t ceil_div(int64_t a, int64_t b) { return (a + b - 1) / b; }

/* ── HostPool ─────────────────────────────────────────────────────────── */

static PyObject* HostPool_new(PyTypeObject* type, PyObject* args, PyObject* kw) {
  long num_pages;
  int reserve_null = 1;
  static const char* kws[] = {"num_pages", "reserve_null_page", nullptr};
  if (!PyArg_ParseTupleAndKeywords(args, kw, "l|p", const_cast<char**>(kws),
                                   &num_pages, &reserve_null))
    return nullptr;
  if (num_pages < 2) {
    PyErr_SetString(PyExc_ValueError, "need at least 2 pages");
    return nullptr;
  }
  HostPoolObject* self = (HostPoolObject*)type->tp_alloc(type, 0);
  if (!self) return nullptr;
  self->pool = new Pool();
  self->pool->num_pages = (int32_t)num_pages;
  int32_t first = reserve_null ? 1 : 0;
  self->pool->free_list.reserve(num_pages - first);
  for (int32_t p = (int32_t)num_pages - 1; p >= first; --p)
    self->pool->free_list.push_back(p);
  return (PyObject*)self;
}

static void HostPool_dealloc(HostPoolObject* self) {
  delete self->pool;
  Py_TYPE(self)->tp_free((PyObject*)self);
}

static PyObject* HostPool_alloc(HostPoolObject* self, PyObject* arg) {
  long n = PyLong_AsLong(arg);
  if (n < 0 && PyErr_Occurred()) return nullptr;
  Pool* p = self->pool;
  if ((size_t)n > p->free_list.size()) {
    PyErr_Format(PyExc_RuntimeError, "page pool exhausted: want %ld, have %zu",
                 n, p->free_list.size());
    return nullptr;
  }
  PyObject* out = PyList_New(n);
  for (long i = 0; i < n; ++i) {
    int32_t page = p->free_list.back();
    p->free_list.pop_back();
    PyList_SET_ITEM(out, i, PyLong_FromLong(page));
  }
  p->allocated += n;
  return out;
}

static PyObject* HostPool_free(HostPoolObject* self, PyObject* arg) {
  PyObject* seq = PySequence_Fast(arg, "expected a sequence of pages");
  if (!seq) return nullptr;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  for (Py_ssize_t i = 0; i < n; ++i) {
    long page = PyLong_AsLong(PySequence_Fast_GET_ITEM(seq, i));
    if (page == 0) {
      Py_DECREF(seq);
      PyErr_SetString(PyExc_ValueError, "freeing the null page");
      return nullptr;
    }
    self->pool->free_list.push_back((int32_t)page);
  }
  self->pool->allocated -= n;
  Py_DECREF(seq);
  Py_RETURN_NONE;
}

static PyObject* HostPool_get_available(HostPoolObject* self, void*) {
  return PyLong_FromSize_t(self->pool->free_list.size());
}
static PyObject* HostPool_get_allocated(HostPoolObject* self, void*) {
  return PyLong_FromLongLong(self->pool->allocated);
}

static PyMethodDef HostPool_methods[] = {
    {"alloc", (PyCFunction)HostPool_alloc, METH_O, "allocate n pages"},
    {"free", (PyCFunction)HostPool_free, METH_O, "free pages"},
    {nullptr, nullptr, 0, nullptr},
};
static PyGetSetDef HostPool_getset[] = {
    {"available", (getter)HostPool_get_available, nullptr, nullptr, nullptr},
    {"allocated", (getter)HostPool_get_allocated, nullptr, nullptr, nullptr},
    {nullptr, nullptr, nullptr, nullptr, nullptr},
};

static PyTypeObject HostPoolType = {
    PyVarObject_HEAD_INIT(nullptr, 0)
};

/* ── HostKv ───────────────────────────────────────────────────────────── */

static PyObject* HostKv_new(PyTypeObject* type, PyObject* args, PyObject* kw) {
  PyObject* pool;
  long page_size;
  static const char* kws[] = {"pool", "page_size", nullptr};
  if (!PyArg_ParseTupleAndKeywords(args, kw, "Ol", const_cast<char**>(kws),
                                   &pool, &page_size))
    return nullptr;
  if (!PyObject_TypeCheck(pool, &HostPoolType)) {
    PyErr_SetString(PyExc_TypeError, "pool must be a HostPool");
    return nullptr;
  }
  HostKvObject* self = (HostKvObject*)type->tp_alloc(type, 0);
  if (!self) return nullptr;
  Py_INCREF(pool);
  self->pool_obj = (HostPoolObject*)pool;
  self->page_size = (int32_t)page_size;
  self->states = new std::unordered_map<int64_t, KvEntry>();
  return (PyObject*)self;
}

static void HostKv_dealloc(HostKvObject* self) {
  delete self->states;
  Py_XDECREF(self->pool_obj);
  Py_TYPE(self)->tp_free((PyObject*)self);
}

static int grow(HostKvObject* self, KvEntry& e, int64_t total_tokens) {
  int64_t need = ceil_div(total_tokens, self->page_size) - (int64_t)e.pages.size();
  if (need <= 0) return 0;
  Pool* p = self->pool_obj->pool;
  if ((size_t)need > p->free_list.size()) {
    PyErr_Format(PyExc_RuntimeError, "page pool exhausted: want %lld, have %zu",
                 (long long)need, p->free_list.size());
    return -1;
  }
  for (int64_t i = 0; i < need; ++i) {
    e.pages.push_back(p->free_list.back());
    p->free_list.pop_back();
  }
  p->allocated += need;
  return 0;
}

static PyObject* HostKv_ensure(HostKvObject* self, PyObject* args) {
  long long rid, total;
  if (!PyArg_ParseTuple(args, "LL", &rid, &total)) return nullptr;
  KvEntry& e = (*self->states)[rid];
  if (grow(self, e, total) < 0) return nullptr;
  Py_RETURN_NONE;
}

static PyObject* HostKv_advance(HostKvObject* self, PyObject* args) {
  long long rid, n;
  if (!PyArg_ParseTuple(args, "LL", &rid, &n)) return nullptr;
  KvEntry& e = (*self->states)[rid];
  e.length += n;
  if (e.length > (int64_t)e.pages.size() * self->page_size) {
    PyErr_SetString(PyExc_RuntimeError, "KV advance past capacity");
    return nullptr;
  }
  Py_RETURN_NONE;
}

static PyObject* HostKv_length(HostKvObject* self, PyObject* arg) {
  long long rid = PyLong_AsLongLong(arg);
  auto it = self->states->find(rid);
  return PyLong_FromLongLong(it == self->states->end() ? 0 : it->second.length);
}

static PyObject* HostKv_pages(HostKvObject* self, PyObject* arg) {
  long long rid = PyLong_AsLongLong(arg);
  auto it = self->states->find(rid);
  size_t n = it == self->states->end() ? 0 : it->second.pages.size();
  PyObject* out = PyList_New(n);
  for (size_t i = 0; i < n; ++i)
    PyList_SET_ITEM(out, i, PyLong_FromLong(it->second.pages[i]));
  return out;
}

static PyObject* HostKv_release(HostKvObject* self, PyObject* arg) {
  long long rid = PyLong_AsLongLong(arg);
  auto it = self->states->find(rid);
  if (it != self->states->end()) {
    Pool* p = self->pool_obj->pool;
    for (int32_t page : it->second.pages) p->free_list.push_back(page);
    p->allocated -= (int64_t)it->second.pages.size();
    self->states->erase(it);
  }
  Py_RETURN_NONE;
}

/* assemble(request_ids, token_ids, B, P, extra_tokens, dead_slot,
 *          slot_ids) -> bytes of int32[B + B + B*P + B + B]
 * layout: tokens | positions | tables(row-major) | seq_lens | slots */
static PyObject* HostKv_assemble(HostKvObject* self, PyObject* args) {
  PyObject *rids_obj, *toks_obj, *slots_obj;
  long B, P, extra, dead_slot;
  if (!PyArg_ParseTuple(args, "OOllllO", &rids_obj, &toks_obj, &B, &P, &extra,
                        &dead_slot, &slots_obj))
    return nullptr;
  PyObject* rids = PySequence_Fast(rids_obj, "request_ids");
  PyObject* toks = PySequence_Fast(toks_obj, "token_ids");
  PyObject* slots_in = PySequence_Fast(slots_obj, "slot_ids");
  if (!rids || !toks || !slots_in) {
    Py_XDECREF(rids); Py_XDECREF(toks); Py_XDECREF(slots_in);
    return nullptr;
  }
  Py_ssize_t n = PySequence_Fast_GET_SIZE(rids);

  Py_ssize_t total = B + B + (Py_ssize_t)B * P + B + B;
  PyObject* out = PyBytes_FromStringAndSize(nullptr, total * 4);
  if (!out) { Py_DECREF(rids); Py_DECREF(toks); Py_DECREF(slots_in); return nullptr; }
  int32_t* buf = (int32_t*)PyBytes_AS_STRING(out);
  std::memset(buf, 0, total * 4);
  int32_t* tokens = buf;
  int32_t* positions = buf + B;
  int32_t* tables = buf + 2 * B;
  int32_t* seq_lens = buf + 2 * B + (Py_ssize_t)B * P;
  int32_t* slots = seq_lens + B;
  for (long i = 0; i < B; ++i) slots[i] = (int32_t)dead_slot;

  for (Py_ssize_t i = 0; i < n; ++i) {
    int64_t rid = PyLong_AsLongLong(PySequence_Fast_GET_ITEM(rids, i));
    KvEntry& e = (*self->states)[rid];
    int64_t pos = e.length;
    if (grow(self, e, pos + 1 + extra) < 0) {
      Py_DECREF(rids); Py_DECREF(toks); Py_DECREF(slots_in); Py_DECREF(out);
      return nullptr;
    }
    tokens[i] = (int32_t)PyLong_AsLong(PySequence_Fast_GET_ITEM(toks, i));
    positions[i] = (int32_t)pos;
    seq_lens[i] = (int32_t)(pos + 1);
    slots[i] = (int32_t)PyLong_AsLong(PySequence_Fast_GET_ITEM(slots_in, i));
    size_t np_ = e.pages.size();
    for (size_t j = 0; j < np_ && j < (size_t)P; ++j)
      tables[i * P + j] = e.pages[j];
  }
  Py_DECREF(rids); Py_DECREF(toks); Py_DECREF(slots_in);
  return out;
}

static PyMethodDef HostKv_methods[] = {
    {"ensure", (PyCFunction)HostKv_ensure, METH_VARARGS, nullptr},
    {"advance", (PyCFunction)HostKv_advance, METH_VARARGS, nullptr},
    {"length", (PyCFunction)HostKv_length, METH_O, nullptr},
    {"pages", (PyCFunction)HostKv_pages, METH_O, nullptr},
    {"release", (PyCFunction)HostKv_release, METH_O, nullptr},
    {"assemble", (PyCFunction)HostKv_assemble, METH_VARARGS, nullptr},
    {nullptr, nullptr, 0, nullptr},
};

static PyTypeObject HostKvType = {
    PyVarObject_HEAD_INIT(nullptr, 0)
};

/* ── admission (module function) ──────────────────────────────────────── */

static PyObject* host_admit(PyObject*, PyObject* args) {
  PyObject *deferred_obj, *active_obj;
  long page_size, available, max_request_pages;
  if (!PyArg_ParseTuple(args, "OOlll", &deferred_obj, &active_obj, &page_size,
                        &available, &max_request_pages))
    return nullptr;
  PyObject* deferred = PySequence_Fast(deferred_obj, "deferred");
  PyObject* active = PySequence_Fast(active_obj, "active");
  if (!deferred || !active) { Py_XDECREF(deferred); Py_XDECREF(active); return nullptr; }

  int64_t future = 0;
  Py_ssize_t na = PySequence_Fast_GET_SIZE(active);
  for (Py_ssize_t i = 0; i < na; ++i) {
    PyObject* t = PySequence_Fast_GET_ITEM(active, i);
    long prompt = PyLong_AsLong(PyTuple_GetItem(t, 0));
    long max_tok = PyLong_AsLong(PyTuple_GetItem(t, 1));
    long gen = PyLong_AsLong(PyTuple_GetItem(t, 2));
    int64_t max_total = prompt + (max_tok > 1 ? max_tok - 1 : 0);
    int64_t cur_total = prompt + (gen > 1 ? gen - 1 : 0);
    future += ceil_div(max_total, page_size) - ceil_div(cur_total, page_size);
  }
  int64_t budget = available - future;
  if (budget < 0) budget = 0;

  Py_ssize_t nd = PySequence_Fast_GET_SIZE(deferred);
  PyObject* out = PyList_New(nd);
  for (Py_ssize_t i = 0; i < nd; ++i) {
    PyObject* t = PySequence_Fast_GET_ITEM(deferred, i);
    long prompt = PyLong_AsLong(PyTuple_GetItem(t, 0));
    long max_tok = PyLong_AsLong(PyTuple_GetItem(t, 1));
    int64_t max_needed =
        ceil_div(prompt + (max_tok > 1 ? max_tok - 1 : 0), page_size);
    long verdict;
    if (max_needed > max_request_pages) {
      verdict = 2;  // reject
    } else if (max_needed <= budget) {
      budget -= max_needed;
      verdict = 1;  // admit
    } else {
      verdict = 0;  // defer
    }
    PyList_SET_ITEM(out, i, PyLong_FromLong(verdict));
  }
  Py_DECREF(deferred);
  Py_DECREF(active);
  return out;
}

static PyMethodDef module_methods[] = {
    {"admit", host_admit, METH_VARARGS,
     "FCFS full-lifetime-page admission (0=defer 1=admit 2=reject)"},
    {nullptr, nullptr, 0, nullptr},
};

static PyModuleDef host_module = {
    PyModuleDef_HEAD_INIT, "pegainfer_host",
    "native host runtime core (page pool, kv state, batch assembly)",
    -1, module_methods, nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit_pegainfer_host(void) {
  HostPoolType.tp_name = "pegainfer_host.HostPool";
  HostPoolType.tp_basicsize = sizeof(HostPoolObject);
  HostPoolType.tp_flags = Py_TPFLAGS_DEFAULT;
  HostPoolType.tp_new = HostPool_new;
  HostPoolType.tp_dealloc = (destructor)HostPool_dealloc;
  HostPoolType.tp_methods = HostPool_methods;
  HostPoolType.tp_getset = HostPool_getset;
  if (PyType_Ready(&HostPoolType) < 0) return nullptr;

  HostKvType.tp_name = "pegainfer_host.HostKv";
  HostKvType.tp_basicsize = sizeof(HostKvObject);
  HostKvType.tp_flags = Py_TPFLAGS_DEFAULT;
  HostKvType.tp_new = HostKv_new;
  HostKvType.tp_dealloc = (destructor)HostKv_dealloc;
  HostKvType.tp_methods = HostKv_methods;
  if (PyType_Ready(&HostKvType) < 0) return nullptr;

  PyObject* m = PyModule_Create(&host_module);
  if (!m) return nullptr;
  Py_INCREF(&HostPoolType);
  PyModule_AddObject(m, "HostPool", (PyObject*)&HostPoolType);
  Py_INCREF(&HostKvType);
  PyModule_AddObject(m, "HostKv", (PyObject*)&HostKvType);
  return m;
}
