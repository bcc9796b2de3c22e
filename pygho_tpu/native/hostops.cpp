// Native host-side kernels for the preprocessing/index engine.
//
// The reference delegates its preprocessing hot loops to torch's C++
// kernels (searchsorted / unique / argsort — SURVEY.md §2.6); this module
// is the equivalent native layer for the TPU build: the operations that
// stay serial or loop-bound in numpy are implemented in C++ and exposed
// through the CPython API (no pybind11 in this image).
//
//   - chunk_bounds: the greedy walk that cuts the fused-kernel chunk plan
//     (pygho_tpu/kernels/fused_spspmm.py build_chunk_plan) — a per-row
//     data-dependent scan that numpy cannot vectorize.
//   - spspmm_join: the interval-matching expansion at the heart of
//     spspmm_ind (reference backend/Spspmm.py:107-143): for sorted k2,
//     emit all (c, d) pairs with k1[c] == k2[d].
//
// Built as a plain C extension via setuptools (pygho_tpu/native/build.py).

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cstdint>
#include <vector>

// chunk_bounds(t, u, v, C, R, S) -> (starts, ends, ublk, vblk, oblk)
// t sorted ascending; cut greedy chunks of <= C rows whose u (resp. v)
// stay inside the aligned R-window of the chunk's first row, and whose t
// stay inside the aligned S-window.
static PyObject *chunk_bounds(PyObject *self, PyObject *args) {
  PyArrayObject *t_arr, *u_arr, *v_arr;
  long C, R, S;
  if (!PyArg_ParseTuple(args, "O!O!O!lll", &PyArray_Type, &t_arr,
                        &PyArray_Type, &u_arr, &PyArray_Type, &v_arr, &C, &R,
                        &S))
    return nullptr;
  if (PyArray_TYPE(t_arr) != NPY_INT64 || PyArray_TYPE(u_arr) != NPY_INT64 ||
      PyArray_TYPE(v_arr) != NPY_INT64) {
    PyErr_SetString(PyExc_TypeError, "expected int64 arrays");
    return nullptr;
  }
  npy_intp K = PyArray_DIM(t_arr, 0);
  const int64_t *t = (const int64_t *)PyArray_DATA(t_arr);
  const int64_t *u = (const int64_t *)PyArray_DATA(u_arr);
  const int64_t *v = (const int64_t *)PyArray_DATA(v_arr);

  std::vector<int64_t> starts, ends, ub_v, vb_v, ob_v;
  npy_intp start = 0;
  while (start < K) {
    int64_t ub = u[start] / R, vb = v[start] / R, ob = t[start] / S;
    npy_intp end = start;
    npy_intp end_max = start + C < K ? start + C : K;
    while (end < end_max && u[end] / R == ub && v[end] / R == vb &&
           t[end] / S == ob)
      ++end;
    starts.push_back(start);
    ends.push_back(end);
    ub_v.push_back(ub);
    vb_v.push_back(vb);
    ob_v.push_back(ob);
    start = end;
  }

  npy_intp n = (npy_intp)starts.size();
  PyObject *out = PyTuple_New(5);
  const std::vector<int64_t> *vecs[5] = {&starts, &ends, &ub_v, &vb_v, &ob_v};
  for (int i = 0; i < 5; i++) {
    PyArrayObject *a = (PyArrayObject *)PyArray_SimpleNew(1, &n, NPY_INT64);
    memcpy(PyArray_DATA(a), vecs[i]->data(), n * sizeof(int64_t));
    PyTuple_SET_ITEM(out, i, (PyObject *)a);
  }
  return out;
}

// spspmm_join(k1, lo, cnt) -> (c, d_sorted)
// Given per-row match interval starts `lo` and counts `cnt` into the
// k2-sorted order, emit the expanded (c, d_sorted_pos) pair arrays.
static PyObject *spspmm_join(PyObject *self, PyObject *args) {
  PyArrayObject *lo_arr, *cnt_arr;
  if (!PyArg_ParseTuple(args, "O!O!", &PyArray_Type, &lo_arr, &PyArray_Type,
                        &cnt_arr))
    return nullptr;
  if (PyArray_TYPE(lo_arr) != NPY_INT64 || PyArray_TYPE(cnt_arr) != NPY_INT64) {
    PyErr_SetString(PyExc_TypeError, "expected int64 arrays");
    return nullptr;
  }
  npy_intp n = PyArray_DIM(lo_arr, 0);
  const int64_t *lo = (const int64_t *)PyArray_DATA(lo_arr);
  const int64_t *cnt = (const int64_t *)PyArray_DATA(cnt_arr);
  int64_t total = 0;
  for (npy_intp i = 0; i < n; i++) total += cnt[i];

  npy_intp tot = (npy_intp)total;
  PyArrayObject *c_arr = (PyArrayObject *)PyArray_SimpleNew(1, &tot, NPY_INT64);
  PyArrayObject *d_arr = (PyArrayObject *)PyArray_SimpleNew(1, &tot, NPY_INT64);
  int64_t *c = (int64_t *)PyArray_DATA(c_arr);
  int64_t *d = (int64_t *)PyArray_DATA(d_arr);
  int64_t w = 0;
  for (npy_intp i = 0; i < n; i++) {
    for (int64_t j = 0; j < cnt[i]; j++) {
      c[w] = i;
      d[w] = lo[i] + j;
      ++w;
    }
  }
  PyObject *out = PyTuple_New(2);
  PyTuple_SET_ITEM(out, 0, (PyObject *)c_arr);
  PyTuple_SET_ITEM(out, 1, (PyObject *)d_arr);
  return out;
}

// chunk_bounds_dyn(t, u, v, C, R, S): dynamic-window variant — chunks cut
// when the running u/v RANGE reaches R (window base = running min, no
// alignment), or t leaves its aligned S window, or C rows are taken.
static PyObject *chunk_bounds_dyn(PyObject *self, PyObject *args) {
  PyArrayObject *t_arr, *u_arr, *v_arr;
  long C, R, S;
  if (!PyArg_ParseTuple(args, "O!O!O!lll", &PyArray_Type, &t_arr,
                        &PyArray_Type, &u_arr, &PyArray_Type, &v_arr, &C, &R,
                        &S))
    return nullptr;
  if (PyArray_TYPE(t_arr) != NPY_INT64 || PyArray_TYPE(u_arr) != NPY_INT64 ||
      PyArray_TYPE(v_arr) != NPY_INT64) {
    PyErr_SetString(PyExc_TypeError, "expected int64 arrays");
    return nullptr;
  }
  npy_intp K = PyArray_DIM(t_arr, 0);
  const int64_t *t = (const int64_t *)PyArray_DATA(t_arr);
  const int64_t *u = (const int64_t *)PyArray_DATA(u_arr);
  const int64_t *v = (const int64_t *)PyArray_DATA(v_arr);

  std::vector<int64_t> starts, ends, ub_v, vb_v, ob_v;
  npy_intp start = 0;
  while (start < K) {
    int64_t ob = t[start] / S;
    int64_t umin = u[start], umax = u[start];
    int64_t vmin = v[start], vmax = v[start];
    npy_intp end = start;
    npy_intp end_max = start + C < K ? start + C : K;
    while (end < end_max) {
      int64_t numin = u[end] < umin ? u[end] : umin;
      int64_t numax = u[end] > umax ? u[end] : umax;
      int64_t nvmin = v[end] < vmin ? v[end] : vmin;
      int64_t nvmax = v[end] > vmax ? v[end] : vmax;
      if (numax - numin >= R || nvmax - nvmin >= R || t[end] / S != ob) break;
      umin = numin; umax = numax; vmin = nvmin; vmax = nvmax;
      ++end;
    }
    if (end == start) ++end;  // always make progress (can't happen: row 0 fits)
    starts.push_back(start);
    ends.push_back(end);
    ub_v.push_back(umin);
    vb_v.push_back(vmin);
    ob_v.push_back(ob);
    start = end;
  }

  npy_intp n = (npy_intp)starts.size();
  PyObject *out = PyTuple_New(5);
  const std::vector<int64_t> *vecs[5] = {&starts, &ends, &ub_v, &vb_v, &ob_v};
  for (int i = 0; i < 5; i++) {
    PyArrayObject *a = (PyArrayObject *)PyArray_SimpleNew(1, &n, NPY_INT64);
    memcpy(PyArray_DATA(a), vecs[i]->data(), n * sizeof(int64_t));
    PyTuple_SET_ITEM(out, i, (PyObject *)a);
  }
  return out;
}

// chunk_bounds_dyn2(t, u, v, C, Ru, Rv, S): like chunk_bounds_dyn but
// with independent u / v window sizes — the v operand (edge values) is
// usually a much smaller array than the u operand (tuple values), so a
// narrower Rv cuts the kernel's one-hot gather FLOPs without
// fragmenting chunks on the u side.
static PyObject *chunk_bounds_dyn2(PyObject *self, PyObject *args) {
  PyArrayObject *t_arr, *u_arr, *v_arr;
  long C, Ru, Rv, S;
  if (!PyArg_ParseTuple(args, "O!O!O!llll", &PyArray_Type, &t_arr,
                        &PyArray_Type, &u_arr, &PyArray_Type, &v_arr, &C, &Ru,
                        &Rv, &S))
    return nullptr;
  if (PyArray_TYPE(t_arr) != NPY_INT64 || PyArray_TYPE(u_arr) != NPY_INT64 ||
      PyArray_TYPE(v_arr) != NPY_INT64) {
    PyErr_SetString(PyExc_TypeError, "expected int64 arrays");
    return nullptr;
  }
  npy_intp K = PyArray_DIM(t_arr, 0);
  const int64_t *t = (const int64_t *)PyArray_DATA(t_arr);
  const int64_t *u = (const int64_t *)PyArray_DATA(u_arr);
  const int64_t *v = (const int64_t *)PyArray_DATA(v_arr);

  std::vector<int64_t> starts, ends, ub_v, vb_v, ob_v;
  npy_intp start = 0;
  while (start < K) {
    int64_t ob = t[start] / S;
    int64_t umin = u[start], umax = u[start];
    int64_t vmin = v[start], vmax = v[start];
    npy_intp end = start;
    npy_intp end_max = start + C < K ? start + C : K;
    while (end < end_max) {
      int64_t numin = u[end] < umin ? u[end] : umin;
      int64_t numax = u[end] > umax ? u[end] : umax;
      int64_t nvmin = v[end] < vmin ? v[end] : vmin;
      int64_t nvmax = v[end] > vmax ? v[end] : vmax;
      if (numax - numin >= Ru || nvmax - nvmin >= Rv || t[end] / S != ob)
        break;
      umin = numin; umax = numax; vmin = nvmin; vmax = nvmax;
      ++end;
    }
    if (end == start) ++end;  // always make progress (can't happen: row 0 fits)
    starts.push_back(start);
    ends.push_back(end);
    ub_v.push_back(umin);
    vb_v.push_back(vmin);
    ob_v.push_back(ob);
    start = end;
  }

  npy_intp n = (npy_intp)starts.size();
  PyObject *out = PyTuple_New(5);
  const std::vector<int64_t> *vecs[5] = {&starts, &ends, &ub_v, &vb_v, &ob_v};
  for (int i = 0; i < 5; i++) {
    PyArrayObject *a = (PyArrayObject *)PyArray_SimpleNew(1, &n, NPY_INT64);
    memcpy(PyArray_DATA(a), vecs[i]->data(), n * sizeof(int64_t));
    PyTuple_SET_ITEM(out, i, (PyObject *)a);
  }
  return out;
}

// sort_unique_inverse(x int64[K]) -> (unique_sorted, inverse)
// std::sort-based unique with inverse mapping; ~5-8x faster than
// np.unique(return_inverse=True) on multi-million-element arrays.
static PyObject *sort_unique_inverse(PyObject *self, PyObject *args) {
  PyArrayObject *x_arr;
  if (!PyArg_ParseTuple(args, "O!", &PyArray_Type, &x_arr)) return nullptr;
  if (PyArray_TYPE(x_arr) != NPY_INT64) {
    PyErr_SetString(PyExc_TypeError, "expected int64 array");
    return nullptr;
  }
  npy_intp K = PyArray_DIM(x_arr, 0);
  const int64_t *x = (const int64_t *)PyArray_DATA(x_arr);

  std::vector<int64_t> order(K);
  for (npy_intp i = 0; i < K; i++) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int64_t a, int64_t b) { return x[a] < x[b]; });

  PyArrayObject *inv_arr =
      (PyArrayObject *)PyArray_SimpleNew(1, &K, NPY_INT64);
  int64_t *inv = (int64_t *)PyArray_DATA(inv_arr);
  std::vector<int64_t> uniq;
  uniq.reserve(K);
  int64_t rank = -1;
  int64_t prev = 0;
  for (npy_intp i = 0; i < K; i++) {
    int64_t idx = order[i];
    if (rank < 0 || x[idx] != prev) {
      ++rank;
      prev = x[idx];
      uniq.push_back(prev);
    }
    inv[idx] = rank;
  }
  npy_intp U = (npy_intp)uniq.size();
  PyArrayObject *u_arr = (PyArrayObject *)PyArray_SimpleNew(1, &U, NPY_INT64);
  memcpy(PyArray_DATA(u_arr), uniq.data(), U * sizeof(int64_t));
  PyObject *out = PyTuple_New(2);
  PyTuple_SET_ITEM(out, 0, (PyObject *)u_arr);
  PyTuple_SET_ITEM(out, 1, (PyObject *)inv_arr);
  return out;
}

static PyMethodDef Methods[] = {
    {"sort_unique_inverse", sort_unique_inverse, METH_VARARGS,
     "sorted unique values + inverse ranks for int64 arrays"},
    {"chunk_bounds", chunk_bounds, METH_VARARGS,
     "greedy chunk boundary walk for the fused kernel planner (aligned)"},
    {"chunk_bounds_dyn", chunk_bounds_dyn, METH_VARARGS,
     "greedy chunk boundary walk with dynamic operand windows"},
    {"chunk_bounds_dyn2", chunk_bounds_dyn2, METH_VARARGS,
     "dynamic-window chunk walk with independent u / v window sizes"},
    {"spspmm_join", spspmm_join, METH_VARARGS,
     "expand sorted interval matches into (c, d) pair arrays"},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_hostops",
                                       nullptr, -1, Methods};

PyMODINIT_FUNC PyInit__hostops(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
