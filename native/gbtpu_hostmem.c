/* gbtpu _hostmem: numpy data allocator with transparent-huge-page backing.
 *
 * This VM's kernel faults anonymous 4 KB pages at ~0.25-0.4 GB/s, which
 * makes every large fresh numpy allocation (route-plan builders, host
 * staging buffers) fault-bound.  mmap + madvise(MADV_HUGEPAGE) first-
 * touches at ~1.8 GB/s (measured, experiments/): a ~6x host-side win.
 *
 * Installs a PyDataMem_Handler that routes allocations >= 2 MB through
 * mmap with MADV_HUGEPAGE; smaller blocks stay on malloc.  Every block
 * carries a 64-byte header (magic + total size) so free/realloc know
 * the origin and extent.  numpy stores the handler per-array, so arrays
 * allocated before installation are freed by their original handler.
 *
 * Reference analog: the reference's global malloc/calloc/free function
 * table (Source/GB_Global.c:83-180, GxB_init) — the same "own the
 * allocator" hook, pointed at the page-fault path that matters on this
 * host instead of at user-supplied wrappers.
 */
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#define NPY_TARGET_VERSION NPY_1_22_API_VERSION
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <numpy/arrayobject.h>
#include <stdint.h>
#include <string.h>
#include <sys/mman.h>

#define HDR 64
#define THRESH ((size_t)2 << 20)
#define MAGIC_MMAP 0x6762686d6d617031ULL
#define MAGIC_MALLOC 0x6762686d616c6c31ULL

typedef struct {
  uint64_t magic;
  uint64_t total;
} hdr_t;

static void *hm_alloc_raw(size_t size, int zeroed) {
  size_t total = size + HDR;
  hdr_t *h;
  if (total >= THRESH) {
    void *p = mmap(NULL, total, PROT_READ | PROT_WRITE,
                   MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
    if (p == MAP_FAILED) return NULL;
    (void)madvise(p, total, MADV_HUGEPAGE);
    h = (hdr_t *)p; /* mmap memory is already zeroed */
    h->magic = MAGIC_MMAP;
  } else {
    void *p = zeroed ? calloc(1, total) : malloc(total);
    if (p == NULL) return NULL;
    h = (hdr_t *)p;
    h->magic = MAGIC_MALLOC;
  }
  h->total = (uint64_t)total;
  return (char *)h + HDR;
}

static void hm_free_raw(void *ptr) {
  if (ptr == NULL) return;
  hdr_t *h = (hdr_t *)((char *)ptr - HDR);
  if (h->magic == MAGIC_MMAP) {
    munmap((void *)h, (size_t)h->total);
  } else {
    free((void *)h);
  }
}

static void *hm_alloc(void *ctx, size_t size) {
  (void)ctx;
  return hm_alloc_raw(size, 0);
}

static void *hm_zeroed(void *ctx, size_t nelem, size_t elsize) {
  (void)ctx;
  return hm_alloc_raw(nelem * elsize, 1);
}

static void hm_free(void *ctx, void *ptr, size_t size) {
  (void)ctx;
  (void)size;
  hm_free_raw(ptr);
}

static void *hm_realloc(void *ctx, void *ptr, size_t new_size) {
  (void)ctx;
  if (ptr == NULL) return hm_alloc_raw(new_size, 0);
  hdr_t *h = (hdr_t *)((char *)ptr - HDR);
  size_t old = (size_t)h->total - HDR;
  void *np_ = hm_alloc_raw(new_size, 0);
  if (np_ == NULL) return NULL;
  memcpy(np_, ptr, old < new_size ? old : new_size);
  hm_free_raw(ptr);
  return np_;
}

static PyDataMem_Handler hm_handler = {
    "gbtpu_hugepage_allocator",
    1,
    {
        NULL,       /* ctx */
        hm_alloc,   /* malloc */
        hm_zeroed,  /* calloc */
        hm_realloc, /* realloc */
        hm_free,    /* free */
    },
};

static PyObject *old_handler_capsule = NULL;

static PyObject *py_install(PyObject *self, PyObject *args) {
  (void)self;
  (void)args;
  PyObject *cap =
      PyCapsule_New(&hm_handler, "mem_handler", NULL);
  if (cap == NULL) return NULL;
  PyObject *old = PyDataMem_SetHandler(cap);
  Py_DECREF(cap);
  if (old == NULL) return NULL;
  Py_XDECREF(old_handler_capsule);
  old_handler_capsule = old;
  Py_RETURN_NONE;
}

static PyObject *py_uninstall(PyObject *self, PyObject *args) {
  (void)self;
  (void)args;
  if (old_handler_capsule != NULL) {
    PyObject *r = PyDataMem_SetHandler(old_handler_capsule);
    Py_XDECREF(r);
    Py_CLEAR(old_handler_capsule);
  }
  Py_RETURN_NONE;
}

static PyMethodDef methods[] = {
    {"install", py_install, METH_NOARGS,
     "Install the huge-page numpy data allocator."},
    {"uninstall", py_uninstall, METH_NOARGS,
     "Restore the previous numpy data allocator."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_hostmem", NULL, -1, methods,
    NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC PyInit__hostmem(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
