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
#include <pthread.h>
#include <stdint.h>
#include <stdlib.h>
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

/* ---- warm-block pool -----------------------------------------------------
 * This host first-touches anonymous pages at 10-90 MB/s (slow fault path /
 * synchronous THP compaction) but streams warm memory at ~2.5 GB/s, so the
 * expensive resource is FAULTED pages, not address space.  Freed mmap blocks
 * are therefore cached (pages kept resident) in per-size-class free lists
 * and recycled; munmap happens only when the pool would exceed its cap
 * (GB_HUGEPOOL_CAP_MB, default 24576).  Sizes are rounded up to a class
 * (2 MB steps to 64 MB, then pow2/1.5*pow2) so recycling actually hits. */
#define NCLASS 64
#define SLOTS_PER_CLASS 8

static void *pool_slot[NCLASS][SLOTS_PER_CLASS];
static int pool_n[NCLASS];
static size_t pool_bytes = 0;
static size_t pool_cap = (size_t)24576 << 20;
static int pool_cap_read = 0;
static pthread_mutex_t pool_mu = PTHREAD_MUTEX_INITIALIZER;
static uint64_t st_hit = 0, st_miss = 0, st_evict_slots = 0, st_evict_cap = 0;

static size_t class_size(int c) {
  if (c < 32) return ((size_t)(c + 1)) << 21; /* 2MB..64MB in 2MB steps */
  /* above 64MB: alternating 2^k and 1.5*2^k */
  int k = 26 + (c - 32) / 2 + 1; /* 2^27 = 128MB first */
  return ((c - 32) & 1) ? (((size_t)3) << (k - 1)) : (((size_t)1) << k);
}

static int class_for(size_t total) {
  for (int c = 0; c < NCLASS; ++c)
    if (class_size(c) >= total) return c;
  return -1; /* gigantic: unpooled */
}

static void pool_cap_init(void) {
  if (!pool_cap_read) {
    const char *e = getenv("GB_HUGEPOOL_CAP_MB");
    if (e && e[0]) {
      long long mb = atoll(e);
      if (mb >= 0) pool_cap = (size_t)mb << 20;
    }
    pool_cap_read = 1;
  }
}

static void *hm_alloc_raw(size_t size, int zeroed) {
  size_t total = size + HDR;
  hdr_t *h;
  if (total >= THRESH) {
    int c = class_for(total);
    size_t msize = c >= 0 ? class_size(c) : total;
    void *p = NULL;
    if (c >= 0) {
      pthread_mutex_lock(&pool_mu);
      if (pool_n[c] > 0) {
        p = pool_slot[c][--pool_n[c]];
        pool_bytes -= msize;
        st_hit++;
      } else {
        st_miss++;
      }
      pthread_mutex_unlock(&pool_mu);
    }
    if (p != NULL) {
      if (zeroed) memset((char *)p + HDR, 0, size);
    } else {
      p = mmap(NULL, msize, PROT_READ | PROT_WRITE,
               MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
      if (p == MAP_FAILED) return NULL;
      (void)madvise(p, msize, MADV_HUGEPAGE);
      /* mmap memory is already zeroed */
    }
    h = (hdr_t *)p;
    h->magic = MAGIC_MMAP;
    h->total = (uint64_t)msize;
    return (char *)h + HDR;
  }
  void *p = zeroed ? calloc(1, total) : malloc(total);
  if (p == NULL) return NULL;
  h = (hdr_t *)p;
  h->magic = MAGIC_MALLOC;
  h->total = (uint64_t)total;
  return (char *)h + HDR;
}

static void hm_free_raw(void *ptr) {
  if (ptr == NULL) return;
  hdr_t *h = (hdr_t *)((char *)ptr - HDR);
  if (h->magic == MAGIC_MMAP) {
    size_t msize = (size_t)h->total;
    int c = class_for(msize);
    pool_cap_init();
    if (c >= 0 && class_size(c) == msize) {
      pthread_mutex_lock(&pool_mu);
      if (pool_n[c] < SLOTS_PER_CLASS && pool_bytes + msize <= pool_cap) {
        pool_slot[c][pool_n[c]++] = (void *)h;
        pool_bytes += msize;
        pthread_mutex_unlock(&pool_mu);
        return;
      }
      if (pool_n[c] >= SLOTS_PER_CLASS) st_evict_slots++; else st_evict_cap++;
      pthread_mutex_unlock(&pool_mu);
    }
    munmap((void *)h, msize);
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

static PyObject *py_stats(PyObject *self, PyObject *args) {
  (void)self;
  (void)args;
  return Py_BuildValue("{s:K,s:K,s:K,s:K,s:K}", "hit", (unsigned long long)st_hit,
                       "miss", (unsigned long long)st_miss,
                       "evict_slots", (unsigned long long)st_evict_slots,
                       "evict_cap", (unsigned long long)st_evict_cap,
                       "pool_bytes", (unsigned long long)pool_bytes);
}

static PyMethodDef methods[] = {
    {"install", py_install, METH_NOARGS,
     "Install the huge-page numpy data allocator."},
    {"stats", py_stats, METH_NOARGS,
     "Pool statistics: hits, misses, evictions, resident pooled bytes."},
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
