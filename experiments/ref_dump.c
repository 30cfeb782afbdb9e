/* Differential-test fixture dumper (round-4 ask #8; reference's own
 * method: Test/GB_spec_compare.m).  Generates deterministic matrices via
 * a shared LCG (mirrored in tests/test_vs_reference.py), runs a battery
 * of integer/boolean ops through the compiled SuiteSparse:GraphBLAS, and
 * dumps result tuples for bit-for-bit comparison.
 *
 * Output format per op (binary, little-endian):
 *   [int64 nrows][int64 ncols][int64 nvals]
 *   [int64 rows[nvals]][int64 cols[nvals]][int64 vals[nvals]]
 * Tuples are sorted row-major.  Build:
 *   gcc -O2 experiments/ref_dump.c -I/root/reference/Include \
 *       -L/tmp/refbuild -lgraphblas -o /tmp/ref_dump
 * Run:  LD_LIBRARY_PATH=/tmp/refbuild /tmp/ref_dump <outdir>
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "GraphBLAS.h"

#define OK(expr)                                                         \
  do {                                                                   \
    GrB_Info info_ = (expr);                                             \
    if (info_ != GrB_SUCCESS && info_ != GrB_NO_VALUE) {                 \
      fprintf(stderr, "GrB error %d at line %d\n", info_, __LINE__);     \
      exit(1);                                                           \
    }                                                                    \
  } while (0)

static uint64_t lcg_state;
static uint64_t lcg(void) {
  lcg_state = lcg_state * 6364136223846793005ULL + 1442695040888963407ULL;
  return lcg_state >> 33;
}

/* deterministic COO: nnz draws of (i, j, v) with v in [1, vmax] */
static void gen_coo(uint64_t seed, int64_t n, int64_t nnz, int64_t vmax,
                    GrB_Index **ri, GrB_Index **ci, int64_t **vi) {
  lcg_state = seed;
  *ri = malloc(nnz * sizeof(GrB_Index));
  *ci = malloc(nnz * sizeof(GrB_Index));
  *vi = malloc(nnz * sizeof(int64_t));
  for (int64_t k = 0; k < nnz; ++k) {
    (*ri)[k] = (GrB_Index)(lcg() % n);
    (*ci)[k] = (GrB_Index)(lcg() % n);
    (*vi)[k] = (int64_t)(lcg() % vmax) + 1;
  }
}

static GrB_Matrix build_int64(uint64_t seed, int64_t n, int64_t nnz,
                              int64_t vmax) {
  GrB_Index *ri, *ci;
  int64_t *vi;
  gen_coo(seed, n, nnz, vmax, &ri, &ci, &vi);
  GrB_Matrix A;
  OK(GrB_Matrix_new(&A, GrB_INT64, n, n));
  OK(GrB_Matrix_build_INT64(A, ri, ci, vi, nnz, GrB_PLUS_INT64));
  free(ri); free(ci); free(vi);
  return A;
}

static GrB_Matrix build_bool(uint64_t seed, int64_t n, int64_t nnz) {
  GrB_Index *ri, *ci;
  int64_t *vi;
  gen_coo(seed, n, nnz, 2, &ri, &ci, &vi);
  bool *vb = malloc(nnz * sizeof(bool));
  for (int64_t k = 0; k < nnz; ++k) vb[k] = (vi[k] == 2);
  GrB_Matrix A;
  OK(GrB_Matrix_new(&A, GrB_BOOL, n, n));
  OK(GrB_Matrix_build_BOOL(A, ri, ci, vb, nnz, GrB_LOR));
  free(ri); free(ci); free(vi); free(vb);
  return A;
}

static void dump(const char *dir, const char *name, GrB_Matrix C,
                 int is_bool) {
  GrB_Index nr, nc, nv;
  OK(GrB_Matrix_nrows(&nr, C));
  OK(GrB_Matrix_ncols(&nc, C));
  OK(GrB_Matrix_wait(C, GrB_MATERIALIZE));
  OK(GrB_Matrix_nvals(&nv, C));
  GrB_Index *ri = malloc((nv + 1) * sizeof(GrB_Index));
  GrB_Index *ci = malloc((nv + 1) * sizeof(GrB_Index));
  int64_t *vi = malloc((nv + 1) * sizeof(int64_t));
  GrB_Index nv2 = nv;
  if (is_bool) {
    bool *vb = malloc((nv + 1) * sizeof(bool));
    OK(GrB_Matrix_extractTuples_BOOL(ri, ci, vb, &nv2, C));
    for (GrB_Index k = 0; k < nv; ++k) vi[k] = vb[k] ? 1 : 0;
    free(vb);
  } else {
    OK(GrB_Matrix_extractTuples_INT64(ri, ci, vi, &nv2, C));
  }
  /* sort row-major (extractTuples is unordered by spec; CSR comes out
   * sorted in practice, but sort anyway for a stable fixture) */
  /* simple index sort via qsort on packed keys */
  int64_t *keys = malloc(nv * sizeof(int64_t));
  GrB_Index *ord = malloc(nv * sizeof(GrB_Index));
  for (GrB_Index k = 0; k < nv; ++k) {
    keys[k] = (int64_t)ri[k] * (int64_t)nc + (int64_t)ci[k];
    ord[k] = k;
  }
  /* insertion-free: qsort with global pointer */
  {
    int cmp(const void *a, const void *b) {
      int64_t ka = keys[*(const GrB_Index *)a];
      int64_t kb = keys[*(const GrB_Index *)b];
      return ka < kb ? -1 : ka > kb ? 1 : 0;
    }
    qsort(ord, nv, sizeof(GrB_Index), cmp);
  }
  char path[512];
  snprintf(path, sizeof path, "%s/%s.bin", dir, name);
  FILE *f = fopen(path, "wb");
  int64_t hdr[3] = {(int64_t)nr, (int64_t)nc, (int64_t)nv};
  fwrite(hdr, 8, 3, f);
  for (GrB_Index k = 0; k < nv; ++k) {
    int64_t v = (int64_t)ri[ord[k]];
    fwrite(&v, 8, 1, f);
  }
  for (GrB_Index k = 0; k < nv; ++k) {
    int64_t v = (int64_t)ci[ord[k]];
    fwrite(&v, 8, 1, f);
  }
  for (GrB_Index k = 0; k < nv; ++k) fwrite(&vi[ord[k]], 8, 1, f);
  fclose(f);
  printf("%s: %lld x %lld, %lld vals\n", name, (long long)nr,
         (long long)nc, (long long)nv);
  free(ri); free(ci); free(vi); free(keys); free(ord);
}

int main(int argc, char **argv) {
  const char *dir = argc > 1 ? argv[1] : "/tmp/ref_fixtures";
  OK(GrB_init(GrB_NONBLOCKING));

  /* the three demo-class inputs (seeds shared with the python side) */
  GrB_Matrix A = build_int64(1, 97, 800, 9);
  GrB_Matrix B = build_int64(2, 97, 700, 9);
  GrB_Matrix Ab = build_bool(3, 128, 2000);
  GrB_Matrix Bb = build_bool(4, 128, 1800);
  dump(dir, "in_A", A, 0);
  dump(dir, "in_B", B, 0);
  dump(dir, "in_Ab", Ab, 1);
  dump(dir, "in_Bb", Bb, 1);

  GrB_Matrix C;
  GrB_Index n97 = 97, n128 = 128;

  /* 1: C = A*B (plus_times int64) */
  OK(GrB_Matrix_new(&C, GrB_INT64, n97, n97));
  OK(GrB_mxm(C, NULL, NULL, GrB_PLUS_TIMES_SEMIRING_INT64, A, B, NULL));
  dump(dir, "mxm_plus_times", C, 0);
  GrB_Matrix_free(&C);

  /* 2: C<A> = A*B (masked, structure) */
  OK(GrB_Matrix_new(&C, GrB_INT64, n97, n97));
  {
    GrB_Descriptor d;
    GrB_Descriptor_new(&d);
    GrB_Descriptor_set(d, GrB_MASK, GrB_STRUCTURE);
    OK(GrB_mxm(C, A, NULL, GrB_PLUS_TIMES_SEMIRING_INT64, A, B, d));
    GrB_Descriptor_free(&d);
  }
  dump(dir, "mxm_masked", C, 0);
  GrB_Matrix_free(&C);

  /* 3: C = Ab*Bb (lor_land bool) */
  OK(GrB_Matrix_new(&C, GrB_BOOL, n128, n128));
  OK(GrB_mxm(C, NULL, NULL, GrB_LOR_LAND_SEMIRING_BOOL, Ab, Bb, NULL));
  dump(dir, "mxm_lor_land", C, 1);
  GrB_Matrix_free(&C);

  /* 4: C = min_plus(A, B) int64 */
  OK(GrB_Matrix_new(&C, GrB_INT64, n97, n97));
  OK(GrB_mxm(C, NULL, NULL, GrB_MIN_PLUS_SEMIRING_INT64, A, B, NULL));
  dump(dir, "mxm_min_plus", C, 0);
  GrB_Matrix_free(&C);

  /* 5: C = A + B (eWiseAdd plus) */
  OK(GrB_Matrix_new(&C, GrB_INT64, n97, n97));
  OK(GrB_Matrix_eWiseAdd_BinaryOp(C, NULL, NULL, GrB_PLUS_INT64, A, B,
                                  NULL));
  dump(dir, "ewiseadd_plus", C, 0);
  GrB_Matrix_free(&C);

  /* 6: C = A .* B (eWiseMult times) */
  OK(GrB_Matrix_new(&C, GrB_INT64, n97, n97));
  OK(GrB_Matrix_eWiseMult_BinaryOp(C, NULL, NULL, GrB_TIMES_INT64, A, B,
                                   NULL));
  dump(dir, "ewisemult_times", C, 0);
  GrB_Matrix_free(&C);

  /* 7: C = A' */
  OK(GrB_Matrix_new(&C, GrB_INT64, n97, n97));
  OK(GrB_transpose(C, NULL, NULL, A, NULL));
  dump(dir, "transpose", C, 0);
  GrB_Matrix_free(&C);

  /* 8: C = A(10:60, 20:80) */
  {
    GrB_Index ni = 51, nj = 61;
    GrB_Index II[51], JJ[61];   /* I is complex.h's _Complex_I macro */
    for (GrB_Index k = 0; k < ni; ++k) II[k] = 10 + k;
    for (GrB_Index k = 0; k < nj; ++k) JJ[k] = 20 + k;
    OK(GrB_Matrix_new(&C, GrB_INT64, ni, nj));
    OK(GrB_Matrix_extract(C, NULL, NULL, A, II, ni, JJ, nj, NULL));
    dump(dir, "extract_sub", C, 0);
    GrB_Matrix_free(&C);
  }

  /* 9: C = tril(A, -1) */
  OK(GrB_Matrix_new(&C, GrB_INT64, n97, n97));
  OK(GrB_Matrix_select_INT64(C, NULL, NULL, GrB_TRIL, A, -1, NULL));
  dump(dir, "select_tril", C, 0);
  GrB_Matrix_free(&C);

  /* 10: C = apply(ainv, A) */
  OK(GrB_Matrix_new(&C, GrB_INT64, n97, n97));
  OK(GrB_Matrix_apply(C, NULL, NULL, GrB_AINV_INT64, A, NULL));
  dump(dir, "apply_ainv", C, 0);
  GrB_Matrix_free(&C);

  /* 11: scalar = reduce_plus(A) — dumped as a 1x1 matrix */
  {
    int64_t s = 0;
    OK(GrB_Matrix_reduce_INT64(&s, NULL, GrB_PLUS_MONOID_INT64, A, NULL));
    OK(GrB_Matrix_new(&C, GrB_INT64, 1, 1));
    OK(GrB_Matrix_setElement_INT64(C, s, 0, 0));
    dump(dir, "reduce_plus", C, 0);
    GrB_Matrix_free(&C);
  }

  /* 12: C = kron(small, small) int64 */
  {
    GrB_Matrix K1 = build_int64(5, 12, 40, 5);
    GrB_Matrix K2 = build_int64(6, 11, 30, 5);
    OK(GrB_Matrix_new(&C, GrB_INT64, 12 * 11, 12 * 11));
    OK(GrB_Matrix_kronecker_BinaryOp(C, NULL, NULL, GrB_TIMES_INT64, K1,
                                     K2, NULL));
    dump(dir, "kron_times", C, 0);
    GrB_Matrix_free(&C);
    GrB_Matrix_free(&K1);
    GrB_Matrix_free(&K2);
  }

  GrB_Matrix_free(&A);
  GrB_Matrix_free(&B);
  GrB_Matrix_free(&Ab);
  GrB_Matrix_free(&Bb);
  GrB_finalize();
  return 0;
}
