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

/* Demo-matrix loader: 0-based triplet text from the reference's own
 * graphs (/root/reference/Demo/Matrix/*, e.g. west0067, bcsstk01).
 * BASELINE.json asks for bit-for-bit parity "across its Demo matrices";
 * fp values are replaced by the deterministic int rule
 * v = (i*31 + j*17) %% 9 + 1 so int64 comparisons stay exact (mirrored
 * in tests/test_vs_reference.py). */
static GrB_Matrix load_demo_int64(const char *path) {
  FILE *f = fopen(path, "r");
  if (!f) { perror(path); exit(1); }
  long long i, j;
  double v;
  int64_t cap = 1 << 16, cnt = 0, dim = 0;
  GrB_Index *ri = malloc(cap * sizeof(GrB_Index));
  GrB_Index *ci = malloc(cap * sizeof(GrB_Index));
  int64_t *vi = malloc(cap * sizeof(int64_t));
  while (fscanf(f, "%lld %lld %lf", &i, &j, &v) == 3) {
    ri[cnt] = (GrB_Index)i;
    ci[cnt] = (GrB_Index)j;
    vi[cnt] = (i * 31 + j * 17) % 9 + 1;
    if (i + 1 > dim) dim = i + 1;
    if (j + 1 > dim) dim = j + 1;
    if (++cnt == cap) { /* demo graphs are small */ }
  }
  fclose(f);
  GrB_Matrix A;
  OK(GrB_Matrix_new(&A, GrB_INT64, dim, dim));
  OK(GrB_Matrix_build_INT64(A, ri, ci, vi, cnt, GrB_PLUS_INT64));
  free(ri); free(ci); free(vi);
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

  /* ---- round-5 widening: accum x mask(comp,structure) x replace x
   * descriptor transposes + assign/subassign + vectors + the reference's
   * own Demo graphs (VERDICT r4 missing #1/#2) ------------------------ */

  GrB_Matrix C0 = build_int64(7, 97, 500, 9);          /* accum target */
  dump(dir, "in_C0", C0, 0);
  GrB_Matrix M2;                                        /* valued mask */
  {
    OK(GrB_Matrix_new(&M2, GrB_INT64, n97, n97));
    GrB_Matrix Mr = build_int64(8, 97, 900, 2);         /* vals 1..2  */
    OK(GrB_Matrix_apply_BinaryOp2nd_INT64(M2, NULL, NULL, GrB_MINUS_INT64,
                                          Mr, 1, NULL));
    GrB_Matrix_free(&Mr);
    dump(dir, "in_M2", M2, 0);                          /* has real 0s */
  }
  GrB_Descriptor d_comp, d_repl, d_comp_repl, d_t0, d_t1, d_t01, d_struct;
  GrB_Descriptor_new(&d_comp);
  GrB_Descriptor_set(d_comp, GrB_MASK, GrB_COMP);
  GrB_Descriptor_new(&d_repl);
  GrB_Descriptor_set(d_repl, GrB_OUTP, GrB_REPLACE);
  GrB_Descriptor_new(&d_comp_repl);
  GrB_Descriptor_set(d_comp_repl, GrB_MASK, GrB_COMP);
  GrB_Descriptor_set(d_comp_repl, GrB_OUTP, GrB_REPLACE);
  GrB_Descriptor_new(&d_t0);
  GrB_Descriptor_set(d_t0, GrB_INP0, GrB_TRAN);
  GrB_Descriptor_new(&d_t1);
  GrB_Descriptor_set(d_t1, GrB_INP1, GrB_TRAN);
  GrB_Descriptor_new(&d_t01);
  GrB_Descriptor_set(d_t01, GrB_INP0, GrB_TRAN);
  GrB_Descriptor_set(d_t01, GrB_INP1, GrB_TRAN);
  GrB_Descriptor_new(&d_struct);
  GrB_Descriptor_set(d_struct, GrB_MASK, GrB_STRUCTURE);

  /* 13: accum, no mask */
  OK(GrB_Matrix_dup(&C, C0));
  OK(GrB_mxm(C, NULL, GrB_PLUS_INT64, GrB_PLUS_TIMES_SEMIRING_INT64, A, B,
             NULL));
  dump(dir, "mxm_accum", C, 0);
  GrB_Matrix_free(&C);

  /* 14: complemented structural mask */
  OK(GrB_Matrix_new(&C, GrB_INT64, n97, n97));
  {
    GrB_Descriptor dcs;
    GrB_Descriptor_new(&dcs);
    GrB_Descriptor_set(dcs, GrB_MASK, GrB_COMP);
    GrB_Descriptor_set(dcs, GrB_MASK, GrB_STRUCTURE);
    OK(GrB_mxm(C, A, NULL, GrB_PLUS_TIMES_SEMIRING_INT64, A, B, dcs));
    GrB_Descriptor_free(&dcs);
    dump(dir, "mxm_mask_comp", C, 0);
  }
  GrB_Matrix_free(&C);

  /* 15: valued mask + accum + replace */
  OK(GrB_Matrix_dup(&C, C0));
  {
    GrB_Descriptor dr;
    GrB_Descriptor_new(&dr);
    GrB_Descriptor_set(dr, GrB_OUTP, GrB_REPLACE);
    OK(GrB_mxm(C, M2, GrB_PLUS_INT64, GrB_PLUS_TIMES_SEMIRING_INT64, A, B,
               dr));
    GrB_Descriptor_free(&dr);
    dump(dir, "mxm_mask_accum_replace", C, 0);
  }
  GrB_Matrix_free(&C);

  /* 16: valued mask, no accum */
  OK(GrB_Matrix_new(&C, GrB_INT64, n97, n97));
  OK(GrB_mxm(C, M2, NULL, GrB_PLUS_TIMES_SEMIRING_INT64, A, B, NULL));
  dump(dir, "mxm_mask_valued", C, 0);
  GrB_Matrix_free(&C);

  /* 17-19: descriptor transposes */
  OK(GrB_Matrix_new(&C, GrB_INT64, n97, n97));
  OK(GrB_mxm(C, NULL, NULL, GrB_PLUS_TIMES_SEMIRING_INT64, A, B, d_t0));
  dump(dir, "mxm_at_b", C, 0);
  GrB_Matrix_free(&C);
  OK(GrB_Matrix_new(&C, GrB_INT64, n97, n97));
  OK(GrB_mxm(C, NULL, NULL, GrB_PLUS_TIMES_SEMIRING_INT64, A, B, d_t1));
  dump(dir, "mxm_a_bt", C, 0);
  GrB_Matrix_free(&C);
  OK(GrB_Matrix_new(&C, GrB_INT64, n97, n97));
  OK(GrB_mxm(C, NULL, NULL, GrB_PLUS_TIMES_SEMIRING_INT64, A, B, d_t01));
  dump(dir, "mxm_at_bt", C, 0);
  GrB_Matrix_free(&C);

  /* vectors: u (97), w0 (97) */
  GrB_Vector u, w;
  {
    OK(GrB_Vector_new(&u, GrB_INT64, n97));
    lcg_state = 9;
    for (int k = 0; k < 60; ++k) {
      /* sequence the two draws explicitly: C argument evaluation order
       * is unspecified and the python mirror assumes value-then-index */
      int64_t vv_ = (int64_t)(lcg() % 9) + 1;
      GrB_Index ii_ = (GrB_Index)(lcg() % 97);
      OK(GrB_Vector_setElement_INT64(u, vv_, ii_));
    }
    OK(GrB_Vector_wait(u, GrB_MATERIALIZE));
  }
  /* dump u as a 97x1 matrix fixture */
  {
    GrB_Index unv;
    OK(GrB_Vector_nvals(&unv, u));
    GrB_Index *ui = malloc(unv * sizeof(GrB_Index));
    int64_t *uv = malloc(unv * sizeof(int64_t));
    GrB_Index unv2 = unv;
    OK(GrB_Vector_extractTuples_INT64(ui, uv, &unv2, u));
    OK(GrB_Matrix_new(&C, GrB_INT64, n97, 1));
    for (GrB_Index k = 0; k < unv; ++k)
      OK(GrB_Matrix_setElement_INT64(C, uv[k], ui[k], 0));
    dump(dir, "in_u", C, 0);
    GrB_Matrix_free(&C);
    free(ui); free(uv);
  }

  /* 20: w = A*u ; 21: w = A*u masked by u complement, accum */
  OK(GrB_Vector_new(&w, GrB_INT64, n97));
  OK(GrB_mxv(w, NULL, NULL, GrB_PLUS_TIMES_SEMIRING_INT64, A, u, NULL));
  {
    GrB_Index wnv;
    OK(GrB_Vector_nvals(&wnv, w));
    GrB_Index *wi = malloc(wnv * sizeof(GrB_Index));
    int64_t *wv = malloc(wnv * sizeof(int64_t));
    GrB_Index wnv2 = wnv;
    OK(GrB_Vector_extractTuples_INT64(wi, wv, &wnv2, w));
    OK(GrB_Matrix_new(&C, GrB_INT64, n97, 1));
    for (GrB_Index k = 0; k < wnv; ++k)
      OK(GrB_Matrix_setElement_INT64(C, wv[k], wi[k], 0));
    dump(dir, "mxv_plus_times", C, 0);
    GrB_Matrix_free(&C);
    free(wi); free(wv);
  }
  OK(GrB_mxv(w, u, GrB_PLUS_INT64, GrB_MIN_PLUS_SEMIRING_INT64, A, u,
             d_comp));
  {
    GrB_Index wnv;
    OK(GrB_Vector_nvals(&wnv, w));
    GrB_Index *wi = malloc(wnv * sizeof(GrB_Index));
    int64_t *wv = malloc(wnv * sizeof(int64_t));
    GrB_Index wnv2 = wnv;
    OK(GrB_Vector_extractTuples_INT64(wi, wv, &wnv2, w));
    OK(GrB_Matrix_new(&C, GrB_INT64, n97, 1));
    for (GrB_Index k = 0; k < wnv; ++k)
      OK(GrB_Matrix_setElement_INT64(C, wv[k], wi[k], 0));
    dump(dir, "mxv_minplus_comp_accum", C, 0);
    GrB_Matrix_free(&C);
    free(wi); free(wv);
  }
  GrB_Vector_free(&w);

  /* 22: eWiseAdd complement-mask + replace over C0 */
  OK(GrB_Matrix_dup(&C, C0));
  OK(GrB_Matrix_eWiseAdd_BinaryOp(C, M2, NULL, GrB_PLUS_INT64, A, B,
                                  d_comp_repl));
  dump(dir, "ewiseadd_comp_replace", C, 0);
  GrB_Matrix_free(&C);

  /* 23: eWiseAdd accum */
  OK(GrB_Matrix_dup(&C, C0));
  OK(GrB_Matrix_eWiseAdd_BinaryOp(C, NULL, GrB_MAX_INT64, GrB_PLUS_INT64,
                                  A, B, NULL));
  dump(dir, "ewiseadd_accum_max", C, 0);
  GrB_Matrix_free(&C);

  /* 24: eWiseMult valued-masked */
  OK(GrB_Matrix_new(&C, GrB_INT64, n97, n97));
  OK(GrB_Matrix_eWiseMult_BinaryOp(C, M2, NULL, GrB_MIN_INT64, A, B,
                                   NULL));
  dump(dir, "ewisemult_masked_min", C, 0);
  GrB_Matrix_free(&C);

  /* 25: eWiseAdd bool lor */
  OK(GrB_Matrix_new(&C, GrB_BOOL, n128, n128));
  OK(GrB_Matrix_eWiseAdd_BinaryOp(C, NULL, NULL, GrB_LOR, Ab, Bb, NULL));
  dump(dir, "ewiseadd_lor", C, 1);
  GrB_Matrix_free(&C);

  /* 26: assign with accum: C0(50:96, 50:96) += A(0:46, 0:46) */
  {
    GrB_Index ni = 47;
    GrB_Index II[47], JJ[47];
    for (GrB_Index k = 0; k < ni; ++k) { II[k] = k; JJ[k] = k; }
    GrB_Matrix Asub;
    OK(GrB_Matrix_new(&Asub, GrB_INT64, ni, ni));
    OK(GrB_Matrix_extract(Asub, NULL, NULL, A, II, ni, JJ, ni, NULL));
    GrB_Index I2[47];
    for (GrB_Index k = 0; k < ni; ++k) I2[k] = 50 + k;
    OK(GrB_Matrix_dup(&C, C0));
    OK(GrB_Matrix_assign(C, NULL, GrB_PLUS_INT64, Asub, I2, ni, I2, ni,
                         NULL));
    dump(dir, "assign_accum", C, 0);
    GrB_Matrix_free(&C);
    GrB_Matrix_free(&Asub);
  }

  /* 27: masked assign, replace: C<M2,repl>(:,:) = B */
  OK(GrB_Matrix_dup(&C, C0));
  OK(GrB_Matrix_assign(C, M2, NULL, B, GrB_ALL, n97, GrB_ALL, n97,
                       d_repl));
  dump(dir, "assign_mask_replace", C, 0);
  GrB_Matrix_free(&C);

  /* 28: scalar assign under structural mask (the 05d class) */
  OK(GrB_Matrix_dup(&C, C0));
  OK(GrB_Matrix_assign_INT64(C, A, NULL, 7, GrB_ALL, n97, GrB_ALL, n97,
                             d_struct));
  dump(dir, "assign_scalar_mask", C, 0);
  GrB_Matrix_free(&C);

  /* 29: extract with backwards row list + odd column list */
  {
    GrB_Index II[97], JJ[49];
    for (int k = 0; k < 97; ++k) II[k] = 96 - k;
    for (int k = 0; k < 49; ++k) JJ[k] = 2 * k + 1 > 96 ? 96 : 2 * k + 1;
    OK(GrB_Matrix_new(&C, GrB_INT64, 97, 49));
    OK(GrB_Matrix_extract(C, NULL, NULL, A, II, 97, JJ, 49, NULL));
    dump(dir, "extract_backwards", C, 0);
    GrB_Matrix_free(&C);
  }

  /* 30: apply bind2nd with INP0 transpose */
  OK(GrB_Matrix_new(&C, GrB_INT64, n97, n97));
  OK(GrB_Matrix_apply_BinaryOp2nd_INT64(C, NULL, NULL, GrB_MINUS_INT64, A,
                                        3, d_t0));
  dump(dir, "apply_bind_tran", C, 0);
  GrB_Matrix_free(&C);

  /* 31: select VALUEGT masked */
  OK(GrB_Matrix_new(&C, GrB_INT64, n97, n97));
  OK(GrB_Matrix_select_INT64(C, M2, NULL, GrB_VALUEGT_INT64, A, 5, NULL));
  dump(dir, "select_valuegt_masked", C, 0);
  GrB_Matrix_free(&C);

  /* 32-33: reduce to vector, rows and cols */
  OK(GrB_Vector_new(&w, GrB_INT64, n97));
  OK(GrB_Matrix_reduce_Monoid(w, NULL, NULL, GrB_PLUS_MONOID_INT64, A,
                              NULL));
  {
    GrB_Index wnv;
    OK(GrB_Vector_nvals(&wnv, w));
    GrB_Index *wi = malloc(wnv * sizeof(GrB_Index));
    int64_t *wv = malloc(wnv * sizeof(int64_t));
    GrB_Index wnv2 = wnv;
    OK(GrB_Vector_extractTuples_INT64(wi, wv, &wnv2, w));
    OK(GrB_Matrix_new(&C, GrB_INT64, n97, 1));
    for (GrB_Index k = 0; k < wnv; ++k)
      OK(GrB_Matrix_setElement_INT64(C, wv[k], wi[k], 0));
    dump(dir, "reduce_rows", C, 0);
    GrB_Matrix_free(&C);
    free(wi); free(wv);
  }
  OK(GrB_Matrix_reduce_Monoid(w, NULL, NULL, GrB_PLUS_MONOID_INT64, A,
                              d_t0));
  {
    GrB_Index wnv;
    OK(GrB_Vector_nvals(&wnv, w));
    GrB_Index *wi = malloc(wnv * sizeof(GrB_Index));
    int64_t *wv = malloc(wnv * sizeof(int64_t));
    GrB_Index wnv2 = wnv;
    OK(GrB_Vector_extractTuples_INT64(wi, wv, &wnv2, w));
    OK(GrB_Matrix_new(&C, GrB_INT64, n97, 1));
    for (GrB_Index k = 0; k < wnv; ++k)
      OK(GrB_Matrix_setElement_INT64(C, wv[k], wi[k], 0));
    dump(dir, "reduce_cols", C, 0);
    GrB_Matrix_free(&C);
    free(wi); free(wv);
  }
  GrB_Vector_free(&w);

  /* 34: concat [A B; B A] */
  {
    GrB_Matrix tiles[4] = {A, B, B, A};
    OK(GrB_Matrix_new(&C, GrB_INT64, 2 * n97, 2 * n97));
    OK(GxB_Matrix_concat(C, tiles, 2, 2, NULL));
    dump(dir, "concat_2x2", C, 0);
    GrB_Matrix_free(&C);
  }

  /* 35: diag from u at k=-1 */
  {
    OK(GrB_Matrix_new(&C, GrB_INT64, n97 + 1, n97 + 1));
    OK(GrB_Matrix_diag(&C, u, -1));
    dump(dir, "diag_km1", C, 0);
    GrB_Matrix_free(&C);
  }

  /* ---- the reference's own Demo graphs --------------------------------*/
  {
    GrB_Matrix W = load_demo_int64("/root/reference/Demo/Matrix/west0067");
    dump(dir, "in_west", W, 0);
    GrB_Index wn;
    OK(GrB_Matrix_nrows(&wn, W));
    /* 36: C = W*W plus_times */
    OK(GrB_Matrix_new(&C, GrB_INT64, wn, wn));
    OK(GrB_mxm(C, NULL, NULL, GrB_PLUS_TIMES_SEMIRING_INT64, W, W, NULL));
    dump(dir, "west_mxm", C, 0);
    GrB_Matrix_free(&C);
    /* 37: triangle-count style masked C<L> = L*L' plus_pair + total */
    GrB_Matrix L;
    OK(GrB_Matrix_new(&L, GrB_INT64, wn, wn));
    OK(GrB_Matrix_select_INT64(L, NULL, NULL, GrB_TRIL, W, -1, NULL));
    OK(GrB_Matrix_new(&C, GrB_INT64, wn, wn));
    {
      GrB_Descriptor ds2;
      GrB_Descriptor_new(&ds2);
      GrB_Descriptor_set(ds2, GrB_MASK, GrB_STRUCTURE);
      GrB_Descriptor_set(ds2, GrB_INP1, GrB_TRAN);
      OK(GrB_mxm(C, L, NULL, GxB_PLUS_PAIR_INT64, L, L, ds2));
      GrB_Descriptor_free(&ds2);
    }
    dump(dir, "west_tc", C, 0);
    GrB_Matrix_free(&C);
    GrB_Matrix_free(&L);
    /* 38: W min_plus W */
    OK(GrB_Matrix_new(&C, GrB_INT64, wn, wn));
    OK(GrB_mxm(C, NULL, NULL, GrB_MIN_PLUS_SEMIRING_INT64, W, W, NULL));
    dump(dir, "west_min_plus", C, 0);
    GrB_Matrix_free(&C);
    GrB_Matrix_free(&W);
  }
  {
    GrB_Matrix K = load_demo_int64("/root/reference/Demo/Matrix/bcsstk01");
    dump(dir, "in_bcs", K, 0);
    GrB_Index kn;
    OK(GrB_Matrix_nrows(&kn, K));
    /* 39: C = K*K' plus_times */
    OK(GrB_Matrix_new(&C, GrB_INT64, kn, kn));
    OK(GrB_mxm(C, NULL, NULL, GrB_PLUS_TIMES_SEMIRING_INT64, K, K, d_t1));
    dump(dir, "bcs_mxm_bt", C, 0);
    GrB_Matrix_free(&C);
    /* 40: masked eWiseAdd on K */
    OK(GrB_Matrix_new(&C, GrB_INT64, kn, kn));
    OK(GrB_Matrix_eWiseAdd_BinaryOp(C, K, NULL, GrB_PLUS_INT64, K, K,
                                    d_struct));
    dump(dir, "bcs_ewiseadd_masked", C, 0);
    GrB_Matrix_free(&C);
    GrB_Matrix_free(&K);
  }

  GrB_Vector_free(&u);
  GrB_Matrix_free(&M2);
  GrB_Matrix_free(&C0);
  GrB_Descriptor_free(&d_comp);
  GrB_Descriptor_free(&d_repl);
  GrB_Descriptor_free(&d_comp_repl);
  GrB_Descriptor_free(&d_t0);
  GrB_Descriptor_free(&d_t1);
  GrB_Descriptor_free(&d_t01);
  GrB_Descriptor_free(&d_struct);

  GrB_Matrix_free(&A);
  GrB_Matrix_free(&B);
  GrB_Matrix_free(&Ab);
  GrB_Matrix_free(&Bb);
  GrB_finalize();
  return 0;
}
