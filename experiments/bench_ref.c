/* Reference-baseline driver: runs the BASELINE.json workloads through the
 * compiled SuiteSparse:GraphBLAS (COMPACT build, runtime JIT on) on the
 * same synthetic graph bench.py uses, so vs_reference numbers come from
 * THIS machine (BASELINE.md: BFS/PR/TC have no repo-published numbers).
 *
 * Input: binary graph file  [int64 n][int64 nnz][int32 rows][int32 cols]
 * (values are all 1.0f, matching bench.py).  Output: JSON lines.
 */
#include <stdio.h>
#include <stdlib.h>
#include <time.h>
#include "GraphBLAS.h"

static double now(void) {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

#define OK(expr)                                                        \
  do {                                                                  \
    GrB_Info info_ = (expr);                                            \
    if (info_ != GrB_SUCCESS && info_ != GrB_NO_VALUE) {                \
      fprintf(stderr, "GraphBLAS error %d at line %d\n", info_,         \
              __LINE__);                                                \
      exit(1);                                                          \
    }                                                                   \
  } while (0)

int main(int argc, char **argv) {
  const char *path = argc > 1 ? argv[1] : "/tmp/bench_graph.bin";
  FILE *f = fopen(path, "rb");
  if (!f) { perror("graph file"); return 1; }
  int64_t n, nnz;
  if (fread(&n, 8, 1, f) != 1 || fread(&nnz, 8, 1, f) != 1) return 1;
  int32_t *ri = malloc(nnz * 4), *ci = malloc(nnz * 4);
  if (fread(ri, 4, nnz, f) != (size_t)nnz) return 1;
  if (fread(ci, 4, nnz, f) != (size_t)nnz) return 1;
  fclose(f);

  OK(GrB_init(GrB_NONBLOCKING));
  GrB_Index *Ia = malloc(nnz * sizeof(GrB_Index));
  GrB_Index *Ja = malloc(nnz * sizeof(GrB_Index));
  float *X = malloc(nnz * sizeof(float));
  for (int64_t k = 0; k < nnz; ++k) {
    Ia[k] = (GrB_Index)ri[k];
    Ja[k] = (GrB_Index)ci[k];
    X[k] = 1.0f;
  }
  GrB_Matrix S;
  OK(GrB_Matrix_new(&S, GrB_FP32, n, n));
  double t0 = now();
  OK(GrB_Matrix_build_FP32(S, Ia, Ja, X, nnz, GrB_PLUS_FP32));
  OK(GrB_Matrix_wait(S, GrB_MATERIALIZE));
  printf("{\"op\": \"build\", \"s\": %.4f}\n", now() - t0);
  GrB_Index real_nnz;
  OK(GrB_Matrix_nvals(&real_nnz, S));

  /* ---- SpMV y = S*x (plus_times fp32) ---- */
  GrB_Vector x, y;
  OK(GrB_Vector_new(&x, GrB_FP32, n));
  OK(GrB_Vector_new(&y, GrB_FP32, n));
  for (GrB_Index i = 0; i < (GrB_Index)n; ++i)
    OK(GrB_Vector_setElement_FP32(x, 1e-3f * (float)(i % 97), i));
  OK(GrB_Vector_wait(x, GrB_MATERIALIZE));
  OK(GrB_mxv(y, NULL, NULL, GrB_PLUS_TIMES_SEMIRING_FP32, S, x, NULL));
  OK(GrB_Vector_wait(y, GrB_MATERIALIZE));  /* warm (JIT compile) */
  int reps = 10;
  t0 = now();
  for (int r = 0; r < reps; ++r) {
    OK(GrB_mxv(y, NULL, NULL, GrB_PLUS_TIMES_SEMIRING_FP32, S, x, NULL));
    OK(GrB_Vector_wait(y, GrB_MATERIALIZE));
  }
  double spmv_s = (now() - t0) / reps;
  printf("{\"op\": \"spmv\", \"s\": %.4f, \"gnnz_per_s\": %.4f}\n", spmv_s,
         real_nnz / spmv_s / 1e9);

  /* ---- min-plus SpMV (SSSP relaxation class; round-5 semiring-generic
   * routed row) ---- */
  OK(GrB_mxv(y, NULL, NULL, GrB_MIN_PLUS_SEMIRING_FP32, S, x, NULL));
  OK(GrB_Vector_wait(y, GrB_MATERIALIZE));  /* warm (JIT compile) */
  t0 = now();
  for (int r = 0; r < reps; ++r) {
    OK(GrB_mxv(y, NULL, NULL, GrB_MIN_PLUS_SEMIRING_FP32, S, x, NULL));
    OK(GrB_Vector_wait(y, GrB_MATERIALIZE));
  }
  double mp_s = (now() - t0) / reps;
  printf("{\"op\": \"spmv_min_plus\", \"s\": %.4f}\n", mp_s);

  /* ---- BFS from source 0 (LOR_LAND over bool) ---- */
  GrB_Matrix Sb;
  OK(GrB_Matrix_new(&Sb, GrB_BOOL, n, n));
  OK(GrB_Matrix_apply(Sb, NULL, NULL, GrB_IDENTITY_BOOL, S, NULL));
  GrB_Vector frontier, visited;
  OK(GrB_Vector_new(&frontier, GrB_BOOL, n));
  OK(GrB_Vector_new(&visited, GrB_BOOL, n));
  OK(GrB_Vector_setElement_BOOL(frontier, true, 0));
  OK(GrB_Vector_setElement_BOOL(visited, true, 0));
  GrB_Descriptor d_rsc;
  OK(GrB_Descriptor_new(&d_rsc));
  OK(GrB_Descriptor_set(d_rsc, GrB_MASK, GrB_COMP));
  OK(GrB_Descriptor_set(d_rsc, GrB_MASK, GrB_STRUCTURE));
  OK(GrB_Descriptor_set(d_rsc, GrB_OUTP, GrB_REPLACE));
  t0 = now();
  int64_t levels = 0;
  GrB_Index nvals = 1;
  while (nvals > 0) {
    OK(GrB_vxm(frontier, visited, NULL, GrB_LOR_LAND_SEMIRING_BOOL,
               frontier, Sb, d_rsc));
    OK(GrB_Vector_nvals(&nvals, frontier));
    OK(GrB_Vector_assign_BOOL(visited, frontier, NULL, true, GrB_ALL, n,
                              GrB_DESC_S));
    ++levels;
  }
  double bfs_s = now() - t0;
  printf("{\"op\": \"bfs\", \"s\": %.4f, \"levels\": %lld, "
         "\"gteps\": %.4f}\n", bfs_s, (long long)levels,
         real_nnz / bfs_s / 1e9);

  /* ---- PageRank (plus_times fp32, 20 iterations) ---- */
  GrB_Vector pr, outdeg, w;
  OK(GrB_Vector_new(&pr, GrB_FP32, n));
  OK(GrB_Vector_new(&outdeg, GrB_FP32, n));
  OK(GrB_Vector_new(&w, GrB_FP32, n));
  OK(GrB_Matrix_reduce_Monoid(outdeg, NULL, NULL, GrB_PLUS_MONOID_FP32, S,
                              NULL));
  OK(GrB_Vector_assign_FP32(pr, NULL, NULL, 1.0f / n, GrB_ALL, n, NULL));
  int pr_iters = 20;
  t0 = now();
  for (int it = 0; it < pr_iters; ++it) {
    OK(GrB_Vector_eWiseMult_BinaryOp(w, NULL, NULL, GrB_DIV_FP32, pr,
                                     outdeg, NULL));
    OK(GrB_vxm(pr, NULL, NULL, GrB_PLUS_TIMES_SEMIRING_FP32, w, S, NULL));
    OK(GrB_Vector_apply_BinaryOp1st_FP32(pr, NULL, NULL, GrB_TIMES_FP32,
                                         0.85f, pr, NULL));
  }
  OK(GrB_Vector_wait(pr, GrB_MATERIALIZE));
  double pr_s = (now() - t0) / pr_iters;
  printf("{\"op\": \"pagerank_iter\", \"s\": %.4f, \"gteps\": %.4f}\n",
         pr_s, real_nnz / pr_s / 1e9);

  /* ---- Triangle count: C<L> = L*L' plus_pair; ntri = sum(C) ---- */
  GrB_Matrix L, Ctri;
  OK(GrB_Matrix_new(&L, GrB_FP32, n, n));
  OK(GrB_Matrix_select_INT64(L, NULL, NULL, GrB_TRIL, S, -1, NULL));
  OK(GrB_Matrix_new(&Ctri, GrB_INT64, n, n));
  GrB_Descriptor d_t1s;
  OK(GrB_Descriptor_new(&d_t1s));
  OK(GrB_Descriptor_set(d_t1s, GrB_INP1, GrB_TRAN));
  OK(GrB_Descriptor_set(d_t1s, GrB_MASK, GrB_STRUCTURE));
  t0 = now();
  OK(GrB_mxm(Ctri, L, NULL, GxB_PLUS_PAIR_INT64, L, L, d_t1s));
  int64_t ntri = 0;
  OK(GrB_Matrix_reduce_INT64(&ntri, NULL, GrB_PLUS_MONOID_INT64, Ctri,
                             NULL));
  double tc_s = now() - t0;
  printf("{\"op\": \"triangle_count\", \"s\": %.4f, \"ntri\": %lld}\n",
         tc_s, (long long)ntri);

  /* ---- SpMSpV y = x*S, x 1% dense (dobench_results.txt:102) ---- */
  GrB_Vector xs, ys;
  OK(GrB_Vector_new(&xs, GrB_FP32, n));
  OK(GrB_Vector_new(&ys, GrB_FP32, n));
  for (GrB_Index i = 0; i < (GrB_Index)n; i += 100)
    OK(GrB_Vector_setElement_FP32(xs, 1e-3f * (float)(i % 97 + 1), i));
  OK(GrB_Vector_wait(xs, GrB_MATERIALIZE));
  OK(GrB_vxm(ys, NULL, NULL, GrB_PLUS_TIMES_SEMIRING_FP32, xs, S, NULL));
  OK(GrB_Vector_wait(ys, GrB_MATERIALIZE));   /* warm */
  int vreps = 10;
  t0 = now();
  for (int r = 0; r < vreps; ++r) {
    OK(GrB_vxm(ys, NULL, NULL, GrB_PLUS_TIMES_SEMIRING_FP32, xs, S, NULL));
    OK(GrB_Vector_wait(ys, GrB_MATERIALIZE));
  }
  double vxm_s = (now() - t0) / vreps;
  printf("{\"op\": \"spmspv\", \"s\": %.4f}\n", vxm_s);

  /* ---- SpMM dense C = S*F, F n x 4 (dobench_results.txt:103) ---- */
  GrB_Matrix Fm, Cmm;
  OK(GrB_Matrix_new(&Fm, GrB_FP32, n, 4));
  for (GrB_Index i = 0; i < (GrB_Index)n; ++i)
    for (GrB_Index j = 0; j < 4; ++j)
      OK(GrB_Matrix_setElement_FP32(Fm, 1e-3f * (float)((i + 7 * j) % 97),
                                    i, j));
  OK(GrB_Matrix_wait(Fm, GrB_MATERIALIZE));
  OK(GrB_Matrix_new(&Cmm, GrB_FP32, n, 4));
  OK(GrB_mxm(Cmm, NULL, NULL, GrB_PLUS_TIMES_SEMIRING_FP32, S, Fm, NULL));
  OK(GrB_Matrix_wait(Cmm, GrB_MATERIALIZE));  /* warm */
  t0 = now();
  OK(GrB_mxm(Cmm, NULL, NULL, GrB_PLUS_TIMES_SEMIRING_FP32, S, Fm, NULL));
  OK(GrB_Matrix_wait(Cmm, GrB_MATERIALIZE));
  double mm_s = now() - t0;
  printf("{\"op\": \"spmm_dense4\", \"s\": %.4f}\n", mm_s);

  /* ---- Transpose C = S' (materialized; dobench_results.txt:107) ---- */
  GrB_Matrix St;
  OK(GrB_Matrix_new(&St, GrB_FP32, n, n));
  OK(GrB_transpose(St, NULL, NULL, S, NULL));
  OK(GrB_Matrix_wait(St, GrB_MATERIALIZE));   /* warm */
  t0 = now();
  OK(GrB_transpose(St, NULL, NULL, S, NULL));
  OK(GrB_Matrix_wait(St, GrB_MATERIALIZE));
  double tr_s = now() - t0;
  printf("{\"op\": \"transpose\", \"s\": %.4f}\n", tr_s);

  /* ---- eWiseAdd C = S + S' (dobench_results.txt:109) ---- */
  GrB_Matrix Cadd;
  OK(GrB_Matrix_new(&Cadd, GrB_FP32, n, n));
  OK(GrB_Matrix_eWiseAdd_BinaryOp(Cadd, NULL, NULL, GrB_PLUS_FP32, S, St,
                                  NULL));
  OK(GrB_Matrix_wait(Cadd, GrB_MATERIALIZE));  /* warm */
  t0 = now();
  OK(GrB_Matrix_eWiseAdd_BinaryOp(Cadd, NULL, NULL, GrB_PLUS_FP32, S, St,
                                  NULL));
  OK(GrB_Matrix_wait(Cadd, GrB_MATERIALIZE));
  double ea_s = now() - t0;
  GrB_Index ea_nnz;
  OK(GrB_Matrix_nvals(&ea_nnz, Cadd));
  printf("{\"op\": \"ewiseadd\", \"s\": %.4f, \"cnnz\": %llu}\n", ea_s,
         (unsigned long long)ea_nnz);

  /* ---- Submatrix C = S(p,q), random permutations (.. .txt:110) ---- */
  GrB_Index *P = malloc(n * sizeof(GrB_Index));
  GrB_Index *Q = malloc(n * sizeof(GrB_Index));
  unsigned long long seed = 0x9e3779b97f4a7c15ULL;
  for (GrB_Index i = 0; i < (GrB_Index)n; ++i) { P[i] = i; Q[i] = i; }
  for (GrB_Index i = (GrB_Index)n - 1; i > 0; --i) {
    seed = seed * 6364136223846793005ULL + 1442695040888963407ULL;
    GrB_Index j = (GrB_Index)(seed >> 33) % (i + 1);
    GrB_Index t = P[i]; P[i] = P[j]; P[j] = t;
    seed = seed * 6364136223846793005ULL + 1442695040888963407ULL;
    j = (GrB_Index)(seed >> 33) % (i + 1);
    t = Q[i]; Q[i] = Q[j]; Q[j] = t;
  }
  GrB_Matrix Csub;
  OK(GrB_Matrix_new(&Csub, GrB_FP32, n, n));
  OK(GrB_Matrix_extract(Csub, NULL, NULL, S, P, n, Q, n, NULL));
  OK(GrB_Matrix_wait(Csub, GrB_MATERIALIZE));  /* warm */
  t0 = now();
  OK(GrB_Matrix_extract(Csub, NULL, NULL, S, P, n, Q, n, NULL));
  OK(GrB_Matrix_wait(Csub, GrB_MATERIALIZE));
  double ex_s = now() - t0;
  printf("{\"op\": \"extract_perm\", \"s\": %.4f}\n", ex_s);

  /* ---- SpGEMM C = S*S ---- */
  GrB_Matrix C2;
  OK(GrB_Matrix_new(&C2, GrB_FP32, n, n));
  t0 = now();
  OK(GrB_mxm(C2, NULL, NULL, GrB_PLUS_TIMES_SEMIRING_FP32, S, S, NULL));
  OK(GrB_Matrix_wait(C2, GrB_MATERIALIZE));
  double gem_s = now() - t0;
  GrB_Index cnnz;
  OK(GrB_Matrix_nvals(&cnnz, C2));
  printf("{\"op\": \"spgemm\", \"s\": %.4f, \"cnnz\": %llu}\n", gem_s,
         (unsigned long long)cnnz);

  GrB_finalize();
  return 0;
}
