"""All-config benchmark (BASELINE.json configs 1-4 on one chip): SpMV,
BFS, PageRank, triangle count, SpGEMM on the same synthetic graph as
bench.py, against the reference compiled and measured ON THIS HOST
(experiments/bench_ref.c; 1 core, COMPACT+JIT build) plus the published
20-core anchors (BASELINE.md).

Writes BENCH_ALL.json and prints one JSON line per config.  Run:
    PYTHONPATH=/root/repo:/root/.axon_site python bench_all.py
"""

import json
import os
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SYNC_FLOOR_S = 0.0286

# reference measured on this host (1 core, COMPACT build, runtime JIT) —
# regenerate with: gcc experiments/bench_ref.c + /tmp/bench_graph.bin
REF_1CORE = {
    # 2026-08-20 (round 4) rerun on an idle host, COMPACT build + warm
    # runtime-JIT cache, TWO solo runs, per-op MINIMUM taken (the
    # reference's most favorable measurement — same policy as round 3,
    # which recorded slower numbers under contention: tc 1.865,
    # spgemm 54.6, spmv 0.0926, transpose 0.625, extract 1.940)
    "build_s": 0.2545,
    "spmv_s": 0.0544, "bfs_s": 0.1445, "pagerank_iter_s": 0.1053,
    "triangle_count_s": 1.0761, "spgemm_s": 30.30, "ntri": 647,
    "spgemm_cnnz": 268406919,
    "spmm_dense4_s": 0.1614, "spmspv_s": 0.0074,
    "spmv_minplus_s": 0.0764,   # min-plus mxv (bench_ref.c, 2026-08-20)
    "transpose_s": 0.4700, "ewiseadd_s": 0.6963, "extract_perm_s": 1.4407,
    "ewiseadd_cnnz": 33553873,
}
REF_PUBLISHED_SPMV_GNNZ_S = 0.61     # GAP-twitter, 20-core Xeon


def main():
    import jax
    import jax.numpy as jnp
    import graphblas_tpu as gb
    import scipy.sparse as sps
    from graphblas_tpu.algorithms import graph as GALG
    from graphblas_tpu.core import semiring as SR
    from graphblas_tpu.core.matrix import COL, ROW, SPARSE
    from graphblas_tpu.kernels import spmv_route as SPRT

    gb.init()
    n = 1 << 20
    deg = 16
    rng = np.random.default_rng(0)
    S = sps.csr_matrix(
        (np.ones(n * deg, np.float32),
         (rng.integers(0, n, n * deg), rng.integers(0, n, n * deg))),
        shape=(n, n))
    S.sum_duplicates()
    nnz = S.nnz
    out = {"n": n, "nnz": int(nnz), "reference_1core_this_host": REF_1CORE}

    # ---- SpMV (routing engine; plan cached on disk) --------------------
    plan_path = os.path.join(HERE, ".bench_plan.npz")
    t0 = time.perf_counter()
    plan = None
    plan_cold = True
    if os.path.exists(plan_path):
        try:
            plan = SPRT.load_plan(plan_path)
            if plan.m != n or plan.nnz_total != nnz \
                    or not plan.has_exact or not SPRT.plan_has_lo(plan):
                plan = None
            else:
                plan_cold = False
        except Exception:
            plan = None
    if plan is None:
        # build from f64 values: the plan then carries both the f32 route
        # tables (hi plane) and the lo plane for the double-single tier,
        # so one plan serves the fp32 AND fp64 SpMV rows
        plan = SPRT.build_plan(S.indptr, S.indices,
                               S.data.astype(np.float64), (n, n))
        SPRT.save_plan(plan, plan_path)
    plan_s = time.perf_counter() - t0
    plan = SPRT.plan_to_device(plan)
    K = 60
    x0 = jnp.asarray((rng.standard_normal(n) * 1e-3).astype(np.float32))

    @jax.jit
    def chained(v, pln):
        def body(i, acc):
            return SPRT.spmv_route(acc, pln) * jnp.float32(1.0 / deg)
        return jax.lax.fori_loop(0, K, body, v)

    y = chained(x0, plan)
    _ = float(np.asarray(jnp.sum(y)))
    t0 = time.perf_counter()
    y = chained(x0, plan)
    _ = float(np.asarray(jnp.sum(y)))
    spmv_s = (time.perf_counter() - t0 - SYNC_FLOOR_S) / K
    out["spmv"] = {
        "s": round(spmv_s, 6), "gnnz_per_s": round(nnz / spmv_s / 1e9, 3),
        "plan_s": round(plan_s, 1), "plan_cold": plan_cold,
        "vs_ref_this_host": round(REF_1CORE["spmv_s"] / spmv_s, 1),
        "vs_ref_published_20core": round(
            nnz / spmv_s / 1e9 / REF_PUBLISHED_SPMV_GNNZ_S, 2)}
    print(json.dumps({"config": "spmv", **out["spmv"]}), flush=True)

    # ---- SpMV fp64 (double-single route tier; reference headline dtype)
    @jax.jit
    def chained64(v, pln):
        # the fp64 state vector carries through the whole chain (ADVICE
        # r3: an f32 carry zeroed the x lo-plane and made the row
        # timing-only); the per-iteration hi/lo split is an honest part
        # of fp64 SpMV cost
        def body(i, acc):
            y = SPRT.spmv_route_ds(acc, pln)
            return y * (1.0 / deg)
        return jax.lax.fori_loop(0, K, body, v.astype(jnp.float64))

    y64 = chained64(x0, plan)
    _ = float(np.asarray(jnp.sum(y64)))
    t0 = time.perf_counter()
    y64 = chained64(x0, plan)
    _ = float(np.asarray(jnp.sum(y64)))
    spmv64_s = (time.perf_counter() - t0 - SYNC_FLOOR_S) / K
    # one-shot fp64 correctness vs scipy (float64 end to end)
    y1 = np.asarray(SPRT.spmv_route_ds(x0, plan))
    yref = (S.astype(np.float64) @ np.asarray(x0, np.float64))
    relerr64 = float(np.abs(y1 - yref).max()
                     / max(np.abs(yref).max(), 1e-300))
    out["spmv_fp64"] = {
        "s": round(spmv64_s, 6),
        "gnnz_per_s": round(nnz / spmv64_s / 1e9, 3),
        "relerr": relerr64,
        "vs_ref_this_host_fp64": round(REF_1CORE["spmv_s"] / spmv64_s, 1)}
    print(json.dumps({"config": "spmv_fp64", **out["spmv_fp64"]}),
          flush=True)

    # ---- min-plus SpMV (semiring-generic routed tier, round-5 ask #3;
    # reference row measured by experiments/bench_ref.c spmv_min_plus)
    @jax.jit
    def chained_mp(v, pln):
        def body(i, acc):
            y = SPRT.spmv_route_monoid(acc, pln, add="min", mul="plus")
            return jnp.minimum(acc, y)
        return jax.lax.fori_loop(0, K, body, v)

    ymp = chained_mp(x0, plan)
    _ = float(np.asarray(jnp.sum(ymp)))
    t0 = time.perf_counter()
    ymp = chained_mp(x0, plan)
    _ = float(np.asarray(jnp.sum(ymp)))
    mp_s = (time.perf_counter() - t0 - SYNC_FLOOR_S) / K
    refmp = REF_1CORE.get("spmv_minplus_s")
    out["spmv_min_plus"] = {
        "s": round(mp_s, 6),
        "vs_ref_this_host": (round(refmp / mp_s, 1) if refmp else None)}
    print(json.dumps({"config": "spmv_min_plus", **out["spmv_min_plus"]}),
          flush=True)

    # ---- pattern plan for A' (shared by BFS + PageRank) ----------------
    A = gb.Matrix.from_scipy(S)
    At = A.to_format(SPARSE, COL)
    tplan_path = os.path.join(HERE, ".bench_plan_t.npz")
    t0 = time.perf_counter()
    tplan = None
    if os.path.exists(tplan_path):
        try:
            tplan = SPRT.load_plan(tplan_path)
            if tplan.nnz_total != nnz or not tplan.has_exact:
                tplan = None
        except Exception:
            tplan = None
    if tplan is None:
        ip = np.asarray(At.indptr)
        ix = np.asarray(At.indices)
        tplan = SPRT.build_plan(ip, ix, np.ones(nnz, np.float32), (n, n))
        SPRT.save_plan(tplan, tplan_path)
    tplan = SPRT.plan_to_device(tplan)
    GALG._pattern_plans.clear()
    GALG._pattern_plans[(id(At.indptr), id(At.indices), At.shape)] = (
        At.indptr, At.indices, tplan)
    tplan_s = time.perf_counter() - t0

    # ---- BFS (fused + routed frontier expansion) -----------------------
    levels = GALG.bfs_levels_fused(At, 0)        # compile + run
    nlv = int(np.asarray(levels).max()) + 1
    t0 = time.perf_counter()
    levels = GALG.bfs_levels_fused(At, 0)
    _ = int(np.asarray(levels).max())
    bfs_s = time.perf_counter() - t0 - SYNC_FLOOR_S
    out["bfs"] = {
        "s": round(bfs_s, 4), "levels": nlv, "plan_s": round(tplan_s, 1),
        "gteps": round(nnz / bfs_s / 1e9, 3),
        "vs_ref_this_host": round(REF_1CORE["bfs_s"] / bfs_s, 1)}
    print(json.dumps({"config": "bfs", **out["bfs"]}), flush=True)

    # ---- PageRank (fused + routed; 20 fixed iterations) ----------------
    r, iters = GALG.pagerank_fused(At, tol=0.0, max_iter=20)
    _ = float(np.asarray(jnp.sum(r)))
    t0 = time.perf_counter()
    r, iters = GALG.pagerank_fused(At, tol=0.0, max_iter=20)
    _ = float(np.asarray(jnp.sum(r)))
    pr_s = (time.perf_counter() - t0 - SYNC_FLOOR_S) / 20
    out["pagerank"] = {
        "iter_s": round(pr_s, 5),
        "gteps": round(nnz / pr_s / 1e9, 3),
        "vs_ref_this_host": round(REF_1CORE["pagerank_iter_s"] / pr_s, 1)}
    print(json.dumps({"config": "pagerank", **out["pagerank"]}), flush=True)

    # ---- SpMM dense C = S*F (F n x 4; dobench row: C=S*F) --------------
    def _vs(key, s):
        r = REF_1CORE.get(key)
        return round(r / s, 2) if r else None

    # ---- Build C = from_coo (the GB_builder analog; reference builds
    # CSR from tuples in ~0.5 s on this host).  The route plan above is
    # the hyper-hash analog (optional acceleration), NOT the builder.
    coo_r = np.asarray(S.tocoo().row)
    coo_c = np.asarray(S.tocoo().col)
    coo_v = np.asarray(S.data)
    Ab = gb.Matrix.from_coo(coo_r, coo_c, coo_v, (n, n))      # warm
    _ = float(np.asarray(jnp.sum(Ab.values)))
    t0 = time.perf_counter()
    Ab = gb.Matrix.from_coo(coo_r, coo_c, coo_v, (n, n))
    _ = float(np.asarray(jnp.sum(Ab.values)))
    bld_s = max(time.perf_counter() - t0 - SYNC_FLOOR_S, 1e-6)
    out["build"] = {"s": round(bld_s, 4),
                    "vs_ref_this_host": _vs("build_s", bld_s)}
    print(json.dumps({"config": "build", **out["build"]}), flush=True)

    # ---- SpMSpV y = x*S, x 1% dense (dobench row: y=x*S) ---------------
    # Two numbers: the CHAINED one-dispatch pipeline (gb.vxm_chain — the
    # production packaging; the reference's per-call overhead is ~us, so
    # K chained steps is the honest apples-to-apples against K C calls),
    # and the eager per-call figure, which under the axon tunnel is the
    # ~25-29 ms client dispatch floor, reported as eager_call_s.
    xi = np.arange(0, n, 100, dtype=np.int64)
    xv = (1e-3 * (xi % 97 + 1)).astype(np.float32)
    xs = gb.Vector.from_coo(xi, xv, n)
    Avxm = A.to_format(SPARSE, COL)
    vplan_path = os.path.join(HERE, ".bench_plan_vxm.npz")
    vplan = None
    if os.path.exists(vplan_path):
        try:
            vplan = SPRT.load_plan(vplan_path)
            if vplan.nnz_total != nnz or not vplan.has_exact:
                vplan = None
        except Exception:
            vplan = None
    if vplan is None:
        vplan = SPRT.build_plan(np.asarray(Avxm.indptr),
                                np.asarray(Avxm.indices),
                                np.asarray(Avxm._vals_expanded()), (n, n))
        SPRT.save_plan(vplan, vplan_path)
    SPRT.register_plan(Avxm.indptr, Avxm.indices, Avxm._vals_expanded(),
                       (n, n), vplan)
    KS = 20
    ys = gb.vxm_chain(xs, Avxm, SR.PLUS_TIMES, KS)       # warm + compile
    _ = float(np.asarray(jnp.sum(ys.values)))
    t0 = time.perf_counter()
    ys = gb.vxm_chain(xs, Avxm, SR.PLUS_TIMES, KS)
    _ = float(np.asarray(jnp.sum(ys.values)))
    vxm_s = max((time.perf_counter() - t0 - SYNC_FLOOR_S) / KS, 1e-6)
    ys = gb.vxm(xs, A, SR.PLUS_TIMES)                    # eager warm
    _ = float(np.asarray(jnp.sum(ys.values)))
    t0 = time.perf_counter()
    for _ in range(KS):
        ys = gb.vxm(xs, A, SR.PLUS_TIMES)
    _ = float(np.asarray(jnp.sum(ys.values)))
    eager_s = max((time.perf_counter() - t0 - SYNC_FLOOR_S) / KS, 1e-6)
    out["spmspv"] = {
        "s": round(vxm_s, 5), "reps": KS, "chained": True,
        "eager_call_s": round(eager_s, 5),
        "note": "eager per-call = tunnel client dispatch floor",
        "vs_ref_this_host": _vs("spmspv_s", vxm_s)}
    print(json.dumps({"config": "spmspv", **out["spmspv"]}), flush=True)

    # narrow SpMM rides the SpMV route plan (Matrix.optimize analog: the
    # plan is this matrix's storage-format acceleration, reference
    # GB_hyper_hash_build); registered against A's own arrays
    SPRT.register_plan(A.indptr, A.indices, A.values, (n, n), plan)
    ii = np.arange(n)[:, None]
    Fm = gb.Matrix.from_dense(
        (1e-3 * ((ii + 7 * np.arange(4)[None, :]) % 97)).astype(np.float32))
    Cmm = gb.mxm(A, Fm, SR.PLUS_TIMES)       # warm
    _ = float(np.asarray(jnp.sum(Cmm.values)))
    t0 = time.perf_counter()
    Cmm = gb.mxm(A, Fm, SR.PLUS_TIMES)
    _ = float(np.asarray(jnp.sum(Cmm.values)))
    mm_s = time.perf_counter() - t0 - SYNC_FLOOR_S
    out["spmm_dense4"] = {
        "s": round(mm_s, 4),
        "gflops": round(2 * 4 * nnz / mm_s / 1e9, 2),
        "vs_ref_this_host": _vs("spmm_dense4_s", mm_s)}
    print(json.dumps({"config": "spmm_dense4", **out["spmm_dense4"]}),
          flush=True)

    # ---- Transpose C = S' materialized (dobench row: C=S') -------------

    At2 = gb.transpose(A).to_format(SPARSE, ROW)     # warm path compile
    _ = float(np.asarray(jnp.sum(At2.values)))
    t0 = time.perf_counter()
    At2 = gb.transpose(A).to_format(SPARSE, ROW)
    _ = float(np.asarray(jnp.sum(At2.values)))
    tr_s = time.perf_counter() - t0 - SYNC_FLOOR_S
    out["transpose"] = {
        "s": round(tr_s, 4), "gnnz_per_s": round(nnz / tr_s / 1e9, 3),
        "vs_ref_this_host": _vs("transpose_s", tr_s)}
    print(json.dumps({"config": "transpose", **out["transpose"]}),
          flush=True)

    # ---- eWiseAdd C = S + S' (dobench row: C=S+B) ----------------------
    Badd = gb.ewise_add(A, At2, gb.operators.PLUS)   # warm
    _ = float(np.asarray(jnp.sum(Badd.values)))
    t0 = time.perf_counter()
    Badd = gb.ewise_add(A, At2, gb.operators.PLUS)
    _ = float(np.asarray(jnp.sum(Badd.values)))
    ea_s = time.perf_counter() - t0 - SYNC_FLOOR_S
    out["ewiseadd"] = {
        "s": round(ea_s, 4), "cnnz": int(Badd.nvals),
        "matches_ref_nnz": int(Badd.nvals) == REF_1CORE["ewiseadd_cnnz"],
        "vs_ref_this_host": _vs("ewiseadd_s", ea_s)}
    print(json.dumps({"config": "ewiseadd", **out["ewiseadd"]}),
          flush=True)

    # ---- Submatrix C = S(p,q), random permutations ---------------------
    perm_rng = np.random.default_rng(42)
    P = perm_rng.permutation(n)
    Q = perm_rng.permutation(n)
    Csub = gb.extract(A, P, Q)                       # warm
    _ = float(np.asarray(jnp.sum(Csub.values)))
    t0 = time.perf_counter()
    Csub = gb.extract(A, P, Q)
    _ = float(np.asarray(jnp.sum(Csub.values)))
    ex_s = time.perf_counter() - t0 - SYNC_FLOOR_S
    out["extract_perm"] = {
        "s": round(ex_s, 4),
        "vs_ref_this_host": _vs("extract_perm_s", ex_s)}
    print(json.dumps({"config": "extract_perm", **out["extract_perm"]}),
          flush=True)

    # ---- Triangle count (masked SpGEMM) --------------------------------
    # warm like every other row: the reference numbers above were taken
    # "with the reference's JIT kernel cache warm" (see REF_1CORE note);
    # ours pay a remote AOT compile per executable (dispatch_cold_s class)
    # that the persistent XLA cache amortizes across runs.  Cold time is
    # kept as its own field.
    t0 = time.perf_counter()
    ntri = GALG.triangle_count(A)
    tc_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    ntri = GALG.triangle_count(A)
    tc_s = time.perf_counter() - t0
    out["triangle_count"] = {
        "s": round(tc_s, 2), "cold_s": round(tc_cold, 2), "ntri": int(ntri),
        "matches_ref": int(ntri) == REF_1CORE["ntri"],
        "vs_ref_this_host": round(REF_1CORE["triangle_count_s"] / tc_s, 2)}
    print(json.dumps({"config": "triangle_count",
                      **out["triangle_count"]}), flush=True)

    # ---- SpGEMM C = S*S (SELL engine) ----------------------------------
    t0 = time.perf_counter()
    C = gb.mxm(A, A, SR.PLUS_TIMES)
    cnnz = int(C.nvals)
    gem_cold = time.perf_counter() - t0
    del C
    t0 = time.perf_counter()
    C = gb.mxm(A, A, SR.PLUS_TIMES)
    cnnz = int(C.nvals)
    gem_s = time.perf_counter() - t0
    out["spgemm"] = {
        "s": round(gem_s, 2), "cold_s": round(gem_cold, 2), "cnnz": cnnz,
        "matches_ref_nnz": cnnz == REF_1CORE["spgemm_cnnz"],
        "vs_ref_this_host": round(REF_1CORE["spgemm_s"] / gem_s, 2)}
    print(json.dumps({"config": "spgemm", **out["spgemm"]}), flush=True)

    with open(os.path.join(HERE, "BENCH_ALL.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
