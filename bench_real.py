"""Real-graph benchmark: RMAT power-law graph (Graph500 a/b/c/d =
0.57/0.19/0.19/0.05), the class of inputs the reference's dobench table
runs (GraphBLAS/demo/benchmark/dobench_results.txt rows: real matrices,
10 ops x 11 graphs).  Downloads are unavailable in this image, so the
graph is generated (VERDICT r2 item 7 sanctions RMAT for this role);
scale 20 / edge-factor 16 gives com-Orkut-class skew at roadNet-CA-class
size, with hub degrees in the tens of thousands (the property that
stresses the route planner's virtual windows and heavy-row splitting).

Rows: SpMV (routing engine), BFS (fused frontier), PageRank, SpMSpV.
No compiled reference exists on this host this round, so rows report
absolute rates plus the published 20-core anchors where the reference
publishes one (SpMV GAP-twitter 0.61 Gnnz/s).

Writes BENCH_REAL.json and prints one JSON line per row.
    PYTHONPATH=/root/repo:/root/.axon_site python bench_real.py
"""

import json
import os
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SYNC_FLOOR_S = 0.0286
REF_PUBLISHED_SPMV_GNNZ_S = 0.61     # GAP-twitter, 20-core Xeon


def rmat_edges(scale, edge_factor, rng, a=0.57, b=0.19, c=0.19):
    """Vectorized RMAT: one quadrant draw per bit level for all edges."""
    n = 1 << scale
    ne = n * edge_factor
    rows = np.zeros(ne, np.int64)
    cols = np.zeros(ne, np.int64)
    ab, abc = a + b, a + b + c
    for lvl in range(scale):
        r = rng.random(ne)
        right = (r >= a) & (r < ab)          # col bit set
        down = (r >= ab) & (r < abc)         # row bit set
        both = r >= abc
        rows |= (down | both).astype(np.int64) << lvl
        cols |= (right | both).astype(np.int64) << lvl
    # Graph500 permutes vertex ids so locality is not an artifact
    perm = rng.permutation(n)
    return perm[rows], perm[cols], n


# Reference (1-core, this host, solo) on the scale-18 RMAT graph dumped
# above — measured via experiments/bench_ref.c; None until measured.
# measured 2026-08-20, solo, COMPACT build + runtime JIT warm
REF_RMAT18 = {"spgemm_s": 216.43, "triangle_count_s": 3.0025,
              "ntri": 19595360, "spgemm_cnnz": 1278009346}


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sps

    import graphblas_tpu as gb
    from graphblas_tpu.algorithms import graph as GALG
    from graphblas_tpu.core import semiring as SR
    from graphblas_tpu.core.matrix import COL, SPARSE
    from graphblas_tpu.kernels import spmv_route as SPRT

    gb.init()
    scale, ef = 20, 16
    rng = np.random.default_rng(7)
    t0 = time.perf_counter()
    ri, ci, n = rmat_edges(scale, ef, rng)
    S = sps.csr_matrix((np.ones(ri.size, np.float32), (ri, ci)),
                       shape=(n, n))
    S.sum_duplicates()
    gen_s = time.perf_counter() - t0
    nnz = int(S.nnz)
    deg = np.diff(S.indptr)
    out = {"graph": "rmat", "scale": scale, "edge_factor": ef, "n": n,
           "nnz": nnz, "gen_s": round(gen_s, 1),
           "max_out_degree": int(deg.max()),
           "note": "power-law generated graph; no compiled reference on "
                   "this host this round, published anchors only"}
    print(json.dumps({"config": "graph", **{k: out[k] for k in (
        "graph", "scale", "n", "nnz", "max_out_degree")}}), flush=True)

    # ---- SpMV (routing engine, cold plan build timed) ------------------
    t0 = time.perf_counter()
    plan = SPRT.build_plan(S.indptr, S.indices, S.data, (n, n))
    plan_s = time.perf_counter() - t0
    plan = SPRT.plan_to_device(plan)
    K = 60
    x0 = jnp.asarray((rng.standard_normal(n) * 1e-3).astype(np.float32))

    @jax.jit
    def chained(v, pln):
        def body(i, acc):
            return SPRT.spmv_route(acc, pln) * jnp.float32(1.0 / ef)
        return jax.lax.fori_loop(0, K, body, v)

    y = chained(x0, plan)
    _ = float(np.asarray(jnp.sum(y)))
    t0 = time.perf_counter()
    y = chained(x0, plan)
    _ = float(np.asarray(jnp.sum(y)))
    spmv_s = (time.perf_counter() - t0 - SYNC_FLOOR_S) / K
    y1 = np.asarray(jax.jit(lambda v, p: SPRT.spmv_route(v, p))(x0, plan))
    want = S.astype(np.float64) @ np.asarray(x0, np.float64)
    relerr = float(np.abs(y1 - want).max() / (np.abs(want).max() + 1e-30))
    out["spmv"] = {
        "s": round(spmv_s, 6), "gnnz_per_s": round(nnz / spmv_s / 1e9, 3),
        "plan_s": round(plan_s, 1), "plan_cold": True, "relerr": relerr,
        "padded_frac": round(float(plan.padded_frac), 2),
        "vs_ref_published_20core": round(
            nnz / spmv_s / 1e9 / REF_PUBLISHED_SPMV_GNNZ_S, 2)}
    print(json.dumps({"config": "spmv", **out["spmv"]}), flush=True)

    # ---- BFS + PageRank over A' (pattern plan shared) -------------------
    A = gb.Matrix.from_scipy(S)
    At = A.to_format(SPARSE, COL)
    t0 = time.perf_counter()
    ip = np.asarray(At.indptr)
    ix = np.asarray(At.indices)
    tplan = SPRT.SpmvRoutePlan(ip, ix, np.ones(nnz, np.float32), (n, n))
    tplan_s = time.perf_counter() - t0
    tplan = SPRT.plan_to_device(tplan)
    GALG._pattern_plans.clear()
    GALG._pattern_plans[(id(At.indptr), id(At.indices), At.shape)] = (
        At.indptr, At.indices, tplan)

    src = int(np.argmax(deg))          # hub source reaches the giant SCC
    levels = GALG.bfs_levels_fused(At, src)
    nlv = int(np.asarray(levels).max()) + 1
    t0 = time.perf_counter()
    levels = GALG.bfs_levels_fused(At, src)
    _ = int(np.asarray(levels).max())
    # clamp: an op faster than the sync floor must not go negative
    # (ADVICE r3); the floor was calibrated on bench_all's setup
    bfs_s = max(time.perf_counter() - t0 - SYNC_FLOOR_S, 1e-6)
    out["bfs"] = {"s": round(bfs_s, 4), "levels": nlv,
                  "plan_s": round(tplan_s, 1),
                  "gteps": round(nnz / bfs_s / 1e9, 3)}
    print(json.dumps({"config": "bfs", **out["bfs"]}), flush=True)

    r, iters = GALG.pagerank_fused(At, tol=0.0, max_iter=20)
    _ = float(np.asarray(jnp.sum(r)))
    t0 = time.perf_counter()
    r, iters = GALG.pagerank_fused(At, tol=0.0, max_iter=20)
    _ = float(np.asarray(jnp.sum(r)))
    pr_s = (time.perf_counter() - t0 - SYNC_FLOOR_S) / 20
    out["pagerank"] = {"iter_s": round(pr_s, 5),
                       "gteps": round(nnz / pr_s / 1e9, 3)}
    print(json.dumps({"config": "pagerank", **out["pagerank"]}), flush=True)

    # ---- SpMSpV y = x*S with 1%-dense sparse x --------------------------
    xi = np.arange(0, n, 100, dtype=np.int64)
    xv = (1e-3 * (xi % 97 + 1)).astype(np.float32)
    xs = gb.Vector.from_coo(xi, xv, n)
    ys = gb.vxm(xs, A, SR.PLUS_TIMES)
    _ = float(np.asarray(jnp.sum(ys.values)))
    t0 = time.perf_counter()
    ys = gb.vxm(xs, A, SR.PLUS_TIMES)
    _ = float(np.asarray(jnp.sum(ys.values)))
    vxm_s = max(time.perf_counter() - t0 - SYNC_FLOOR_S, 1e-6)
    out["spmspv"] = {"s": round(vxm_s, 4)}
    print(json.dumps({"config": "spmspv", **out["spmspv"]}), flush=True)

    # ---- power-law SpGEMM + TC (BASELINE config 4: tier selection on
    # power-law graphs).  Scale-18 keeps both sides tractable; the
    # reference numbers come from experiments/bench_ref.c run on the SAME
    # generated graph (REF_RMAT18 below, measured on this host solo).
    rng18 = np.random.default_rng(7)
    ri8, ci8, n8 = rmat_edges(18, 16, rng18)
    S18 = sps.csr_matrix((np.ones(ri8.size, np.float32), (ri8, ci8)),
                         shape=(n8, n8))
    S18.sum_duplicates()
    # dump the graph for the reference driver (bench_ref.c format)
    try:
        coo18 = S18.tocoo()
        with open("/tmp/rmat18_graph.bin", "wb") as f:
            np.asarray([n8, S18.nnz], np.int64).tofile(f)
            coo18.row.astype(np.int32).tofile(f)
            coo18.col.astype(np.int32).tofile(f)
    except Exception:
        pass
    A18 = gb.Matrix.from_scipy(S18)
    gb.set_option("burble", True)   # tier-selection evidence in the log
    try:
        C18 = gb.mxm(A18, A18, SR.PLUS_TIMES)          # warm
        cn = int(C18.nvals)
        del C18
        t0 = time.perf_counter()
        C18 = gb.mxm(A18, A18, SR.PLUS_TIMES)
        cn = int(C18.nvals)
        gem_s = max(time.perf_counter() - t0 - SYNC_FLOOR_S, 1e-6)
        del C18
        ref = REF_RMAT18.get("spgemm_s")
        out["spgemm_rmat18"] = {
            "s": round(gem_s, 3), "cnnz": cn, "n": n8,
            "nnz": int(S18.nnz),
            "matches_ref_nnz": cn == REF_RMAT18.get("spgemm_cnnz"),
            "vs_ref_this_host": round(ref / gem_s, 2) if ref else None}
    except Exception as e:          # 1.28e9 outputs can exceed HBM
        out["spgemm_rmat18"] = {"error": repr(e)[:200]}
    print(json.dumps({"config": "spgemm_rmat18", **out["spgemm_rmat18"]}),
          flush=True)

    try:
        nt = GALG.triangle_count(A18)              # warm (plans cached)
        t0 = time.perf_counter()
        nt = GALG.triangle_count(A18)
        tc_s = max(time.perf_counter() - t0 - SYNC_FLOOR_S, 1e-6)
        ref = REF_RMAT18.get("triangle_count_s")
        out["tc_rmat18"] = {
            "s": round(tc_s, 3), "ntri": int(nt),
            "matches_ref": int(nt) == REF_RMAT18.get("ntri"),
            "vs_ref_this_host": round(ref / tc_s, 2) if ref else None}
    except Exception as e:
        out["tc_rmat18"] = {"error": repr(e)[:200]}
    gb.set_option("burble", False)
    print(json.dumps({"config": "tc_rmat18", **out["tc_rmat18"]}),
          flush=True)

    with open(os.path.join(HERE, "BENCH_REAL.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
