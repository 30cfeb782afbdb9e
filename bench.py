"""Benchmark: SpMV (plus-times, fp32) throughput on the real TPU chip.

Metric: Gnnz/s on a uniform-random graph (n=2^20, avg degree 16, ~16.7M
edges) — the y=S*x headline workload of the reference
(GraphBLAS/demo/benchmark/dobench_results.txt).  Baseline anchor: the
reference does GAP-twitter SpMV at 0.61 Gnnz/s on a 20-core Xeon E5-2698 v4
(BASELINE.md), so vs_baseline = our_gnnz_per_s / 0.61.

Kernel tiers (ops/mxm.spmv_arrays dispatch order):
  1. static-routing engine (kernels/spmv_route.py) — gather, 2-phase Clos
     route, fused cumsum+concentrator reduce; the plan is a storage format
     built once on the host (serialized to .bench_plan.npz so later rounds
     reuse it — reference analog: O(1) pack/unpack move semantics).
  2. one-hot MXU kernel (kernels/spmv_onehot.py) — no-plan fallback.
  3. XLA gather+segment-sum substrate — always-works fallback.

The timed loop is ITERS dependency-chained SpMVs inside ONE jitted
fori_loop with a single scalar transfer at the end (under the axon tunnel,
block_until_ready does not wait and dispatch+sync costs ~28.6 ms/call,
which is subtracted).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import time

import numpy as np

BASELINE_GNNZ_S = 0.61  # reference SpMV on 20-core Xeon (BASELINE.md)
ITERS = 60
SYNC_FLOOR_S = 0.0286
PLAN_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".bench_plan.npz")


def _time_chained(fn, *args):
    """Wall time per iteration of an ITERS-chained jitted loop."""
    import jax.numpy as jnp
    y = fn(*args)
    _ = float(np.asarray(jnp.sum(y)))          # compile + warm
    best = np.inf
    for _i in range(3):     # per-op minimum (same policy as REF_1CORE)
        t0 = time.perf_counter()
        y = fn(*args)
        _ = float(np.asarray(jnp.sum(y)))
        best = min(best, time.perf_counter() - t0)
    return max(best - SYNC_FLOOR_S, 1e-9) / ITERS


def _route_tier(S, n):
    import jax
    import jax.numpy as jnp
    from graphblas_tpu.kernels import spmv_route as SPRT

    t0 = time.perf_counter()
    plan = None
    plan_cold = True
    if os.path.exists(PLAN_CACHE):
        try:
            plan = SPRT.load_plan(PLAN_CACHE)
            if plan.m != n or plan.nnz_total != S.nnz \
                    or not plan.has_exact:      # pre-exact-reduce format
                plan = None
            else:
                plan_cold = False
        except Exception:
            plan = None
    if plan is None:
        plan = SPRT.build_plan(S.indptr, S.indices, S.data, (n, n))
        try:
            SPRT.save_plan(plan, PLAN_CACHE)
        except Exception:
            pass
    plan_s = time.perf_counter() - t0
    plan = SPRT.plan_to_device(plan)

    scale = jnp.float32(1.0 / 16)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray((rng.standard_normal(n) * 1e-3).astype(np.float32))
    want = S.astype(np.float64) @ np.asarray(x0).astype(np.float64)

    def _measure(legacy):
        @jax.jit
        def chained(v, pln):
            def body(i, acc):
                return SPRT.spmv_route(acc, pln,
                                       force_legacy=legacy) * scale
            return jax.lax.fori_loop(0, ITERS, body, v)

        dt = _time_chained(chained, x0, plan)
        # correctness guard: a silently wrong kernel must not report
        y = np.asarray(jax.jit(
            lambda v, p: SPRT.spmv_route(v, p, force_legacy=legacy))(
                x0, plan))
        err = np.abs(y - want).max() / (np.abs(want).max() + 1e-30)
        if not (err < 1e-4):
            raise RuntimeError(f"route kernel relerr {err}")
        return dt, float(err)

    try:
        dt, err = _measure(False)     # fused gather + exact reduce
        mode = "fused-exact"
    except Exception:
        # Mosaic/compile regression in the newer kernels: fall back to
        # the hardware-proven unfused + global-cumsum executor rather
        # than dropping all the way to the one-hot tier
        dt, err = _measure(True)
        mode = "legacy"
    return dt, plan_s, plan_cold, err, mode


def _onehot_tier(S, n):
    import jax
    import jax.numpy as jnp
    import graphblas_tpu as gb
    from graphblas_tpu.kernels import spmv_onehot as OH
    A = gb.Matrix.from_scipy(S)
    Ar = A.to_orient(gb.ROW)
    p = OH.plan_for(Ar.indptr, Ar.indices, Ar.values, (n, n))
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal(n).astype(np.float32)
    xpad = np.zeros(p.nc * OH.STRIP, np.float32)
    xpad[:n] = x0
    scale = np.float32(1.0 / 16)
    with jax.enable_x64(False):
        x2 = jnp.asarray(xpad.reshape(p.nc * 64, 128))

        @jax.jit
        def chained(rc, cenc, renc, val, x2):
            def body(i, x2):
                y = OH._run_inner(rc, cenc, renc, val, x2,
                                  p.cap, p.nr, p.nc, p.nchunks)
                return y * scale
            return jax.lax.fori_loop(0, ITERS, body, x2)

        return _time_chained(chained, p.rc, p.cenc, p.renc, p.val, x2)


def _xla_tier(S, n):
    import jax
    import jax.numpy as jnp
    import graphblas_tpu as gb
    from graphblas_tpu.ops.mxm import spmv_arrays
    gb.set_option("pallas_enabled", False)
    A = gb.Matrix.from_scipy(S)
    Ar = A.to_orient(gb.ROW)
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal(n)
                     .astype(np.float32))

    @jax.jit
    def chained(ip, ix, v, x):
        def body(i, x):
            return spmv_arrays(ip, ix, v, x, n) * jnp.float32(1.0 / 16)
        return jax.lax.fori_loop(0, 5, body, x)

    y = chained(Ar.indptr, Ar.indices, Ar.values, x0)
    _ = float(np.asarray(jnp.sum(y)))
    t0 = time.perf_counter()
    y = chained(Ar.indptr, Ar.indices, Ar.values, x0)
    _ = float(np.asarray(jnp.sum(y)))
    return (time.perf_counter() - t0 - SYNC_FLOOR_S) / 5


def main():
    import graphblas_tpu as gb
    gb.init()

    n = 1 << 20
    deg = 16
    rng = np.random.default_rng(0)
    rows = rng.integers(0, n, n * deg).astype(np.int32)
    cols = rng.integers(0, n, n * deg).astype(np.int32)
    import scipy.sparse as sps
    S = sps.csr_matrix((np.ones(n * deg, np.float32), (rows, cols)),
                       shape=(n, n))
    S.sum_duplicates()
    nnz = S.nnz

    # cold vs warm dispatch: the persistent-compilation-cache payoff
    # (reference analog: PreJIT kernels skipping the JIT compile,
    # Source/GB_jitifyer.c).  Cold = first jit of a tiny probe fn this
    # process (cache-dir hit if a previous run populated it), warm = the
    # executable-cache hit path.
    import jax
    import jax.numpy as jnp
    # two independent probes, MIN taken: the remote compile helper
    # stalls nondeterministically (observed 3 s-500 s for the SAME tiny
    # kernel), and a single stall is the helper's latency, not this
    # framework's dispatch cost
    xp = jnp.ones(1024, jnp.float32)
    colds = []
    for k in (2.0, 3.0):
        probe = jax.jit(lambda v, _k=k: jnp.cumsum(v * _k) + _k)
        t0 = time.perf_counter()
        _ = float(np.asarray(jnp.sum(probe(xp))))
        colds.append(time.perf_counter() - t0)
    dispatch_cold_s = min(colds)
    t0 = time.perf_counter()
    _ = float(np.asarray(jnp.sum(probe(xp))))
    dispatch_warm_s = time.perf_counter() - t0

    extras = {}
    try:
        dt, plan_s, plan_cold, err, mode = _route_tier(S, n)
        extras = {"kernel": "spmv_route", "plan_build_s": round(plan_s, 1),
                  "plan_cold": plan_cold, "relerr": err,
                  "route_mode": mode}
    except Exception:
        try:
            dt = _onehot_tier(S, n)
            extras = {"kernel": "spmv_onehot"}
        except Exception:
            dt = _xla_tier(S, n)
            extras = {"kernel": "xla_substrate"}

    gnnz = nnz / dt / 1e9
    # HBM roofline: ideal CSR streaming (4B val + 4B idx + x gather ~4B
    # amortized) at 819 GB/s
    ideal_s = nnz * 12 / 819e9
    print(json.dumps({
        "metric": "spmv_plus_times_fp32_gnnz_per_s",
        "value": round(gnnz, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(gnnz / BASELINE_GNNZ_S, 3),
        "roofline_frac": round(ideal_s / dt, 4),
        "dispatch_cold_s": round(dispatch_cold_s, 3),
        "dispatch_warm_s": round(dispatch_warm_s, 3),
        **extras,
    }))


if __name__ == "__main__":
    main()
