"""BFS / PageRank / triangle-count vs independent numpy/scipy oracles
(BASELINE.json configs 1-3)."""

import numpy as np
import pytest
import scipy.sparse as sps
import scipy.sparse.csgraph as csg

import graphblas_tpu as gb
from graphblas_tpu import algorithms as alg


def random_graph(rng, n, avg_deg=4, directed=False):
    nnz = n * avg_deg
    r = rng.integers(0, n, nnz)
    c = rng.integers(0, n, nnz)
    keep = r != c
    r, c = r[keep], c[keep]
    A = sps.csr_matrix((np.ones(len(r)), (r, c)), shape=(n, n))
    if not directed:
        A = A + A.T
    A.data[:] = 1.0
    A.sum_duplicates()
    return A


def test_bfs_levels(rng):
    S = random_graph(rng, 60)
    A = gb.Matrix.from_scipy(S.astype(bool))
    levels = alg.bfs_levels(A, 0)
    lv, lp = levels.to_dense_1d()
    dist = csg.shortest_path(S, unweighted=True, indices=0)
    want_reach = np.isfinite(dist)
    np.testing.assert_array_equal(np.asarray(lp), want_reach)
    np.testing.assert_array_equal(np.asarray(lv)[np.asarray(lp)],
                                  dist[want_reach].astype(np.int32))


def test_bfs_levels_fused(rng):
    S = random_graph(rng, 80)
    A = gb.Matrix.from_scipy(S.astype(bool))
    levels = np.asarray(alg.bfs_levels_fused(A, 0))
    dist = csg.shortest_path(S, unweighted=True, indices=0)
    want = np.where(np.isfinite(dist), dist, -1).astype(np.int32)
    np.testing.assert_array_equal(levels, want)


def test_bfs_parents(rng):
    S = random_graph(rng, 40)
    A = gb.Matrix.from_scipy(S.astype(bool))
    parents = alg.bfs_parents(A, 0)
    pv, pp = parents.to_dense_1d()
    dist = csg.shortest_path(S, unweighted=True, indices=0)
    reach = np.isfinite(dist)
    np.testing.assert_array_equal(np.asarray(pp), reach)
    # every parent must be a neighbor one level up
    pv = np.asarray(pv)
    d = S.toarray() != 0
    for v in range(1, 40):
        if reach[v]:
            p = int(pv[v])
            assert d[p, v]
            assert dist[p] == dist[v] - 1


def test_pagerank(rng):
    S = random_graph(rng, 50, directed=True)
    A = gb.Matrix.from_scipy(S)
    r = alg.pagerank(A, tol=1e-10, max_iter=200)
    rv, _ = r.to_dense_1d()
    want = _pagerank_oracle(S, tol=1e-10, max_iter=200)
    np.testing.assert_allclose(np.asarray(rv), want, rtol=1e-5, atol=1e-8)


def test_pagerank_fused(rng):
    S = random_graph(rng, 64, directed=True)
    A = gb.Matrix.from_scipy(S)
    rv, iters = alg.pagerank_fused(A, tol=1e-8, max_iter=200)
    want = _pagerank_oracle(S, tol=1e-10, max_iter=300)
    assert int(iters) > 2
    np.testing.assert_allclose(np.asarray(rv), want, rtol=1e-3, atol=1e-6)


def _pagerank_oracle(S, damping=0.85, tol=1e-10, max_iter=200):
    n = S.shape[0]
    deg = np.asarray(S.sum(axis=1)).ravel()
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        w = np.where(deg > 0, r / np.where(deg > 0, deg, 1), 0.0)
        rn = damping * (S.T @ w) + (1 - damping) / n
        rn += damping * r[deg == 0].sum() / n
        if np.abs(rn - r).sum() < tol:
            return rn
        r = rn
    return r


def test_triangle_count(rng):
    S = random_graph(rng, 40)
    A = gb.Matrix.from_scipy(S.astype(np.float64))
    got = alg.triangle_count(A)
    d = (S.toarray() != 0).astype(np.int64)
    np.fill_diagonal(d, 0)
    want = int(np.trace(d @ d @ d) // 6)
    assert got == want


def test_triangle_count_known():
    # complete graph K5: C(5,3) = 10 triangles
    d = np.ones((5, 5)) - np.eye(5)
    A = gb.Matrix.from_scipy(sps.csr_matrix(d))
    assert alg.triangle_count(A) == 10


def test_connected_components_vs_scipy(rng):
    import scipy.sparse as sps
    import scipy.sparse.csgraph as csg
    import graphblas_tpu as gb
    from graphblas_tpu.algorithms import graph as GA

    n = 200
    S = sps.random(n, n, density=0.01, random_state=np.random.RandomState(5),
                   format="csr")
    S = S + S.T  # undirected
    ncc, labels = csg.connected_components(S, directed=False)
    got = np.asarray(GA.connected_components(gb.Matrix.from_scipy(
        sps.csr_matrix(S))))
    # same partition: map each scipy label to our representative
    for lbl in range(ncc):
        reps = np.unique(got[labels == lbl])
        assert reps.shape[0] == 1, f"component {lbl} split: {reps}"
    assert np.unique(got).shape[0] == ncc


def test_sssp_vs_scipy(rng):
    import scipy.sparse as sps
    import scipy.sparse.csgraph as csg
    import graphblas_tpu as gb
    from graphblas_tpu.algorithms import graph as GA

    n = 120
    S = sps.random(n, n, density=0.05, random_state=np.random.RandomState(6),
                   format="csr")
    S.data = np.abs(S.data) + 0.1
    want = csg.dijkstra(S, indices=0)
    got = np.asarray(GA.sssp(gb.Matrix.from_scipy(S), 0))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_sssp_grb_tier(rng):
    import scipy.sparse as sps
    import scipy.sparse.csgraph as csg
    import graphblas_tpu as gb
    from graphblas_tpu.algorithms import graph as GA

    n = 40
    S = sps.random(n, n, density=0.12, random_state=np.random.RandomState(7),
                   format="csr")
    S.data = np.abs(S.data) + 0.1
    want = csg.dijkstra(S, indices=0)
    d = GA.sssp_grb(gb.Matrix.from_scipy(S), 0)
    dv, dp = d.to_dense_1d()
    got = np.where(np.asarray(dp), np.asarray(dv), np.inf)
    np.testing.assert_allclose(got, want, rtol=1e-12)
