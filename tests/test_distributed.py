"""Distributed layer tests on the 8-virtual-device CPU mesh (SURVEY.md §4
point 7: multi-chip logic must run in CI without TPUs)."""

import jax
import numpy as np
import pytest
import scipy.sparse as sps
import scipy.sparse.csgraph as csg

import graphblas_tpu as gb
from graphblas_tpu import parallel as par
from graphblas_tpu.core import semiring as sr

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return par.make_mesh(8)


def random_graph(rng, n, avg_deg=5, directed=True):
    nnz = n * avg_deg
    r = rng.integers(0, n, nnz)
    c = rng.integers(0, n, nnz)
    keep = r != c
    S = sps.csr_matrix((rng.standard_normal(keep.sum()),
                        (r[keep], c[keep])), shape=(n, n))
    if not directed:
        S = S + S.T
    S.sum_duplicates()
    return S


def test_dist_partition_roundtrip(rng, mesh):
    S = random_graph(rng, 100)
    A = gb.Matrix.from_scipy(S)
    D = par.DistMatrix.from_matrix(A, mesh)
    assert D.ndev == 8
    # reassemble
    total = int(np.sum(np.asarray(D.nnz)))
    assert total == S.nnz


def test_dist_mxv_plus_times(rng, mesh):
    S = random_graph(rng, 120)
    A = gb.Matrix.from_scipy(S)
    D = par.DistMatrix.from_matrix(A, mesh)
    x = rng.standard_normal(120)
    got = np.asarray(par.dist_mxv(D, x))
    want = S @ x
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_dist_mxv_min_plus(rng, mesh):
    S = random_graph(rng, 60)
    S.data[:] = np.abs(S.data)
    A = gb.Matrix.from_scipy(S)
    D = par.DistMatrix.from_matrix(A, mesh)
    x = np.abs(rng.standard_normal(60))
    got = np.asarray(par.dist_mxv(D, x, sr.MIN_PLUS))
    d = S.toarray()
    want = np.full(60, np.inf)
    for i in range(60):
        for k in range(60):
            if d[i, k] != 0:
                want[i] = min(want[i], d[i, k] + x[k])
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_dist_vxm(rng, mesh):
    S = random_graph(rng, 90)
    A = gb.Matrix.from_scipy(S)
    D = par.DistMatrix.from_matrix(A, mesh)
    x = rng.standard_normal(90)
    got = np.asarray(par.dist_vxm(D, x))
    want = S.T @ x
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_dist_reduce(rng, mesh):
    S = random_graph(rng, 70)
    A = gb.Matrix.from_scipy(S)
    D = par.DistMatrix.from_matrix(A, mesh)
    got = float(par.dist_reduce_scalar(D))
    np.testing.assert_allclose(got, S.data.sum(), rtol=1e-10)


def test_dist_bfs(rng, mesh):
    S = random_graph(rng, 100, avg_deg=4, directed=False)
    S.data[:] = 1
    A = gb.Matrix.from_scipy(S)
    D = par.DistMatrix.from_matrix(A, mesh)
    got = np.asarray(par.dist_bfs_levels(D, 0))
    dist = csg.shortest_path(S, unweighted=True, indices=0)
    want = np.where(np.isfinite(dist), dist, -1).astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_dist_pagerank(rng, mesh):
    S = random_graph(rng, 96)
    S.data[:] = 1
    A = gb.Matrix.from_scipy(S)
    D = par.DistMatrix.from_matrix(A, mesh)
    got = np.asarray(par.dist_pagerank(D, tol=1e-10, max_iter=200))
    # single-chip fused reference
    from graphblas_tpu.algorithms import pagerank_fused
    want, _ = pagerank_fused(A, tol=1e-10, max_iter=200)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-8)


def test_dist_matches_grb_layer(rng, mesh):
    # distributed result == single-device op-layer result, bit-compat check
    S = random_graph(rng, 64)
    A = gb.Matrix.from_scipy(S)
    D = par.DistMatrix.from_matrix(A, mesh)
    x = rng.standard_normal(64)
    u = gb.Vector.from_dense(x)
    got = np.asarray(par.dist_mxv(D, x))
    w = gb.mxv(A, u, sr.PLUS_TIMES)
    wv, wp = w.to_dense_1d()
    np.testing.assert_allclose(got[np.asarray(wp)],
                               np.asarray(wv)[np.asarray(wp)], rtol=1e-10)


def test_dist_mxm_matches_local(rng):
    import scipy.sparse as sps
    import graphblas_tpu as gb
    from graphblas_tpu import parallel as par

    n = 96
    A = sps.random(n, n, density=0.08, random_state=np.random.RandomState(1),
                   format="csr", dtype=np.float64)
    B = sps.random(n, n, density=0.08, random_state=np.random.RandomState(2),
                   format="csr", dtype=np.float64)
    mesh = par.make_mesh(8)
    DA = par.DistMatrix.from_matrix(gb.Matrix.from_scipy(A), mesh)
    DB = par.DistMatrix.from_matrix(gb.Matrix.from_scipy(B), mesh)
    DC = par.dist_mxm(DA, DB)
    # gather result back and compare against scipy
    got = np.zeros((n, n))
    ip = np.asarray(DC.indptr)
    ix = np.asarray(DC.indices)
    vl = np.asarray(DC.values)
    nz = np.asarray(DC.nnz)
    for d in range(DC.ndev):
        r0 = d * DC.rows_per
        cnt = int(nz[d])
        rows = np.repeat(np.arange(ip.shape[1] - 1), np.diff(ip[d]))
        got[r0 + rows[:cnt], ix[d, :cnt]] = vl[d, :cnt]
    want = (A @ B).toarray()
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_sharded_checkpoint_roundtrip(tmp_path, rng):
    import scipy.sparse as sps
    import graphblas_tpu as gb
    from graphblas_tpu import parallel as par

    n = 64
    A = sps.random(n, n, density=0.1, random_state=np.random.RandomState(3),
                   format="csr", dtype=np.float32)
    mesh = par.make_mesh(8)
    D = par.DistMatrix.from_matrix(gb.Matrix.from_scipy(A), mesh)
    par.save_sharded(D, tmp_path / "ckpt")
    D2 = par.load_sharded(tmp_path / "ckpt", mesh)
    x = np.ones(n, np.float32)
    y1 = np.asarray(par.dist_mxv(D, x))
    y2 = np.asarray(par.dist_mxv(D2, x))
    np.testing.assert_allclose(y1, y2)


def test_dist_mxv_2d(rng):
    import scipy.sparse as sps
    import graphblas_tpu as gb
    from graphblas_tpu import parallel as par

    n = 100
    S = sps.random(n, n, density=0.08, random_state=np.random.RandomState(4),
                   format="csr", dtype=np.float64)
    mesh = par.make_mesh_2d(2, 4)
    D2 = par.DistMatrix2D.from_matrix(gb.Matrix.from_scipy(S), mesh)
    x = rng.standard_normal(n)
    got = par.dist_mxv_2d(D2, x)
    np.testing.assert_allclose(got, S @ x, rtol=1e-12)


def test_dist_mxv_2d_minplus(rng):
    import scipy.sparse as sps
    import graphblas_tpu as gb
    from graphblas_tpu import parallel as par
    from graphblas_tpu.core import semiring as SR

    n = 60
    S = sps.random(n, n, density=0.1, random_state=np.random.RandomState(8),
                   format="csr", dtype=np.float64)
    S.data = np.abs(S.data)
    mesh = par.make_mesh_2d(4, 2)
    D2 = par.DistMatrix2D.from_matrix(gb.Matrix.from_scipy(S), mesh)
    x = np.abs(rng.standard_normal(n))
    got = par.dist_mxv_2d(D2, x, SR.MIN_PLUS)
    dense = S.toarray()
    want = np.where((dense > 0).any(axis=1),
                    np.where(dense > 0, dense + x[None, :], np.inf).min(axis=1),
                    np.inf)
    # rows with no entries reduce to +inf identity in both
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_dist_mxv_mask_accum(rng, mesh):
    S = random_graph(rng, 100)
    A = gb.Matrix.from_scipy(S)
    D = par.DistMatrix.from_matrix(A, mesh)
    x = rng.standard_normal(100)
    c = rng.standard_normal(100)
    m = rng.random(100) < 0.5
    from graphblas_tpu.core import ops as OPS
    got = np.asarray(par.dist_mxv(D, x, mask=m, accum=OPS.PLUS, c=c))
    want = np.where(m, c + S @ x, c)
    np.testing.assert_allclose(got, want, rtol=1e-10)
    # complemented mask, no accum
    got2 = np.asarray(par.dist_mxv(D, x, mask=m, c=c, mask_complement=True))
    want2 = np.where(~m, S @ x, c)
    np.testing.assert_allclose(got2, want2, rtol=1e-10)


def test_dist_vxm_mask_accum(rng, mesh):
    S = random_graph(rng, 90)
    A = gb.Matrix.from_scipy(S)
    D = par.DistMatrix.from_matrix(A, mesh)
    x = rng.standard_normal(90)
    c = rng.standard_normal(90)
    m = rng.random(90) < 0.4
    from graphblas_tpu.core import ops as OPS
    got = np.asarray(par.dist_vxm(D, x, mask=m, accum=OPS.PLUS, c=c))
    want = np.where(m, c + S.T @ x, c)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_dist_positional_firsti(rng, mesh):
    """FIRSTI over min monoid: y[i] = min over present k of i (= i when the
    row is nonempty) — checks the global row offset is applied."""
    S = random_graph(rng, 80)
    A = gb.Matrix.from_scipy(S)
    D = par.DistMatrix.from_matrix(A, mesh)
    x = np.ones(80)
    from graphblas_tpu.core import names as N
    srp = N.lookup("GxB_MIN_FIRSTI_INT32")
    got = np.asarray(par.dist_mxv(D, x, sr=srp, out_dtype=np.int32))
    rows_nonempty = np.diff(S.indptr) > 0
    want = np.where(rows_nonempty, np.arange(80), np.iinfo(np.int32).max)
    np.testing.assert_array_equal(got[rows_nonempty],
                                  want[rows_nonempty])


def test_dist_bfs_sparse_frontier_matches(rng, mesh):
    S = random_graph(rng, 150, avg_deg=3)
    A = gb.Matrix.from_scipy(S)
    D = par.DistMatrix.from_matrix(A, mesh)
    dense = np.asarray(par.dist_bfs_levels(D, 0, frontier_cap=1))
    # frontier_cap=1 forces the dense fallback nearly always; a large cap
    # keeps every level on the compressed path — results must agree
    sparse = np.asarray(par.dist_bfs_levels(D, 0, frontier_cap=4096))
    np.testing.assert_array_equal(dense, sparse)


def test_dist_mxm_device_resident(rng, mesh):
    """dist_mxm output stays sharded (no host assembly): check the CSR
    shards directly against scipy."""
    import scipy.sparse as sps
    n = 64
    A = sps.random(n, n, density=0.08, random_state=np.random.RandomState(3),
                   format="csr", dtype=np.float64)
    DA = par.DistMatrix.from_matrix(gb.Matrix.from_scipy(A), mesh)
    DC = par.dist_mxm(DA, DA)
    want = (A @ A).toarray()
    got = np.zeros((n, n))
    ip = np.asarray(DC.indptr)
    ix = np.asarray(DC.indices)
    vl = np.asarray(DC.values)
    nz = np.asarray(DC.nnz)
    for d in range(DC.ndev):
        r0 = d * DC.rows_per
        cnt = int(nz[d])
        rows = np.repeat(np.arange(ip.shape[1] - 1), np.diff(ip[d]))
        got[r0 + rows[:cnt], ix[d, :cnt]] = vl[d, :cnt]
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_dist_vxm_times_monoid(rng, mesh):
    """A TIMES add-monoid must combine correctly across devices — the
    round-2 _combine_axis silently used pmax for non-PLUS/MIN monoids."""
    from graphblas_tpu.core import semiring as SRM
    from graphblas_tpu.core import monoid as MON
    from graphblas_tpu.core import ops as OPS

    n = 64
    S = random_graph(rng, n)
    S.data[:] = 1.0 + 0.01 * rng.standard_normal(S.nnz)
    A = gb.Matrix.from_scipy(S)
    D = par.DistMatrix.from_matrix(A, mesh)
    x = 1.0 + 0.01 * rng.standard_normal(n)
    times_plus = SRM.Semiring(MON.TIMES, OPS.PLUS)
    got = np.asarray(par.dist_vxm(D, x, times_plus))
    d = S.toarray()
    want = np.ones(n)
    for j in range(n):
        for i in range(n):
            if d[i, j] != 0:
                want[j] *= x[i] + d[i, j]
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_dist_mxv_2d_times_monoid(rng):
    from graphblas_tpu.core import semiring as SRM
    from graphblas_tpu.core import monoid as MON
    from graphblas_tpu.core import ops as OPS

    n = 48
    S = random_graph(rng, n)
    S.data[:] = 1.0 + 0.01 * rng.standard_normal(S.nnz)
    A = gb.Matrix.from_scipy(S)
    mesh2 = par.make_mesh_2d(4, 2)
    D2 = par.DistMatrix2D.from_matrix(A, mesh2)
    x = 1.0 + 0.01 * rng.standard_normal(n)
    times_plus = SRM.Semiring(MON.TIMES, OPS.PLUS)
    got = np.asarray(par.dist_mxv_2d(D2, x, times_plus))
    d = S.toarray()
    want = np.ones(n)
    for i in range(n):
        for k in range(n):
            if d[i, k] != 0:
                want[i] *= d[i, k] + x[k]
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_dist_mxm_hub_skew(rng):
    """Power-law-ish input: one shard owns a hub row whose flop count
    dwarfs the rest.  The chunked expansion must stay correct (round-2
    judge finding: max-over-shards capacity OOMs the mesh)."""
    n = 96
    A = sps.random(n, n, density=0.05, random_state=np.random.RandomState(3),
                   format="csr", dtype=np.float64).tolil()
    A[5, :] = 1.0                        # hub row -> flops ~ n * avg_deg
    A = A.tocsr()
    B = sps.random(n, n, density=0.08, random_state=np.random.RandomState(4),
                   format="csr", dtype=np.float64)
    mesh = par.make_mesh(8)
    DA = par.DistMatrix.from_matrix(gb.Matrix.from_scipy(A), mesh)
    DB = par.DistMatrix.from_matrix(gb.Matrix.from_scipy(B), mesh)
    DC = par.dist_mxm(DA, DB)
    got = np.zeros((n, n))
    ip = np.asarray(DC.indptr)
    ix = np.asarray(DC.indices)
    vl = np.asarray(DC.values)
    nz = np.asarray(DC.nnz)
    for d in range(DC.ndev):
        r0 = d * DC.rows_per
        cnt = int(nz[d])
        rows = np.repeat(np.arange(ip.shape[1] - 1), np.diff(ip[d]))
        got[r0 + rows[:cnt], ix[d, :cnt]] = vl[d, :cnt]
    want = (A @ B).toarray()
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_dist_mxv_overlap_ring(rng, mesh):
    """Ring-overlap path (ppermute double-buffer) matches the all_gather
    path and the scipy oracle, for PLUS_TIMES and a MIN add monoid."""
    S = random_graph(rng, 130)
    A = gb.Matrix.from_scipy(S)
    D = par.DistMatrix.from_matrix(A, mesh)
    x = rng.standard_normal(130)
    got = np.asarray(par.dist_mxv(D, x, overlap=True))
    np.testing.assert_allclose(got, S @ x, rtol=1e-10)
    base = np.asarray(par.dist_mxv(D, x))
    np.testing.assert_allclose(got, base, rtol=1e-12)
    # MIN_PLUS: the select-update product accumulation is monoid-free,
    # so a non-PLUS monoid must come out exact too
    S2 = random_graph(rng, 60)
    S2.data[:] = np.abs(S2.data)
    D2 = par.DistMatrix.from_matrix(gb.Matrix.from_scipy(S2), mesh)
    x2 = np.abs(rng.standard_normal(60))
    got2 = np.asarray(par.dist_mxv(D2, x2, sr.MIN_PLUS, overlap=True))
    want2 = np.asarray(par.dist_mxv(D2, x2, sr.MIN_PLUS))
    np.testing.assert_allclose(got2, want2, rtol=1e-12)


def test_dist_mxv_overlap_mask_accum(rng, mesh):
    from graphblas_tpu.core import ops as OPS
    S = random_graph(rng, 96)
    D = par.DistMatrix.from_matrix(gb.Matrix.from_scipy(S), mesh)
    x = rng.standard_normal(96)
    m = rng.integers(0, 2, 96).astype(bool)
    c = rng.standard_normal(96)
    got = np.asarray(par.dist_mxv(D, x, mask=m, accum=OPS.PLUS, c=c,
                                  overlap=True))
    want = np.asarray(par.dist_mxv(D, x, mask=m, accum=OPS.PLUS, c=c))
    np.testing.assert_allclose(got, want, rtol=1e-12)
