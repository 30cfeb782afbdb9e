"""Targeted tests for branches the differential sweeps skirt (found by
the Tcov harness's missing-line dump, tools/coverage_tcov.py with
GBTPU_COV_MISSING=1): dense-format positional/index apply, pack/unpack
move semantics, hyper direct element lookup, dense resize, matrix-reduce
special monoids, and positional eWise ops."""

import numpy as np
import pytest
import scipy.sparse as sps

import jax.numpy as jnp

import graphblas_tpu as gb
from graphblas_tpu.core import monoid as MON
from graphblas_tpu.core import types as T
from graphblas_tpu.core import errors as E


def _rand(rng, m=8, n=8, density=0.4, fmt=None):
    S = sps.random(m, n, density, format="csr", dtype=np.float32,
                   random_state=np.random.RandomState(rng.integers(1 << 30)))
    A = gb.Matrix.from_scipy(S)
    if fmt is not None:
        A = A.to_format(fmt)
    return A, S.tocsr()


# ---------------------------------------------------------------------------
# apply: positional / indexop on dense formats, bind variants
# ---------------------------------------------------------------------------

def test_apply_positional_on_bitmap(rng):
    """Positional binary ops in apply read the entry's indices, ignoring
    any bound scalar (reference: GB_apply_op.c positional opcodes)."""
    A, S = _rand(rng, fmt=gb.BITMAP)
    C = gb.apply(A, gb.operators.FIRSTI, bind=("first", 0))
    got = C.to_scipy().tocoo()
    np.testing.assert_array_equal(got.data, got.row)
    # unary positional (POSITIONI1) on the sparse format, no bind at all
    As = A.to_format(gb.SPARSE)
    C2 = gb.apply(As, gb.operators.POSITIONI1)
    got2 = C2.to_scipy().tocoo()
    np.testing.assert_array_equal(got2.data, got2.row + 1)


def test_apply_indexop_on_full(rng):
    dense = np.arange(12, dtype=np.float32).reshape(3, 4) + 1
    A = gb.Matrix.from_dense(dense)
    C = gb.apply(A, gb.operators.ROWINDEX, thunk=10)
    np.testing.assert_array_equal(
        np.asarray(C.values), np.broadcast_to(
            np.arange(3)[:, None] + 10, (3, 4)).astype(np.float32))


def test_apply_bind_second_and_errors(rng):
    A, S = _rand(rng)
    C = gb.apply(A, gb.operators.MINUS, bind=("second", 2.0))
    ref = S.copy()
    ref.data = ref.data - 2.0
    assert abs(C.to_scipy() - ref).max() < 1e-6
    with pytest.raises(E.InvalidValue):
        gb.apply(A, gb.operators.MINUS)          # binary apply needs bind
    with pytest.raises(E.InvalidValue):
        gb.apply(A, object())                    # not an operator


# ---------------------------------------------------------------------------
# serialize: pack/unpack move semantics + gbz codec
# ---------------------------------------------------------------------------

def test_pack_unpack_move_semantics(rng):
    from graphblas_tpu.ops import serialize as ser
    A, S = _rand(rng)
    meta, arrays = ser.unpack(A)
    assert A.nvals == 0                          # surrendered
    B = ser.pack(meta["shape"], meta["dtype"], meta["format"],
                 meta["orient"], indptr=arrays["indptr"],
                 indices=arrays["indices"], values=arrays["values"],
                 iso=meta["iso"])                # secure mode validates
    assert (B.to_scipy() != S).nnz == 0


def test_pack_secure_rejects_garbage():
    from graphblas_tpu.ops import serialize as ser
    with pytest.raises(Exception):
        ser.pack((2, 2), T.FP32, gb.SPARSE, gb.ROW,
                 indptr=jnp.asarray([0, 5, 9]),   # counts exceed indices
                 indices=jnp.asarray([0]), values=jnp.asarray([1.0]))


def test_serialize_gbz_codec(rng):
    from graphblas_tpu.ops import serialize as ser
    A, S = _rand(rng, 16, 16, 0.3)
    blob = ser.serialize(A, compression="gbz", level=2)
    assert ser.serialized_get(blob)["compression"] == "gbz"
    B = ser.deserialize(blob)
    assert (B.to_scipy() != S).nnz == 0


# ---------------------------------------------------------------------------
# element ops: hyper direct lookup, is_stored on dense formats
# ---------------------------------------------------------------------------

def test_hyper_element_lookup(rng):
    S = sps.csr_matrix((np.array([3.0, 4.0], np.float32),
                        (np.array([2, 900]), np.array([5, 7]))),
                       shape=(1000, 1000))
    A = gb.Matrix.from_scipy(S).to_format(gb.HYPER)
    assert A.fmt == gb.HYPER
    assert float(A.extract_element(2, 5)) == 3.0
    assert float(A.extract_element(900, 7)) == 4.0
    with pytest.raises(E.NoValue):
        A.extract_element(2, 6)                  # vec present, idx absent
    with pytest.raises(E.NoValue):
        A.extract_element(3, 5)                  # vec absent from hyperlist


def test_is_stored_dense_formats(rng):
    from graphblas_tpu.ops import element as EL
    dense = np.ones((3, 3), np.float32)
    F = gb.Matrix.from_dense(dense)
    assert EL.is_stored(F, 1, 1)
    A, S = _rand(rng, fmt=gb.BITMAP)
    i, j = S.nonzero()[0][0], S.nonzero()[1][0]
    assert EL.is_stored(A, int(i), int(j))
    with pytest.raises(E.InvalidIndex):
        EL.is_stored(A, 99, 0)


# ---------------------------------------------------------------------------
# resize / reshape
# ---------------------------------------------------------------------------

def test_resize_dense_grow_and_shrink(rng):
    dense = np.arange(6, dtype=np.float32).reshape(2, 3) + 1
    A = gb.Matrix.from_dense(dense)
    from graphblas_tpu.ops import resize as RS
    G = RS.resize(A, 4, 5)
    assert G.shape == (4, 5) and G.nvals == 6
    Sh = RS.resize(A, 1, 2)
    assert Sh.shape == (1, 2) and Sh.nvals == 2
    assert float(Sh.extract_element(0, 1)) == 2.0


def test_reshape_size_mismatch_raises(rng):
    A, _ = _rand(rng, 4, 4)
    from graphblas_tpu.ops import resize as RS
    with pytest.raises(E.DimensionMismatch):
        RS.reshape(A, 3, 3)


# ---------------------------------------------------------------------------
# matrix reduce: special monoids + accum
# ---------------------------------------------------------------------------

def test_reduce_vector_special_monoids(rng):
    S = sps.csr_matrix(np.array([[1.0, 0, 2.0], [0, 0, 0], [5.0, 3.0, 0]],
                                np.float32))
    A = gb.Matrix.from_scipy(S)
    mx = gb.reduce(A, MON.MAX)
    v, p = mx.to_dense_1d()
    assert float(v[0]) == 2.0 and float(v[2]) == 5.0
    Ab = gb.Matrix.from_scipy(sps.csr_matrix(
        np.array([[1, 0, 1], [0, 0, 0], [1, 1, 0]], np.bool_)))
    for mon, want0 in ((MON.LOR, True), (MON.LAND, True), (MON.LXOR, False),
                       (MON.ANY, True)):
        r = gb.reduce(Ab, mon)
        rv, rp = r.to_dense_1d()
        assert bool(rv[0]) == want0, mon.name


def test_reduce_max_ignores_nan():
    S = sps.csr_matrix(np.array([[np.nan, 2.0]], np.float32))
    A = gb.Matrix.from_scipy(S)
    r = gb.reduce(A, MON.MAX)
    v, _ = r.to_dense_1d()
    assert float(v[0]) == 2.0


def test_reduce_scalar_accum_init(rng):
    A, S = _rand(rng)
    r = gb.reduce_scalar(A, MON.PLUS, accum=gb.operators.PLUS, init=10.0)
    assert abs(float(r) - (10.0 + S.sum())) < 1e-4


# ---------------------------------------------------------------------------
# reference math semantics: integer division, bitshift, signum
# (reference: GB_math.h GB_idiv_*, GB_bitshift_*)
# ---------------------------------------------------------------------------

def test_int_div_by_zero_semantics():
    OPS = gb.operators
    x = jnp.asarray([0, 7, -7, 9], jnp.int32)
    y = jnp.asarray([0, 0, 0, 2], jnp.int32)
    got = np.asarray(OPS.DIV.fn(x, y))
    np.testing.assert_array_equal(
        got, [0, np.iinfo(np.int32).max, np.iinfo(np.int32).min, 4])
    xu = jnp.asarray([0, 7], jnp.uint8)
    yu = jnp.asarray([0, 0], jnp.uint8)
    np.testing.assert_array_equal(np.asarray(OPS.DIV.fn(xu, yu)), [0, 255])
    # C truncating (not floor) division for signed ints
    assert int(OPS.DIV.fn(jnp.int32(-7), jnp.int32(2))) == -3
    # floats follow IEEE
    assert np.isinf(float(OPS.DIV.fn(jnp.float32(1.0), jnp.float32(0.0))))


def test_bitshift_semantics():
    OPS = gb.operators
    x = jnp.asarray([1, -8, 1], jnp.int8)
    s = jnp.asarray([3, -2, 9], jnp.int8)     # left, arithmetic right, >=nbits
    got = np.asarray(OPS.BSHIFT.fn(x, s))
    np.testing.assert_array_equal(got, [8, -2, 0])
    xu = jnp.asarray([255, 255], jnp.uint8)
    su = jnp.asarray([-3, -8], jnp.int8)
    np.testing.assert_array_equal(
        np.asarray(OPS.BSHIFT.fn(xu, su)), [31, 0])


def test_signum_and_op_protocols():
    OPS = gb.operators
    assert int(OPS.SIGNUM(jnp.float32(-3.5))) == -1
    assert bool(OPS.SIGNUM(jnp.asarray(True)))       # bool passes through
    assert "SIGNUM" in repr(OPS.SIGNUM)
    assert "PLUS" in repr(OPS.PLUS)
    assert OPS.SIGNUM.out_type(T.FP32) is T.FP32
    assert "ROWINDEX" in repr(OPS.ROWINDEX)
    assert int(OPS.ROWINDEX(0.0, 3, 1, 2)) == 5      # i + thunk
    assert OPS.ROWINDEX.out_type(T.FP32) is T.INT64


# ---------------------------------------------------------------------------
# eWise positional ops
# ---------------------------------------------------------------------------

def test_ewise_positional_sparse_and_dense(rng):
    A, SA = _rand(rng)
    B, SB = _rand(rng)
    C = gb.ewise_add(A, B, gb.operators.FIRSTI, out_dtype=T.INT64)
    got = C.to_scipy().tocoo()
    np.testing.assert_array_equal(got.data, got.row)
    Ab = A.to_format(gb.BITMAP)
    Bb = B.to_format(gb.BITMAP)
    Cd = gb.ewise_add(Ab, Bb, gb.operators.FIRSTI, out_dtype=T.INT64)
    got2 = Cd.to_scipy().tocoo()
    np.testing.assert_array_equal(got2.data, got2.row)
