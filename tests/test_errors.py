"""Error-path sweep (VERDICT r1 #7; reference analog: the malloc_debug
fault-injection coverage of every error path, Source/GB_Global.c:83-93 —
here the error surface is exceptions, so the sweep drives each one)."""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu.core import errors as E
from graphblas_tpu.core import semiring as SR
from graphblas_tpu.core import types as T


@pytest.fixture
def A(rng):
    return gb.Matrix.from_coo([0, 1, 2], [1, 2, 0], [1.0, 2.0, 3.0], (3, 3))


def test_dimension_mismatch_mxm(A):
    B = gb.Matrix.from_coo([0], [0], [1.0], (4, 4))
    with pytest.raises(E.DimensionMismatch):
        gb.mxm(A, B, SR.PLUS_TIMES)


def test_dimension_mismatch_mxv(A):
    v = gb.Vector.from_dense(np.ones(5))
    with pytest.raises(E.DimensionMismatch):
        gb.mxv(A, v, SR.PLUS_TIMES)


def test_dimension_mismatch_ewise(A):
    B = gb.Matrix.from_coo([0], [0], [1.0], (2, 3))
    with pytest.raises(E.DimensionMismatch):
        gb.ewise_add(A, B, gb.operators.PLUS)


def test_dimension_mismatch_c_target(A):
    C = gb.Matrix.new(A.dtype, 5, 5)
    with pytest.raises(E.DimensionMismatch):
        gb.mxm(A, A, SR.PLUS_TIMES, C=C)


def test_out_of_range_build():
    with pytest.raises(E.IndexOutOfBounds):
        gb.Matrix.from_coo([0, 7], [0, 0], [1.0, 2.0], (3, 3))


def test_out_of_range_set_element(A):
    with pytest.raises(E.IndexOutOfBounds):
        A.set_element(9, 0, 1.0)


def test_extract_element_absent(A):
    with pytest.raises(E.NoValue):
        A.extract_element(0, 0)


def test_invalid_format_conversion_full(A):
    # 3 entries in a 3x3: cannot be FULL
    with pytest.raises(E.InvalidValue):
        A.to_format(gb.FULL)


def test_unknown_matrix_option(A):
    with pytest.raises(E.InvalidValue):
        A.set("no_such_option", 1)
    with pytest.raises(E.InvalidValue):
        A.get("no_such_option")


def test_bad_sparsity_control(A):
    with pytest.raises(E.InvalidValue):
        A.set("sparsity_control", "sparse+bogus")


def test_unknown_global_option():
    with pytest.raises(KeyError):
        gb.set_option("no_such_global", 1)


def test_empty_matrix_ops_roundtrip():
    Z = gb.Matrix.new(T.FP64, 4, 4)
    y = gb.mxv(Z, gb.Vector.from_dense(np.ones(4)), SR.PLUS_TIMES)
    assert y.nvals == 0
    C = gb.ewise_add(Z, Z, gb.operators.PLUS)
    assert C.nvals == 0
    from graphblas_tpu.core import monoid as MON
    assert float(gb.reduce_scalar(Z, MON.PLUS)) == 0.0


def test_empty_dimension_matrix():
    Z = gb.Matrix.new(T.FP64, 0, 5)
    assert Z.nvals == 0
    Ct = gb.transpose(Z)
    assert Ct.shape == (5, 0)


def test_struct_cast_guard():
    st = T.struct_type("errpair", np.float32, (2,))
    with pytest.raises(E.DomainMismatch):
        T.cast(np.ones((3,)), st)


def test_check_detects_corruption(A):
    import jax.numpy as jnp
    B = A.dup()
    B.indices = jnp.asarray(np.array([5, 9, 9], np.int64))  # out of range
    with pytest.raises(E.InvalidObject):
        B.check()


def test_vector_matrix_shape_guard():
    with pytest.raises(Exception):
        gb.Vector((3, 2), T.FP64)  # vectors are n x 1 only
