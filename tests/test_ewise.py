"""Differential tests: eWiseAdd/Mult/Union, apply, select, reduce,
transpose — library vs spec oracle, swept over types x formats x masks x
descriptors (the reference's test strategy, SURVEY.md §4)."""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import operators as ops
from graphblas_tpu.core import monoid as mon
from graphblas_tpu.core.descriptor import NULL, Descriptor
from graphblas_tpu.spec import oracle as spec

from harness import assert_matches, random_gb, random_mask

FMTS = [gb.SPARSE, gb.BITMAP]


@pytest.mark.parametrize("op,name", [(ops.PLUS, "plus"), (ops.TIMES, "times"),
                                     (ops.MINUS, "minus"), (ops.MIN, "min"),
                                     (ops.LOR, "lor")])
@pytest.mark.parametrize("fmt", FMTS)
def test_ewise_add_ops(rng, op, name, fmt):
    A, sA = random_gb(rng, 9, 7, 0.3, fmt=fmt)
    B, sB = random_gb(rng, 9, 7, 0.3, fmt=fmt)
    got = gb.ewise_add(A, B, op)
    want = spec.spec_ewise_add(spec.SpecMat.empty((9, 7), np.float64),
                               None, None, op, sA, sB)
    assert_matches(got, want, msg=f"add {name} {fmt}")


@pytest.mark.parametrize("fmt", FMTS)
def test_ewise_mult(rng, fmt):
    A, sA = random_gb(rng, 8, 8, 0.4, fmt=fmt)
    B, sB = random_gb(rng, 8, 8, 0.4, fmt=fmt)
    got = gb.ewise_mult(A, B, ops.TIMES)
    want = spec.spec_ewise_mult(spec.SpecMat.empty((8, 8), np.float64),
                                None, None, ops.TIMES, sA, sB)
    assert_matches(got, want)


def test_ewise_union(rng):
    A, sA = random_gb(rng, 6, 6, 0.3)
    B, sB = random_gb(rng, 6, 6, 0.3)
    got = gb.ewise_union(A, 10.0, B, -10.0, ops.PLUS)
    want = spec.spec_ewise_union(spec.SpecMat.empty((6, 6), np.float64),
                                 None, None, ops.PLUS, sA, 10.0, sB, -10.0)
    assert_matches(got, want)


@pytest.mark.parametrize("dtype", [np.int32, np.float32, np.bool_])
def test_ewise_add_dtypes(rng, dtype):
    A, sA = random_gb(rng, 7, 5, 0.4, dtype=dtype)
    B, sB = random_gb(rng, 7, 5, 0.4, dtype=dtype)
    op = ops.LOR if dtype == np.bool_ else ops.PLUS
    got = gb.ewise_add(A, B, op)
    want = spec.spec_ewise_add(spec.SpecMat.empty((7, 5), dtype), None, None,
                               op, sA, sB)
    assert_matches(got, want)


@pytest.mark.parametrize("replace", [False, True])
@pytest.mark.parametrize("comp", [False, True])
@pytest.mark.parametrize("structure", [False, True])
@pytest.mark.parametrize("maskfmt", [gb.SPARSE, gb.BITMAP])
def test_ewise_add_masked_accum(rng, replace, comp, structure, maskfmt):
    desc = Descriptor(replace=replace, mask_complement=comp,
                      mask_structure=structure)
    A, sA = random_gb(rng, 8, 6, 0.3)
    B, sB = random_gb(rng, 8, 6, 0.3)
    C, sC = random_gb(rng, 8, 6, 0.3)
    M, sM = random_mask(rng, 8, 6, 0.5, fmt=maskfmt)
    got = gb.ewise_add(A, B, ops.PLUS, C=C.dup(), mask=M, accum=ops.PLUS,
                       desc=desc)
    want = spec.spec_ewise_add(sC, sM, ops.PLUS, ops.PLUS, sA, sB, desc)
    assert_matches(got, want, msg=f"r={replace} c={comp} s={structure}")


def test_ewise_add_mask_no_accum(rng):
    A, sA = random_gb(rng, 8, 6, 0.3)
    B, sB = random_gb(rng, 8, 6, 0.3)
    C, sC = random_gb(rng, 8, 6, 0.3)
    M, sM = random_mask(rng, 8, 6, 0.5)
    got = gb.ewise_add(A, B, ops.PLUS, C=C.dup(), mask=M)
    want = spec.spec_ewise_add(sC, sM, None, ops.PLUS, sA, sB, NULL)
    assert_matches(got, want)


def test_ewise_transpose_desc(rng):
    A, sA = random_gb(rng, 6, 8, 0.3)
    B, sB = random_gb(rng, 8, 6, 0.3)
    got = gb.ewise_add(A, B, ops.PLUS, desc=gb.descriptor.T1)
    want = spec.spec_ewise_add(spec.SpecMat.empty((6, 8), np.float64), None,
                               None, ops.PLUS, sA, sB, gb.descriptor.T1)
    assert_matches(got, want)


# ---- apply -----------------------------------------------------------------

@pytest.mark.parametrize("fmt", FMTS)
@pytest.mark.parametrize("op", [ops.AINV, ops.ABS, ops.EXP, ops.ONE,
                                ops.LNOT])
def test_apply_unary(rng, fmt, op):
    A, sA = random_gb(rng, 7, 9, 0.35, fmt=fmt)
    got = gb.apply(A, op)
    want = spec.spec_apply(spec.SpecMat.empty((7, 9), np.float64), None,
                           None, op, sA)
    assert_matches(got, want)


def test_apply_bind(rng):
    A, sA = random_gb(rng, 5, 5, 0.5)
    got = gb.apply(A, ops.PLUS, bind=("second", 3.0))
    want = spec.spec_apply(spec.SpecMat.empty((5, 5), np.float64), None,
                           None, ops.PLUS, sA, bind=("second", 3.0))
    assert_matches(got, want)
    got = gb.apply(A, ops.MINUS, bind=("first", 3.0))
    want = spec.spec_apply(spec.SpecMat.empty((5, 5), np.float64), None,
                           None, ops.MINUS, sA, bind=("first", 3.0))
    assert_matches(got, want)


def test_apply_positional(rng):
    A, sA = random_gb(rng, 5, 7, 0.4)
    got = gb.apply(A, ops.POSITIONI)
    want = spec.spec_apply(spec.SpecMat.empty((5, 7), np.int64), None, None,
                           ops.POSITIONI, sA)
    assert_matches(got, want)


def test_apply_indexunary(rng):
    A, sA = random_gb(rng, 6, 6, 0.4)
    got = gb.apply(A, ops.ROWINDEX, thunk=1)
    want = spec.spec_apply(spec.SpecMat.empty((6, 6), np.int64), None, None,
                           ops.ROWINDEX, sA, thunk=1)
    assert_matches(got, want)


# ---- select ----------------------------------------------------------------

@pytest.mark.parametrize("fmt", FMTS)
@pytest.mark.parametrize("op,thunk", [(ops.TRIL, 0), (ops.TRIU, 1),
                                      (ops.DIAG, 0), (ops.OFFDIAG, 0),
                                      (ops.VALUEGT, 0.0), (ops.VALUELE, 0.5)])
def test_select(rng, fmt, op, thunk):
    A, sA = random_gb(rng, 9, 9, 0.4, fmt=fmt)
    got = gb.select(A, op, thunk)
    want = spec.spec_select(spec.SpecMat.empty((9, 9), np.float64), None,
                            None, op, sA, thunk)
    assert_matches(got, want, msg=op.name)


def test_select_masked(rng):
    A, sA = random_gb(rng, 8, 8, 0.4)
    C, sC = random_gb(rng, 8, 8, 0.3)
    M, sM = random_mask(rng, 8, 8, 0.5)
    got = gb.select(A, ops.TRIU, 0, C=C.dup(), mask=M, accum=ops.PLUS)
    want = spec.spec_select(sC, sM, ops.PLUS, ops.TRIU, sA, 0)
    assert_matches(got, want)


# ---- reduce ----------------------------------------------------------------

@pytest.mark.parametrize("fmt", FMTS)
@pytest.mark.parametrize("m", [mon.PLUS, mon.MIN, mon.MAX, mon.TIMES])
def test_reduce_vector(rng, fmt, m):
    A, sA = random_gb(rng, 9, 7, 0.35, fmt=fmt)
    got = gb.reduce(A, m)
    want = spec.spec_reduce_vector(spec.SpecMat.empty((9, 1), np.float64),
                                   None, None, m, sA)
    assert_matches(got, want, msg=m.name)


def test_reduce_vector_bycol_desc(rng):
    # w = reduce_cols(A) == reduce_rows(A') via transpose0
    A, sA = random_gb(rng, 6, 9, 0.4)
    got = gb.reduce(A, mon.PLUS, desc=gb.descriptor.T0)
    want = spec.spec_reduce_vector(spec.SpecMat.empty((9, 1), np.float64),
                                   None, None, mon.PLUS, sA,
                                   gb.descriptor.T0)
    assert_matches(got, want)


@pytest.mark.parametrize("m", [mon.PLUS, mon.MIN, mon.MAX, mon.LOR,
                               mon.LAND, mon.ANY])
def test_reduce_scalar(rng, m):
    dtype = np.bool_ if m in (mon.LOR, mon.LAND) else np.float64
    A, sA = random_gb(rng, 8, 8, 0.4, dtype=dtype)
    got = gb.reduce_scalar(A, m)
    if m is mon.ANY:
        # ANY = "pick any entry"; membership is the only spec requirement
        assert got in sA.values[sA.pattern]
        return
    want = spec.spec_reduce_scalar(m, sA)
    assert got == pytest.approx(want)


def test_reduce_scalar_empty():
    A = gb.Matrix.new(gb.types.FP64, 4, 4)
    assert gb.reduce_scalar(A, mon.PLUS) == 0.0
    assert gb.reduce_scalar(A, mon.MIN) == np.inf


def test_reduce_generic_monoid(rng):
    # user-defined monoid exercises the associative-scan generic path
    m = gb.make_monoid(gb.binary_op(lambda x, y: x + y + 1.0, "plusplus"),
                       identity=0.0)
    A, sA = random_gb(rng, 7, 7, 0.5)
    got = gb.reduce(A, m)
    want = spec.spec_reduce_vector(spec.SpecMat.empty((7, 1), np.float64),
                                   None, None, m, sA)
    assert_matches(got, want)


# ---- transpose -------------------------------------------------------------

@pytest.mark.parametrize("fmt", FMTS)
def test_transpose(rng, fmt):
    A, sA = random_gb(rng, 6, 9, 0.4, fmt=fmt)
    got = gb.transpose(A)
    want = spec.spec_transpose(spec.SpecMat.empty((9, 6), np.float64), None,
                               None, sA)
    assert_matches(got, want)
    got2 = gb.transpose(got)
    assert (got2.to_scipy() != A.to_scipy()).nnz == 0


def test_transpose_masked_accum(rng):
    A, sA = random_gb(rng, 7, 7, 0.4)
    C, sC = random_gb(rng, 7, 7, 0.3)
    M, sM = random_mask(rng, 7, 7, 0.5)
    got = gb.transpose(A, C=C.dup(), mask=M, accum=ops.MAX)
    want = spec.spec_transpose(sC, sM, ops.MAX, sA)
    assert_matches(got, want)
