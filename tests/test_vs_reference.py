"""Differential tests against the COMPILED reference (round-4 ask #8;
the reference's own strategy: Test/GB_spec_compare.m).

Fixtures are produced by experiments/ref_dump.c run against the
SuiteSparse:GraphBLAS COMPACT build on this host and committed under
tests/fixtures/ref/.  Inputs regenerate here via the same LCG; every op
asserts BIT-FOR-BIT equality on integer/boolean semirings
(BASELINE.json requirement).  Skipped when fixtures are absent."""

import os
import struct

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu.core import monoid as MON
from graphblas_tpu.core import semiring as SR
from graphblas_tpu.core import types as T
from graphblas_tpu.core.descriptor import Descriptor

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "ref")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(FIXDIR),
                       reason="reference fixtures not present"),
]

MASK64 = (1 << 64) - 1


def _lcg_stream(seed, count):
    s = seed
    out = np.empty(count, np.uint64)
    for k in range(count):
        s = (s * 6364136223846793005 + 1442695040888963407) & MASK64
        out[k] = s >> 33
    return out


def gen_coo(seed, n, nnz, vmax):
    draws = _lcg_stream(seed, nnz * 3).reshape(nnz, 3)
    ri = (draws[:, 0] % n).astype(np.int64)
    ci = (draws[:, 1] % n).astype(np.int64)
    vi = (draws[:, 2] % vmax).astype(np.int64) + 1
    return ri, ci, vi


def build_int64(seed, n, nnz, vmax):
    ri, ci, vi = gen_coo(seed, n, nnz, vmax)
    return gb.Matrix.from_coo(ri, ci, vi, (n, n), dtype=T.INT64,
                              dup=gb.operators.PLUS)


def build_bool(seed, n, nnz):
    ri, ci, vi = gen_coo(seed, n, nnz, 2)
    return gb.Matrix.from_coo(ri, ci, vi == 2, (n, n), dtype=T.BOOL,
                              dup=gb.operators.LOR)


def load_fixture(name):
    path = os.path.join(FIXDIR, name + ".bin")
    with open(path, "rb") as f:
        nr, nc, nv = struct.unpack("<3q", f.read(24))
        body = np.frombuffer(f.read(), np.int64)
    rows = body[:nv]
    cols = body[nv:2 * nv]
    vals = body[2 * nv:3 * nv]
    return (nr, nc), rows, cols, vals


def assert_matches(C, name):
    shape, rows, cols, vals = load_fixture(name)
    assert C.shape == shape
    Cs = C.to_scipy().tocoo()
    order = np.lexsort((Cs.col, Cs.row))
    gr, gc = Cs.row[order].astype(np.int64), Cs.col[order].astype(np.int64)
    gv = np.asarray(Cs.data)[order].astype(np.int64)
    assert gr.shape[0] == rows.shape[0], (name, gr.shape[0], rows.shape[0])
    np.testing.assert_array_equal(gr, rows, err_msg=name)
    np.testing.assert_array_equal(gc, cols, err_msg=name)
    np.testing.assert_array_equal(gv, vals, err_msg=name)


@pytest.fixture(scope="module")
def mats():
    return {
        "A": build_int64(1, 97, 800, 9),
        "B": build_int64(2, 97, 700, 9),
        "Ab": build_bool(3, 128, 2000),
        "Bb": build_bool(4, 128, 1800),
    }


def test_inputs_match(mats):
    assert_matches(mats["A"], "in_A")
    assert_matches(mats["B"], "in_B")
    assert_matches(mats["Ab"].astype(T.INT64), "in_Ab")
    assert_matches(mats["Bb"].astype(T.INT64), "in_Bb")


def test_mxm_plus_times(mats):
    C = gb.mxm(mats["A"], mats["B"], SR.PLUS_TIMES, out_dtype=T.INT64)
    assert_matches(C, "mxm_plus_times")


def test_mxm_masked(mats):
    C = gb.mxm(mats["A"], mats["B"], SR.PLUS_TIMES, mask=mats["A"],
               desc=Descriptor(mask_structure=True), out_dtype=T.INT64)
    assert_matches(C, "mxm_masked")


def test_mxm_lor_land(mats):
    C = gb.mxm(mats["Ab"], mats["Bb"], SR.LOR_LAND)
    assert_matches(C.astype(T.INT64), "mxm_lor_land")


def test_mxm_min_plus(mats):
    C = gb.mxm(mats["A"], mats["B"], SR.MIN_PLUS, out_dtype=T.INT64)
    assert_matches(C, "mxm_min_plus")


def test_ewiseadd_plus(mats):
    C = gb.ewise_add(mats["A"], mats["B"], gb.operators.PLUS)
    assert_matches(C, "ewiseadd_plus")


def test_ewisemult_times(mats):
    C = gb.ewise_mult(mats["A"], mats["B"], gb.operators.TIMES)
    assert_matches(C, "ewisemult_times")


def test_transpose(mats):
    from graphblas_tpu.core.matrix import ROW, SPARSE
    C = gb.transpose(mats["A"]).to_format(SPARSE, ROW)
    assert_matches(C, "transpose")


def test_extract_sub(mats):
    C = gb.extract(mats["A"], np.arange(10, 61), np.arange(20, 81))
    assert_matches(C, "extract_sub")


def test_select_tril(mats):
    C = gb.select(mats["A"], gb.operators.TRIL, -1)
    assert_matches(C, "select_tril")


def test_apply_ainv(mats):
    C = gb.apply(mats["A"], gb.operators.AINV)
    assert_matches(C, "apply_ainv")


def test_reduce_plus(mats):
    s = int(gb.reduce_scalar(mats["A"], MON.PLUS, out_dtype=T.INT64))
    _, _, _, vals = load_fixture("reduce_plus")
    assert s == int(vals[0])


def test_kron_times():
    K1 = build_int64(5, 12, 40, 5)
    K2 = build_int64(6, 11, 30, 5)
    C = gb.kronecker(K1, K2, gb.operators.TIMES)
    assert_matches(C, "kron_times")
