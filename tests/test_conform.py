"""Auto sparsity control (reference: Source/GB_conform.c, rules at
Source/Shared/GB_matrix.h:394-458) — VERDICT r1 #6: op outputs change
format per the rules and the math is unchanged."""

import numpy as np
import pytest
import scipy.sparse as sps

import graphblas_tpu as gb
from graphblas_tpu.core import config as CFG
from graphblas_tpu.core.matrix import BITMAP, FULL, HYPER, SPARSE


@pytest.fixture
def blocking():
    old = CFG.GLOBAL.blocking
    CFG.GLOBAL.blocking = True
    yield
    CFG.GLOBAL.blocking = old


def test_dense_result_conforms_to_bitmap(rng, blocking):
    n = 40
    A = gb.Matrix.from_dense(rng.standard_normal((n, n)))
    As = A.to_format(SPARSE)
    C = gb.ewise_add(As, As, gb.operators.PLUS)
    # every entry present -> full (density 1.0 > bitmap_switch)
    assert C.fmt == FULL
    np.testing.assert_allclose(np.asarray(C.to_dense_pair()[0]),
                               2 * np.asarray(A.to_dense_pair()[0]),
                               rtol=1e-6)


def test_mid_density_conforms_to_bitmap(rng, blocking):
    n = 60
    S = sps.random(n, n, density=0.3, random_state=np.random.RandomState(3),
                   format="csr")
    A = gb.Matrix.from_scipy(S)
    C = gb.ewise_mult(A, A, gb.operators.TIMES)
    # ~30% density > bitmap_switch (0.10) -> bitmap
    assert C.fmt == BITMAP
    got = np.asarray(C.to_dense_pair()[0])
    want = S.multiply(S).toarray()
    pres = np.asarray(C.to_dense_pair()[1])
    np.testing.assert_allclose(got[pres], want[pres], rtol=1e-10)


def test_sparse_result_stays_sparse(rng, blocking):
    n = 200
    S = sps.random(n, n, density=0.005, random_state=np.random.RandomState(4),
                   format="csr")
    A = gb.Matrix.from_scipy(S)
    C = gb.ewise_mult(A, A, gb.operators.TIMES)
    assert C.fmt == SPARSE


def test_hypersparse_trigger(blocking):
    # 3 entries in a 100k-row matrix: nvals << hyper_switch * nvec
    n = 100_000
    A = gb.Matrix.from_coo([5, 70_000, 99_999], [1, 2, 3], 1.0, (n, n))
    C = gb.apply(A, gb.operators.IDENTITY)
    assert C.fmt == HYPER
    r, c, v = C.coo()
    assert sorted(np.asarray(r).tolist()) == [5, 70_000, 99_999]


def test_sparsity_control_restricts(rng, blocking):
    n = 40
    A = gb.Matrix.from_dense(rng.standard_normal((n, n))).to_format(SPARSE)
    C = gb.Matrix.new(A.dtype, n, n)
    C.set("sparsity_control", "sparse")
    out = gb.ewise_add(A, A, gb.operators.PLUS, C=C)
    assert out is C
    assert C.fmt == SPARSE          # full/bitmap forbidden by C's control
    assert C.get("sparsity_control") == "sparse"


def test_bitmap_low_density_back_to_sparse(rng, blocking):
    n = 50
    S = sps.random(n, n, density=0.02, random_state=np.random.RandomState(5),
                   format="csr")
    A = gb.Matrix.from_scipy(S).to_format(BITMAP)
    C = gb.apply(A, gb.operators.IDENTITY)
    assert C.fmt == SPARSE


def test_conform_values_unchanged_across_formats(rng, blocking):
    """Differential: same op, conformed vs sparsity-pinned, equal values."""
    n = 64
    S = sps.random(n, n, density=0.4, random_state=np.random.RandomState(6),
                   format="csr")
    A = gb.Matrix.from_scipy(S)
    C_auto = gb.ewise_add(A, A, gb.operators.PLUS)
    A2 = gb.Matrix.from_scipy(S)
    pin = gb.Matrix.new(A2.dtype, n, n)
    pin.set("sparsity_control", "sparse")
    C_pin = gb.ewise_add(A2, A2, gb.operators.PLUS, C=pin)
    assert C_auto.fmt != C_pin.fmt
    va, pa = C_auto.to_dense_pair()
    vp, pp = C_pin.to_dense_pair()
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(pp))
    np.testing.assert_allclose(np.asarray(va)[np.asarray(pa)],
                               np.asarray(vp)[np.asarray(pp)], rtol=1e-10)
