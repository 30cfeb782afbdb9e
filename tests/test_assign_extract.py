"""Differential tests: extract, assign/subassign, kron, concat/split, diag,
sort (reference ops in SURVEY.md §2.5)."""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import operators as ops
from graphblas_tpu.core.descriptor import NULL, Descriptor
from graphblas_tpu.spec import oracle as spec

from harness import assert_matches, random_gb, random_mask


# ---- extract ----------------------------------------------------------------

@pytest.mark.parametrize("fmt", [gb.SPARSE, gb.BITMAP])
def test_extract(rng, fmt):
    A, sA = random_gb(rng, 10, 12, 0.3, fmt=fmt)
    I = [1, 3, 5, 9]
    J = [0, 2, 4, 6, 11]
    got = gb.extract(A, I, J)
    want = spec.spec_extract(spec.SpecMat.empty((4, 5), np.float64), None,
                             None, sA, I, J)
    assert_matches(got, want)


def test_extract_all_and_slice(rng):
    A, sA = random_gb(rng, 8, 8, 0.4)
    got = gb.extract(A, None, slice(2, 7))
    want = spec.spec_extract(spec.SpecMat.empty((8, 5), np.float64), None,
                             None, sA, list(range(8)), list(range(2, 7)))
    assert_matches(got, want)


def test_extract_duplicates(rng):
    A, sA = random_gb(rng, 6, 6, 0.4)
    I = [2, 2, 3]
    J = [1, 1, 1]
    got = gb.extract(A, I, J)
    want = spec.spec_extract(spec.SpecMat.empty((3, 3), np.float64), None,
                             None, sA, I, J)
    assert_matches(got, want)


def test_extract_masked_accum(rng):
    A, sA = random_gb(rng, 9, 9, 0.35)
    I = [0, 2, 4, 6]
    J = [1, 3, 5, 7]
    C, sC = random_gb(rng, 4, 4, 0.4)
    M, sM = random_mask(rng, 4, 4, 0.5)
    got = gb.extract(A, I, J, C=C.dup(), mask=M, accum=ops.PLUS)
    want = spec.spec_extract(sC, sM, ops.PLUS, sA, I, J)
    assert_matches(got, want)


def test_extract_out_of_range(rng):
    A, _ = random_gb(rng, 5, 5, 0.3)
    with pytest.raises(gb.errors.IndexOutOfBounds):
        gb.extract(A, [7], [0])


# ---- assign / subassign -----------------------------------------------------

@pytest.mark.parametrize("cfmt", [gb.SPARSE, gb.BITMAP])
def test_subassign_matrix(rng, cfmt):
    C, sC = random_gb(rng, 10, 10, 0.3, fmt=cfmt)
    A, sA = random_gb(rng, 3, 4, 0.5)
    I = [1, 4, 7]
    J = [0, 2, 5, 9]
    got = gb.subassign(C.dup(), A, I, J)
    want = spec.spec_subassign(sC, None, None, sA, I, J)
    assert_matches(got, want)


def test_subassign_accum_mask(rng):
    C, sC = random_gb(rng, 8, 8, 0.35)
    A, sA = random_gb(rng, 3, 3, 0.6)
    I = [0, 3, 6]
    J = [1, 4, 7]
    M, sM = random_mask(rng, 3, 3, 0.5)  # mask over the region
    got = gb.subassign(C.dup(), A, I, J, mask=M, accum=ops.PLUS)
    want = spec.spec_subassign(sC, sM, ops.PLUS, sA, I, J)
    assert_matches(got, want)


def test_assign_matrix_global_mask(rng):
    C, sC = random_gb(rng, 8, 8, 0.35)
    A, sA = random_gb(rng, 3, 3, 0.6)
    I = [0, 3, 6]
    J = [1, 4, 7]
    M, sM = random_mask(rng, 8, 8, 0.5)  # mask over all of C
    got = gb.assign(C.dup(), A, I, J, mask=M)
    want = spec.spec_assign(sC, sM, None, sA, I, J)
    assert_matches(got, want)


def test_assign_scalar_region(rng):
    C, sC = random_gb(rng, 7, 7, 0.3)
    I = [1, 3]
    J = [2, 4, 6]
    got = gb.subassign(C.dup(), 5.0, I, J)
    sA = spec.SpecMat(np.full((2, 3), 5.0), np.ones((2, 3), bool))
    want = spec.spec_subassign(sC, None, None, sA, I, J)
    assert_matches(got, want)


def test_assign_scalar_mask_fast_path(rng):
    # the reference's famous C<M>=x case (Method 05d)
    C, sC = random_gb(rng, 20, 20, 0.1)
    M, sM = random_mask(rng, 20, 20, 0.15)
    got = gb.assign(C.dup(), 3.25, mask=M)
    sA = spec.SpecMat(np.full((20, 20), 3.25), np.ones((20, 20), bool))
    want = spec.spec_assign(sC, sM, None, sA, list(range(20)),
                            list(range(20)))
    assert_matches(got, want)


def test_assign_vector(rng):
    v, sv = random_gb(rng, 6, 1, 0.5, klass=gb.Vector)
    w, sw = random_gb(rng, 3, 1, 0.9, klass=gb.Vector)
    got = gb.subassign(v.dup(), w, [0, 2, 4], [0])
    want = spec.spec_subassign(sv, None, None, sw, [0, 2, 4], [0])
    assert_matches(got, want)


# ---- kron -------------------------------------------------------------------

def test_kron(rng):
    A, sA = random_gb(rng, 3, 4, 0.4)
    B, sB = random_gb(rng, 2, 5, 0.4)
    got = gb.kronecker(A, B, ops.TIMES)
    want = spec.spec_kron(spec.SpecMat.empty((6, 20), np.float64), None,
                          None, ops.TIMES, sA, sB)
    assert_matches(got, want)


# ---- concat / split ---------------------------------------------------------

def test_concat_split(rng):
    A, sA = random_gb(rng, 4, 6, 0.4)
    B, sB = random_gb(rng, 4, 3, 0.4)
    C2, sC2 = random_gb(rng, 5, 6, 0.4)
    D, sD = random_gb(rng, 5, 3, 0.4)
    got = gb.concat([[A, B], [C2, D]])
    want_vals = np.block([[sA.values, sB.values], [sC2.values, sD.values]])
    want_pat = np.block([[sA.pattern, sB.pattern],
                         [sC2.pattern, sD.pattern]])
    assert_matches(got, spec.SpecMat(want_vals, want_pat))
    tiles = gb.split(got, [4, 5], [6, 3])
    assert_matches(tiles[0][0], sA)
    assert_matches(tiles[0][1], sB)
    assert_matches(tiles[1][0], sC2)
    assert_matches(tiles[1][1], sD)


# ---- diag -------------------------------------------------------------------

@pytest.mark.parametrize("k", [0, 2, -1])
def test_diag(rng, k):
    v, sv = random_gb(rng, 5, 1, 0.6, klass=gb.Vector)
    got = gb.diag(v, k)
    dim = 5 + abs(k)
    want = np.zeros((dim, dim))
    pat = np.zeros((dim, dim), bool)
    for i in range(5):
        if sv.pattern[i, 0]:
            r, c = (i, i + k) if k >= 0 else (i - k, i)
            want[r, c] = sv.values[i, 0]
            pat[r, c] = True
    assert_matches(got, spec.SpecMat(want, pat))


def test_vector_diag(rng):
    from graphblas_tpu.ops.diag import vector_diag
    A, sA = random_gb(rng, 6, 6, 0.5)
    got = vector_diag(A, 1)
    want_vals = np.zeros((5, 1))
    want_pat = np.zeros((5, 1), bool)
    for i in range(5):
        if sA.pattern[i, i + 1]:
            want_vals[i, 0] = sA.values[i, i + 1]
            want_pat[i, 0] = True
    assert_matches(got, spec.SpecMat(want_vals, want_pat))


# ---- sort -------------------------------------------------------------------

def test_sort(rng):
    A, sA = random_gb(rng, 6, 8, 0.5)
    C, P = gb.sort(A)
    cv, cp = (np.asarray(x) for x in C.to_dense_pair())
    pv, _ = (np.asarray(x) for x in P.to_dense_pair())
    for i in range(6):
        vals = sA.values[i][sA.pattern[i]]
        want = np.sort(vals)
        got_row = cv[i][cp[i]]
        np.testing.assert_allclose(got_row, want)
        # P holds original column ids, in sorted-value order
        cols = pv[i][cp[i]].astype(int)
        np.testing.assert_allclose(sA.values[i][cols], want)


def test_sort_descending(rng):
    A, sA = random_gb(rng, 5, 7, 0.5)
    C, P = gb.sort(A, ascending=False)
    cv, cp = (np.asarray(x) for x in C.to_dense_pair())
    for i in range(5):
        vals = sA.values[i][sA.pattern[i]]
        np.testing.assert_allclose(cv[i][cp[i]], np.sort(vals)[::-1])
