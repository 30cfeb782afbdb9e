"""Gaussian-integer demo — the reference's Demo/Program/gauss_demo.c
analog: a user-defined struct type {int real; int imag}, user add/mult
operators, a user monoid + semiring, and matrix algebra over it.
Run: python examples/gauss_demo.py"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import graphblas_tpu as gb
    from graphblas_tpu.core import types as T

    gb.init()

    # user-defined struct type (reference: GrB_Type_new(&Gauss, sizeof..))
    Gauss = T.struct_type("Gauss", np.int64, (2,))

    def gauss_mult(x, y):
        xr, xi = x[..., 0], x[..., 1]
        yr, yi = y[..., 0], y[..., 1]
        return jnp.stack([xr * yr - xi * yi, xr * yi + xi * yr], axis=-1)

    ADD = gb.binary_op(lambda x, y: x + y, "gauss_add", commutative=True)
    MULT = gb.binary_op(gauss_mult, "gauss_mult")
    ADD_MON = gb.make_monoid(ADD, identity=np.array([0, 0]))
    SR = gb.make_semiring(ADD_MON, MULT, "gauss_plus_times")

    rng = np.random.default_rng(0)
    n = 4
    va = np.stack([rng.integers(-3, 4, (n, n)),
                   rng.integers(-3, 4, (n, n))], axis=-1)
    A = gb.Matrix((n, n), Gauss, gb.FULL, values=jnp.asarray(va))
    C = gb.mxm(A, A, SR)

    cv, _ = C.to_dense_pair()
    got = np.asarray(cv)
    ca = va[..., 0] + 1j * va[..., 1]
    want = ca @ ca
    assert (got[..., 0] == want.real).all() and (got[..., 1] == want.imag).all()
    print("C = A*A over the Gaussian-integer semiring:")
    for i in range(n):
        print("  " + "  ".join(f"{got[i, j, 0]:4d}{got[i, j, 1]:+4d}i"
                               for j in range(n)))
    s = gb.reduce_scalar(C, ADD_MON)
    print("sum(C) =", f"{s[0]}{s[1]:+d}i")
    print("matches numpy complex reference: OK")
