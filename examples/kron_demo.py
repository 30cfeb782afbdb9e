"""Kronecker-product graph generator demo — the reference's
Demo/Program/kron analog (build large power-law-ish graphs as repeated
GrB_kronecker of a small seed).  Run: python examples/kron_demo.py"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import graphblas_tpu as gb

    gb.init()
    gb.set_option("burble", True)

    # 3x3 seed with self-similar structure
    seed = gb.Matrix.from_coo([0, 0, 1, 2, 2], [0, 1, 2, 0, 2],
                              [1.0, 1.0, 1.0, 1.0, 1.0], (3, 3))
    G = seed
    for level in range(3):
        G = gb.kronecker(G, seed, gb.operators.TIMES)
        print(f"level {level + 1}: {G!r}")
    r, c, v = G.coo()
    print("final graph:", G.nrows, "vertices,", G.nvals, "edges")
    deg = np.bincount(np.asarray(r), minlength=G.nrows)
    print("max out-degree:", deg.max(), " empty rows:", (deg == 0).sum())
