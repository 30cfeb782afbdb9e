"""Serialize / import-export demo — the reference's Demo/Program/import
analog: matrix -> compressed blob -> metadata query -> round-trip, plus
O(1) pack/unpack move semantics.  Run: python examples/serialize_demo.py"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import scipy.sparse as sps
    import graphblas_tpu as gb
    from graphblas_tpu.ops import serialize as SER

    gb.init()
    S = sps.random(2000, 2000, 0.005, format="csr", random_state=1)
    A = gb.Matrix.from_scipy(S)

    for codec in ("none", "zlib", "gbz"):
        blob = SER.serialize(A, compression=codec)
        meta = SER.serialized_get(blob)   # query without deserializing
        print(f"{codec:5s}: {len(blob):9d} bytes  nvals={meta['nvals']} "
              f"fmt={meta['format']}")
    blob = SER.serialize(A, compression="gbz")
    B = SER.deserialize(blob)
    assert B.isequal(A)
    print("round-trip OK")

    # O(1) move semantics (GxB pack/unpack)
    meta, arrays = SER.unpack(A)
    assert A.nvals == 0  # A surrendered its arrays
    C = SER.pack((2000, 2000), meta["dtype"], meta["format"],
                 meta["orient"], **{k: v for k, v in arrays.items()
                                    if v is not None})
    assert C.isequal(B)
    print("pack/unpack OK")
