"""S6: sparse NPZ (scipy) reader.

Reference semantics (packaged_modules/npz/npz.py:81-161): a scipy
sparse matrix (CSR/CSC/BSR/DIA/COO) is row-sliced via ``indptr`` and
densified in 50k-row batches; columns are unnamed ``"0".."N-1"`` until
feature-metadata renaming (biodata.py:1099-1124).

Spark mapping: NPZ is a single-archive format (not splittable), so the
parallel unit is the FILE. Files are distributed to executors via a
binary-file listing + ``mapInPandas`` densification; each executor
loads its own file with scipy and emits Arrow batches. For the
100 TB path the recommendation is ingest-time conversion to Parquet
(this reader IS that converter: read_npz(...).write.parquet(...)).

scipy is an optional dependency: gated behind import-try.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class _CSR:
    """Minimal CSR holder so the reader works without scipy.

    scipy's ``save_npz`` writes a plain ``.npz`` archive with keys
    (data, indices, indptr, shape, format); numpy can read it directly.
    CSR is densified natively; other layouts (csc/coo/bsr/dia) fall
    back to scipy when available.
    """

    def __init__(self, data, indices, indptr, shape):
        import numpy as np

        self.data, self.indices, self.indptr = data, indices, indptr
        self.shape = tuple(int(x) for x in shape)
        self.dtype = np.asarray(data).dtype

    def __getitem__(self, rows: slice):
        import numpy as np

        lo, hi = rows.start or 0, min(rows.stop or self.shape[0], self.shape[0])
        return _CSRBlock(self, lo, hi)


class _CSRBlock:
    def __init__(self, csr: "_CSR", lo: int, hi: int):
        self.csr, self.lo, self.hi = csr, lo, hi

    def toarray(self):
        import numpy as np

        c = self.csr
        out = np.zeros((self.hi - self.lo, c.shape[1]), dtype=c.dtype)
        for r in range(self.lo, self.hi):
            s, e = int(c.indptr[r]), int(c.indptr[r + 1])
            out[r - self.lo, c.indices[s:e]] = c.data[s:e]
        return out


def _load_sparse(path: str):
    import numpy as np

    with np.load(path, allow_pickle=False) as z:
        fmt = z["format"].item() if "format" in z else b"csr"
        fmt = fmt.decode() if isinstance(fmt, bytes) else str(fmt)
        if fmt == "csr":
            return _CSR(z["data"], z["indices"], z["indptr"], z["shape"])
    # non-CSR layouts need scipy's conversion kernels
    try:
        import scipy.sparse as sp
    except ImportError as e:
        raise ImportError(
            f"read_npz: matrix format {fmt!r} requires scipy (not installed); "
            "CSR matrices are supported natively"
        ) from e
    m = sp.load_npz(path).tocsr()
    return _CSR(m.data, m.indices, m.indptr, m.shape)


def npz_schema(path: str, column_names: list[str] | None = None) -> T.StructType:
    m = _load_sparse(path)
    n = m.shape[1]
    names = column_names or [str(i) for i in range(n)]
    if len(names) != n:
        raise ValueError(f"column_names has {len(names)} entries for a {n}-column matrix")
    dt = T.DoubleType() if m.dtype.kind == "f" else T.LongType()
    return T.StructType([T.StructField("_row", T.LongType(), False)] + [T.StructField(c, dt, True) for c in names])


def read_npz(
    spark: SparkSession,
    files: list[str] | str,
    column_names: list[str] | None = None,
    batch_size: int = 50_000,
    with_row_index: bool = False,
) -> DataFrame:
    """Densify sparse NPZ files into a DataFrame (one task per file,
    Arrow-batched output)."""
    files = files if isinstance(files, list) else [files]
    schema = npz_schema(files[0], column_names)
    names = [f.name for f in schema.fields[1:]]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path in pdf["path"]:
                m = _load_sparse(path)
                # schema is pinned to the FIRST file; a later shard of
                # a different width must fail with the filename, not a
                # raw pandas shape error (or a silent misalignment)
                if m.shape[1] != len(names):
                    raise ValueError(
                        f"read_npz: {path!r} has {m.shape[1]} columns "
                        f"but the schema (from the first file) has "
                        f"{len(names)}"
                    )
                for start in range(0, m.shape[0], batch_size):
                    block = m[start : start + batch_size].toarray()
                    out = pd.DataFrame(block, columns=names)
                    out.insert(0, "_row", range(start, start + block.shape[0]))
                    yield out

    paths_df = spark.createDataFrame([(p,) for p in files], "path string").repartition(len(files))
    df = paths_df.mapInPandas(gen, schema=schema)
    return df if with_row_index else df.drop("_row")
