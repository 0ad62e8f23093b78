"""Vector math over ``array<float>`` embedding columns.

Built on higher-order functions (``zip_with`` + ``aggregate``) — the whole
dot product runs JVM-side inside codegen; no Python, no UDF serialization.
Doubles accumulate left-to-right over the array, which is a *deterministic*
order (array element order is data, not partitioning), so results are
reproducible and oracle-checkable after rounding.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def quantize_int8(a: Column) -> tuple[Column, Column]:
    """Symmetric int8 quantization of a vector column: returns
    ``(scale, quantized)`` where ``scale = max(|x|) / 127`` and
    ``quantized[i] = round(x[i] / scale)`` (SQL ROUND — half away from
    zero, identical in Spark and DuckDB). All-zero vectors get scale 0 and
    an all-zero code vector. Pure codegen HOFs — a narrow projection that
    cuts embedding bytes 4x before they ride any shuffle, which at 100 TB
    is the difference between shipping vectors and shipping codes."""
    v = F.transform(a, lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, F.abs))
    scale = amax / F.lit(127.0)
    q = F.when(amax == 0.0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(v, lambda x: F.round(x / scale, 0).cast("int"))
    )
    return scale, q


def dequantize_error(a: Column, scale: Column, q: Column) -> Column:
    """RMS reconstruction error of an int8 quantization: sqrt(mean((x -
    q*scale)^2)) with a left-to-right double fold (DuckDB list_reduce
    parity)."""
    v = F.transform(a, lambda x: x.cast("double"))
    sq = F.zip_with(
        v, q, lambda x, qi: (x - qi.cast("double") * scale) * (x - qi.cast("double") * scale)
    )
    return F.sqrt(
        F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)
        / F.size(v).cast("double")
    )


def cosine_pairs(a: Column, b: Column) -> Column:
    """Arrow-vectorized cosine between two vector columns.

    One pandas UDF computes dot + both norms for the whole batch,
    accumulated dimension-by-dimension in float64 — the SAME
    left-to-right addition order as the ``cosine_similarity`` fold and
    DuckDB's list_reduce, so all three agree bit-for-bit (pinned by
    tests/test_approx.py). Use on candidate-pair hot paths where the
    interpreted fold costs ~µs per array element; NULL in either input
    yields NULL, matching the fold."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        import numpy as np

        mask = (va.notna() & vb.notna()).to_numpy()
        out = pd.Series([None] * len(va), dtype=object)
        if not mask.any():
            return out
        A = np.asarray(va[mask].tolist(), dtype=np.float64)
        B = np.asarray(vb[mask].tolist(), dtype=np.float64)
        d = np.zeros(A.shape[0], dtype=np.float64)
        na = np.zeros(A.shape[0], dtype=np.float64)
        nb = np.zeros(A.shape[0], dtype=np.float64)
        for j in range(A.shape[1]):
            d += A[:, j] * B[:, j]
            na += A[:, j] * A[:, j]
            nb += B[:, j] * B[:, j]
        out[mask] = (d / (np.sqrt(na) * np.sqrt(nb))).tolist()
        return out

    return _cos(a, b)
