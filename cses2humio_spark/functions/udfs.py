"""The UDF/UDAF/UDTF surface (SURVEY.md §2.2) — used ONLY where built-ins
can't express the semantics, always Arrow-batched (pandas_udf), never
row-at-a-time Python.

This module is imported by executor Python workers (UDTF classes pickle by
reference), so it must stay side-effect-free: UDF objects are built by
factory functions, never at module import time.

Determinism discipline for oracle-checked UDAFs: accumulate in integers
(money scaled ×100) so results are independent of pandas' visit order —
the same rule the decimal-sum helpers follow JVM-side.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd


def weighted_mean_cents():
    """Grouped-agg pandas UDF factory: weight-averaged 2-decimal value.
    Scaling to integer cents makes the sum exact in any visit order; one
    double division at the end."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _wmean(value: pd.Series, weight: pd.Series) -> float:  # type: ignore[misc]
        import numpy as np

        # SQL aggregate semantics: NULL in either operand skips the pair
        # (astype on NaN would instead crash the whole query)
        mask = value.notna() & weight.notna()
        v = value[mask].to_numpy(dtype="float64")
        w = weight[mask].to_numpy(dtype="float64").astype("int64")
        # half-away-from-zero to match SQL ROUND (pandas .round is half-even)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).astype("int64")
        tw = int(w.sum())
        if tw == 0:
            return float("nan")
        return float((cents * w).sum()) / (100.0 * tw)

    return _wmean


def token_stats_udtf_class():
    """Python UDTF (Spark 3.5+): one input row (doc_id, text) -> one row
    per distinct token with its count. The class is defined INSIDE this
    factory so cloudpickle serializes it by value — executor workers never
    import this package (see streaming/sinks.py for the same rule).

    The UDTF shape exists for extensibility parity; production token stats
    use explode+groupBy (queries/logs.py:token_explode_top20), JVM-side."""

    class TokenStatsUDTF:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            counts: dict[str, int] = {}
            for tok in text.strip().split():
                counts[tok] = counts.get(tok, 0) + 1
            for tok in sorted(counts):
                yield doc_id, tok, counts[tok]

    return TokenStatsUDTF


def scalar_norm_udf():
    """Vectorized SCALAR pandas UDF: l2 norm of array<float> embeddings,
    one Arrow batch per call. Exists for UDF-surface parity; the production
    path is functions/vectors.py (JVM-side, no Python transfer)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _norm(vecs: pd.Series) -> pd.Series:  # type: ignore[misc]
        return vecs.map(lambda v: float(np.sqrt(np.dot(v, v))))

    return _norm


def iter_norm_udf():
    """ITERATOR pandas UDF (Iterator[Series] -> Iterator[Series]): same
    l2 norm, but the per-worker setup runs ONCE per partition before the
    batch loop — the shape every model-backed LLM-pipeline UDF needs
    (load tokenizer/model once, then stream Arrow batches through it)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _norm_iter(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:  # type: ignore[misc]
        # expensive one-time init would go here (model/tokenizer load)
        sq = np.sqrt
        for vecs in batches:
            yield vecs.map(lambda v: float(sq(np.dot(v, v))))

    return _norm_iter
