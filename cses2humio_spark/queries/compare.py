"""Local mirror of the driver's correctness gate: run each registered Spark
query and its DuckDB oracle on the same parquet tables, compare row count,
column names, and an order-insensitive canonical value multiset.

Stricter than any reasonable hash: values are canonicalized to exact reprs
(floats via repr of the double bits) WITH type tags, so passing here implies
passing any order-insensitive type-aware value-hash downstream.

Oracle rows are fetched through Arrow (``rel.arrow()``), not ``fetchall()``:
DuckDB's cursor API degrades HUGEINT to a plain Python int, which made the
round-7 escape (an oracle ``SUM`` over BIGINT silently typed HUGEINT →
Arrow decimal128(38,0) at the driver, int64 on the Spark side) invisible
locally. Through Arrow a HUGEINT column arrives as ``decimal.Decimal`` and
the type-tagged canon (``i:`` vs ``D:``) fails exactly as the driver does.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from collections import Counter
from decimal import Decimal

import duckdb
from pyspark.sql import DataFrame, SparkSession


def run_oracle(sf_dir: str, sql: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    tbl = con.sql(sql).arrow()
    cols = list(tbl.column_names)
    # columnar extraction (not to_pylist's dicts) so duplicate column
    # names can't silently collapse
    col_data = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    rows = list(zip(*col_data)) if col_data else []
    con.close()
    return cols, rows


def _canon(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{float(v)!r}"
    if isinstance(v, (_dt.datetime, _dt.date)):
        return f"t:{v.isoformat()}"
    if isinstance(v, Decimal):
        # scale-preserving: Decimal('3.50') != Decimal('3.5') here, just
        # as decimal128(p,2) != decimal128(p,1) differs under a
        # type-aware driver hash; and 'D:' never equals an int's 'i:'
        return f"D:{v}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{"
            + ",".join(f"{k}={_canon(v[k])}" for k in sorted(v))
            + "}"
        )
    if isinstance(v, bytes):
        return "x:" + v.hex()
    return f"{type(v).__name__[0]}:{v}"


def canonical_rows(cols: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(
        "|".join(_canon(row[i]) for i in order) for row in rows
    )


def compare_query(
    spark: SparkSession, sf_dir: str, fn, oracle: str | None
) -> dict:
    sdf: DataFrame = fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    result = {"rows": len(srows), "cols": sorted(scols)}
    if oracle is None:
        # a regression to an empty result must not pass the gate silently
        result["status"] = "rows-only" if srows else "rows-only-EMPTY"
        result["ok"] = len(srows) > 0
        return result
    ocols, orows = run_oracle(sf_dir, oracle)
    result["oracle_rows"] = len(orows)
    if sorted(scols) != sorted(ocols):
        result["status"] = f"schema-mismatch spark={sorted(scols)} oracle={sorted(ocols)}"
        result["ok"] = False
        return result
    s_canon = canonical_rows(scols, [tuple(r) for r in srows])
    o_canon = canonical_rows(ocols, orows)
    if len(srows) != len(orows):
        result["status"] = "rowcount-mismatch"
        result["ok"] = False
    elif s_canon != o_canon:
        diff_s = list((s_canon - o_canon).items())[:3]
        diff_o = list((o_canon - s_canon).items())[:3]
        result["status"] = f"value-mismatch spark_only={diff_s} oracle_only={diff_o}"
        result["ok"] = False
    else:
        result["status"] = "ok"
        result["ok"] = True
    return result


def compare_all(spark: SparkSession, sf_dir: str, names=None) -> dict[str, dict]:
    from cses2humio_spark.queries import ORACLES, QUERIES

    out = {}
    for name, fn in QUERIES.items():
        if names and name not in names:
            continue
        try:
            out[name] = compare_query(spark, sf_dir, fn, ORACLES.get(name))
        except Exception as e:  # noqa: BLE001 - report, don't abort the sweep
            out[name] = {"status": f"error: {type(e).__name__}: {e}", "ok": False}
    return out
