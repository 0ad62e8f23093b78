"""Local mirror of the driver's correctness gate: run each registered Spark
query and its DuckDB oracle on the same parquet tables, compare row count,
column names, and an order-insensitive canonical value multiset.

Stricter than any reasonable hash: values are canonicalized to exact reprs
(floats via repr of the double bits), so passing here implies passing any
order-insensitive value-hash downstream.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from collections import Counter

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
    rel = con.sql(sql)
    cols = [d[0] for d in rel.description]
    rows = rel.fetchall()
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
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
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
