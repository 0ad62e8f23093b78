"""Join operators beyond plain equi-joins.

The reference has no joins (SURVEY.md §2.3); these implement the
engine-target surface of SURVEY.md §2.2. All are compositions of built-in
DataFrame ops so Catalyst keeps planning freedom (broadcast vs shuffle,
AQE skew splitting).

Scale notes (100 TB posture):
- ``asof_join`` shuffles both sides once on the equi-keys, then resolves
  "latest right row ≤ left ts" with a window over the union — no
  BroadcastNestedLoop, no per-left-row scan of the right side. Cost is
  O(shuffle(L) + shuffle(R) + sort within key) which is the same order as a
  sort-merge join.
- ``range_join`` keeps the equi-key in the join condition so the planner
  uses a hash/sort-merge join with the range as a residual filter; a pure
  range (no equi-key) would be a nested-loop — callers must bucket first
  (see ``bucketize_range``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    condition: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with an extra non-equi ``condition`` residual.

    Keeping at least one equi key means Catalyst plans a shuffled hash /
    sort-merge join (scales linearly) instead of a nested loop.
    """
    cond = None
    for k in on:
        c = left[k] == right[k]
        cond = c if cond is None else (cond & c)
    cond = condition if cond is None else (cond & condition)
    return left.join(right, cond, how)


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    span_seconds: int,
    condition: Column,
    how: str = "inner",
) -> DataFrame:
    """Range join with an equi anchor AND a time-band key — the scale form
    of ``range_join`` for forward windows ``right_ts in (left_ts,
    left_ts + span]``.

    ``range_join`` alone bounds probe work per equi-key group: every pair
    within a key is residual-compared, so a key with n rows costs O(n^2)
    compares — measured 14.5x wall on 10x data when per-key row counts
    grew 10x. Adding floor(ts / span) as a second equi key bounds the work
    per (key, band) instead: the left side probes its own band and the
    next (any right row in the window lies in one of the two), so cost
    follows band occupancy, which grows with data RATE, not history
    length. The band column is computed from truncated epoch seconds;
    band(b) <= band(a)+1 holds for any b <= a + span, so no matches are
    lost. ``condition`` still applies in full as the residual.

    Only ``how='inner'`` is supported: the left side is exploded into two
    band copies before the join, so an outer join would emit duplicate
    left rows (a matched copy plus a null-extended copy from the other
    band, or two null-extended rows). Outer range semantics belong to the
    un-banded ``range_join``."""
    if span_seconds <= 0:
        raise ValueError(f"span_seconds must be positive, got {span_seconds}")
    if how != "inner":
        raise ValueError(
            "banded_range_join supports how='inner' only (the band explode "
            f"duplicates left rows under outer joins), got how={how!r}"
        )
    band = "__brj_band"
    for side, df in (("left", left), ("right", right)):
        if band in df.columns:
            raise ValueError(
                f"{side} input already has a {band!r} column; rename it "
                "before calling banded_range_join"
            )
    lb = F.floor(F.unix_timestamp(F.col(left_ts)) / span_seconds).cast("bigint")
    rb = F.floor(F.unix_timestamp(F.col(right_ts)) / span_seconds).cast("bigint")
    l2 = left.withColumn(
        band, F.explode(F.array(lb, lb + F.lit(1).cast("bigint")))
    )
    r2 = right.withColumn(band, rb)
    cond = l2[band] == r2[band]
    for k in on:
        cond = cond & (l2[k] == r2[k])
    out = l2.join(r2, cond & condition, how)
    return out.drop(l2[band]).drop(r2[band])


def bucketize_range(df: DataFrame, col: str, bucket_width: str | float) -> DataFrame:
    """Add a ``__bucket`` column for banded range joins at scale: join on
    bucket equality (plus neighbors) to turn a nested-loop range join into
    an equi-join. Width should be >= the largest range span queried."""
    if isinstance(bucket_width, str):
        # interval strings for timestamps, e.g. "1 hour"
        return df.withColumn(
            "__bucket", F.window(F.col(col), bucket_width)["start"]
        )
    return df.withColumn("__bucket", F.floor(F.col(col) / F.lit(bucket_width)))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance: Column | None = None,
) -> DataFrame:
    """As-of join: for each left row, attach the latest right row with the
    same ``on`` keys and ``right_ts <= left_ts``.

    Implemented as union + window (a single shuffle on ``on`` keys):
    tag each side, union the key/ts columns, and carry the latest right-side
    ROW forward as one struct with ``last(struct, ignorenulls=True)``
    ordered by time — filling per-column would stitch together values from
    DIFFERENT right rows whenever the latest row has a NULL field. This is
    the scalable formulation — both inputs shuffle exactly once on the join
    keys, and the per-key work is a sort, identical to a sort-merge join.

    Ties (right_ts == left_ts) take the right row, matching the
    "state as of event time, inclusive" convention.

    ``tolerance`` (a duration Column — ``F.expr("INTERVAL 30 DAYS")`` for
    timestamps, a numeric literal for numeric time axes) bounds how stale
    the match may be: a left row whose latest right row satisfies
    ``right_ts < left_ts - tolerance`` gets NULL right columns instead
    (pandas ``merge_asof(tolerance=...)`` semantics). Because the latest
    right row is also the nearest, "latest overall, if within tolerance"
    equals "latest within tolerance" — no second pass needed.
    """
    on = list(on)
    right_cols = list(right_cols)
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right_cols {sorted(overlap)} already exist on the left side; "
            "rename one side before the as-of join"
        )

    # the matched row's own timestamp rides along in the struct so the
    # tolerance check can see it after the forward fill
    struct_fields = [(right_ts, "__rts"), *[(c, c) for c in right_cols]]
    lhs = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    lhs = lhs.withColumn(
        "__rrow",
        F.lit(None).cast(
            "struct<"
            + ", ".join(
                f"{alias}: {right.schema[src].dataType.simpleString()}"
                for src, alias in struct_fields
            )
            + ">"
        ),
    )
    rhs = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            *[F.col(src).alias(alias) for src, alias in struct_fields]
        ).alias("__rrow"),
    )
    left_payload = [c for c in left.columns]
    lhs = lhs.select(*on, "__ts", "__side", "__rrow", *[c for c in left_payload if c not in on])
    rhs = rhs.select(*on, "__ts", "__side", "__rrow", *[F.lit(None).alias(c) for c in left_payload if c not in on])

    unioned = lhs.unionByName(rhs)
    # right rows sort before left rows at equal ts => inclusive as-of
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "__rrow", F.last(F.col("__rrow"), ignorenulls=True).over(w)
    )
    if tolerance is not None:
        filled = filled.withColumn(
            "__rrow",
            F.when(
                F.col("__ts") <= F.col("__rrow.__rts") + tolerance,
                F.col("__rrow"),
            ),
        )
    return (
        filled.filter(F.col("__side") == 1)
        .select(
            *on,
            *[F.col(f"__rrow.{c}").alias(c) for c in right_cols],
            *[c for c in left_payload if c not in on],
        )
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    left_unique: str | None = None,
) -> DataFrame:
    """Skew-beating equi-join: when one key carries a disproportionate
    share of the left side, a plain shuffle join lands that key on one
    reducer. Salting splits it: the left side gets a deterministic salt in
    [0, salt) (hash of ``left_unique`` if given, else of all left columns),
    the right side is replicated ``salt`` times, and the join key becomes
    (key, salt) — the hot key now spreads over ``salt`` reducers.

    Result set is IDENTICAL to ``left.join(right, key)``; cost is
    ``salt``x replication of the right side, so use with a small-ish right
    side that still exceeds the broadcast threshold. (When AQE's skew-join
    split can act — both sides plain shuffle, no agg fusion — prefer it;
    this operator covers the cases it can't.)"""
    if left_unique is not None:
        salt_col = F.pmod(F.hash(F.col(left_unique)), F.lit(salt))
    else:
        salt_col = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt))
    l_salted = left.withColumn("__salt", salt_col)
    r_rep = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l_salted.join(r_rep, on=[key, "__salt"]).drop("__salt")


def bitmap_prefilter_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_bits: int = 16384,
) -> DataFrame:
    """Semi-join with a broadcast bitmap pre-filter (a poor-man's runtime
    Bloom filter, one hash function): prune the BIG side map-side before
    its rows ever reach the join shuffle.

    The small side's keys are hashed into an ``n_bits`` bitmap built with
    ONE distributed aggregation (bit_or partials combine map-side), pulled
    to the driver as ``n_bits/64`` longs (bounded state — 2 KiB at the
    16384 default), and re-emitted as a literal array in the big side's
    filter. A bitmap hit is only *probable* membership, so an exact
    left-semi join on the survivors restores exactness — the result is
    row-for-row identical to ``big.join(small, key, "left_semi")``; the
    bitmap can only have false POSITIVES (extra survivors that the final
    semi-join removes), never false negatives.

    Scale: at 100 TB the win is shuffle volume — the big side's exchange
    carries only rows whose key *might* match, a factor of roughly
    (small-side cardinality / n_bits saturation) fewer rows, while the
    filter itself is codegen bit arithmetic on a broadcast literal. This
    is the manual twin of Spark's runtime-filter feature
    (spark.sql.optimizer.runtime.bloomFilter.enabled), usable when the
    planner doesn't inject one (e.g. the small side is a subquery the
    optimizer won't sniff). Size ``n_bits`` ≳ 10x small-side cardinality
    to keep the false-positive rate low.
    """
    if n_bits % 64 != 0:
        raise ValueError(f"n_bits must be a multiple of 64, got {n_bits}")
    n_words = n_bits // 64
    # xxhash64 hashes by PHYSICAL type: int 7 and bigint 7 hash differently,
    # so mismatched key dtypes would silently prune matching rows (false
    # negatives break the row-identical-to-semi-join contract). Hash both
    # sides through a common string cast whenever the dtypes differ; when
    # they already match, hash the native type (no cast in the hot filter).
    big_t = big.schema[big_key].dataType
    small_t = small.schema[small_key].dataType
    if big_t == small_t:
        small_h = F.xxhash64(F.col(small_key))
        big_hash_sql = f"xxhash64({big_key})"
    else:
        small_h = F.xxhash64(F.col(small_key).cast("string"))
        big_hash_sql = f"xxhash64(CAST({big_key} AS STRING))"
    bit = F.pmod(small_h, F.lit(n_bits))
    bm_rows = (
        small.select(bit.alias("__bit"))
        .distinct()
        .groupBy(F.floor(F.col("__bit") / 64).cast("int").alias("__word"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__bit % 64 AS INT))")
            ).alias("__mask")
        )
        .collect()  # bounded: ≤ n_bits/64 rows of (int, long)
    )
    words = [0] * n_words
    for r in bm_rows:
        words[r["__word"]] = r["__mask"]
    bitmap = F.array(*[F.lit(w).cast("long") for w in words])
    h = F.pmod(F.expr(big_hash_sql), F.lit(n_bits))
    word = F.element_at(bitmap, F.floor(h / 64).cast("int") + 1)
    mask = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), "
        f"CAST(pmod({big_hash_sql}, {n_bits}) % 64 AS INT))"
    )
    hit = word.bitwiseAND(mask) != F.lit(0).cast("long")
    pruned = big.filter(hit)
    return pruned.join(
        small.select(F.col(small_key).alias(big_key)).distinct(),
        on=big_key,
        how="left_semi",
    )
