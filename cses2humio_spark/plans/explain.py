"""Physical-plan assertions — the 100 TB design contract, machine-checked.

Correctness says a query returns the right rows at sf0.01; these assertions
say it would still be the right PLAN at 1000 executors:

- filters reach the parquet scan (``PushedFilters``) — a scan that filters
  post-read ships 100 TB to filter 1 GB;
- projections prune the read schema (``ReadSchema``) — wide-table scans
  that read every column pay full I/O for 2-column queries;
- dimension joins broadcast (``BroadcastHashJoin``) — a shuffled fact side
  is the single most expensive accident at scale;
- aggregations partial-aggregate map-side (``partial_``/HashAggregate
  before the exchange) — shuffle bytes proportional to groups, not rows;
- global top-k is ``TakeOrderedAndProject`` — no full sort;
- and nothing degenerates into a cartesian/nested-loop product.

Used by tests/test_plans.py over the registered queries.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def _plan(df: DataFrame) -> str:
    try:
        return formatted_plan(df)
    except Exception:  # noqa: BLE001 - fall back to the public API
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    plan = _plan(df)
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    for frag in fragments:
        assert frag in pushed, f"filter {frag!r} not pushed to scan; pushed={pushed!r}"


def assert_pruned_schema(df: DataFrame, table_hint: str, max_cols: int) -> None:
    """The scan whose ReadSchema mentions ``table_hint`` must read at most
    ``max_cols`` columns."""
    plan = _plan(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, f"no ReadSchema found in plan:\n{plan}"
    for s in schemas:
        if table_hint in s:
            ncols = len([c for c in s.split(",") if ":" in c])
            assert ncols <= max_cols, (
                f"scan reads {ncols} cols (> {max_cols}): {s}"
            )
            return
    raise AssertionError(f"no scan with column {table_hint!r} in plan")


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    plan = _plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= at_least, f"expected >= {at_least} BroadcastHashJoin, got {n}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = _plan(df)
    assert "CartesianProduct" not in plan, "plan contains CartesianProduct"


def assert_partial_aggregation(df: DataFrame) -> None:
    """Map-side combine: a HashAggregate with partial functions must appear
    (Spark prints partial_<fn> in the functions list)."""
    plan = _plan(df)
    assert re.search(r"partial_\w+", plan), f"no partial aggregation in plan:\n{plan[:2000]}"


def assert_take_ordered(df: DataFrame) -> None:
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, "global top-k did not plan as TakeOrderedAndProject"


def unpartitioned_windows(df: DataFrame) -> list[dict]:
    """Window nodes with an EMPTY partition spec in the optimized logical
    plan — the "No Partition Defined for Window operation! Moving all data
    to a single partition" anti-pattern, detected structurally instead of
    by scraping the runtime warning.

    Each finding records whether the window's input subtree is bounded by
    a Limit (the TakeOrdered-then-rank pattern: ``orderBy().limit(k)``
    first, then rank the k-row frame — fine, the window sorts k rows, not
    the relation). Findings with ``bounded=False`` single-task-sort the
    whole input relation and are the scale-killers the round-6
    ``rrf_hybrid_top10`` defect shipped with (VERDICT r6 "What's wrong"
    #1); tests/test_plans.py fails on any non-whitelisted one.
    """
    out: list[dict] = []

    def _children(node):
        kids = node.children()
        return [kids.apply(i) for i in range(kids.size())]

    def _bounded(node) -> bool:
        if node.nodeName() in ("GlobalLimit", "LocalLimit"):
            return True
        return any(_bounded(c) for c in _children(node))

    def _walk(node):
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            out.append(
                {
                    "bounded": any(_bounded(c) for c in _children(node)),
                    "node": node.simpleString(10),
                }
            )
        for c in _children(node):
            _walk(c)

    _walk(df._jdf.queryExecution().optimizedPlan())
    return out


#: physical-plan markers whose COUNT defines a query's "shape" — join
#: strategies, exchanges, and the scale-critical operators. A broadcast
#: silently becoming a shuffle survives a small-SF wall-clock bench; it
#: does not survive a shape diff.
_SHAPE_MARKERS = {
    "broadcast_hash_join": r"\bBroadcastHashJoin\b",
    "sort_merge_join": r"\bSortMergeJoin\b",
    "shuffled_hash_join": r"\bShuffledHashJoin\b",
    "broadcast_nl_join": r"\bBroadcastNestedLoopJoin\b",
    "cartesian": r"\bCartesianProduct\b",
    "exchange_hash": r"Exchange hashpartitioning",
    "exchange_range": r"Exchange rangepartitioning",
    "exchange_single": r"Exchange SinglePartition",
    "exchange_round_robin": r"Exchange RoundRobinPartitioning",
    "broadcast_exchange": r"\bBroadcastExchange\b",
    "take_ordered": r"\bTakeOrderedAndProject\b",
    "window_group_limit": r"\bWindowGroupLimit\b",
    "window": r"\bWindow\b",
    "generate": r"\bGenerate\b",
    "python_eval": r"EvalPython",
}


#: print-noise that differs between two prints of the SAME cached plan:
#: expression ids (#123) and plan ids are re-allocated per consumer.
_ID_NOISE = re.compile(r"#\d+|plan_id=\d+")


def _connector_col(line: str) -> int:
    """Depth of a tree-string line = column of its ``+- `` / ``:- ``
    connector (the root line has none → -1). ``:`` bars to the left of
    the connector are ancestors' vertical rules, not this node's depth."""
    return max(line.rfind("+- "), line.rfind(":- "))


def collapse_cached_repeats(plan: str) -> str:
    """Canonicalize a plan tree-string for shape counting (ADVICE r9 #2):
    an unmaterialized ``persist()`` prints its FULL cached child under
    ``InMemoryRelation`` at every consumer, so a frame persisted for k
    consumers inflates every marker in its subtree k-fold — and the
    count then drifts whenever a consumer is added or a persist moves
    (the r9 defect: 42 → 171 broadcast prints from one ``cand.persist()``).
    Keep the first print of each distinct cached subtree (identity =
    subtree text with expr/plan ids stripped, since ids are re-allocated
    per consumer) and drop the repeats, so the snapshot counts the
    cached plan's cost ONCE — which is what execution pays."""
    lines = plan.splitlines()
    out: list[str] = []
    seen: set[str] = set()
    i = 0
    while i < len(lines):
        line = lines[i]
        out.append(line)
        i += 1
        if "InMemoryRelation" in line:
            col = _connector_col(line)
            sub: list[str] = []
            while i < len(lines) and _connector_col(lines[i]) > col:
                sub.append(lines[i])
                i += 1
            # identity must ignore indentation too: the same cached plan
            # prints with ':' ancestor bars under one consumer and plain
            # spaces under the last Union branch — key each line by its
            # depth RELATIVE to the InMemoryRelation plus its text.
            key = _ID_NOISE.sub(
                "",
                "\n".join(
                    f"{_connector_col(s) - col}|{s[_connector_col(s) + 3:]}"
                    for s in sub
                ),
            )
            if key not in seen:
                seen.add(key)
                out.extend(sub)
    return "\n".join(out)


def plan_shape(df: DataFrame) -> dict[str, int]:
    """Counts of the scale-critical physical markers in the query's
    INITIAL physical plan (pre-AQE — the statically chosen strategies;
    a single print, unlike explain('formatted') which prints each node
    twice), after collapsing repeated prints of persisted subtrees
    (see collapse_cached_repeats). Zero-count markers are omitted so
    snapshots read tight."""
    plan = collapse_cached_repeats(
        df._jdf.queryExecution().executedPlan().toString()
    )
    out = {}
    for key, pat in _SHAPE_MARKERS.items():
        n = len(re.findall(pat, plan))
        if n:
            out[key] = n
    return out


#: queries whose exact marker COUNTS are inherently cache-state dependent
#: (ADVICE r9 #2): their decision plan shares persisted AND unpersisted
#: subtrees across many consumers, building them runs actions (the CC
#: convergence loop) that materialize caches mid-build, and broadcast-vs-
#: SMJ choices shift once cached sizes are known — so the printed counts
#: drift with run order and with every persist added or removed (the r9
#: red-suite defect: 42 -> 171 broadcast prints from one ``persist()``).
#: For these, the snapshot pins only the order-stable scale-killer
#: invariants; their wall-clock is gated by the bench and their plan
#: hygiene by test_side_effecting_queries_pass_lints_in_isolation.
CACHE_SENSITIVE_SHAPES = {
    "crawl_admission_decisions",
    "vector_admission_decisions",
    "decontaminating_admission_decisions",
    "decontaminating_vector_admission",
}

#: markers that must NEVER appear, any count of which is a defect — the
#: reduced shape pinned for CACHE_SENSITIVE_SHAPES queries.
_KILLER_MARKERS = ("cartesian", "broadcast_nl_join")


def snapshot_shape(name: str, df: DataFrame) -> dict[str, int]:
    """The shape recorded in tests/plan_shapes.json for query ``name``:
    full marker counts, reduced to killer-marker counts (normally the
    empty dict — an assertion that no CartesianProduct or
    BroadcastNestedLoopJoin ever appears) for CACHE_SENSITIVE_SHAPES."""
    shape = plan_shape(df)
    if name in CACHE_SENSITIVE_SHAPES:
        return {k: shape[k] for k in _KILLER_MARKERS if k in shape}
    return shape
