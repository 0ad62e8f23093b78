"""Unit contracts for the round-3 training-pipeline operators: PII scrub,
repetition signals, chunking, weighted mixing, int8 quantization."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cses2humio_spark.functions.text import (
    dup_ngram_fraction,
    ngram_strings,
    pii_count,
    pii_scrub,
    top_token_fraction,
)
from cses2humio_spark.functions.vectors import dequantize_error, quantize_int8
from cses2humio_spark.operators.chunking import chunk_documents, token_chunks

from tests.conftest import SF_ORACLE


# ---- PII scrub ----------------------------------------------------------


def _scrub_one(spark, text: str) -> str:
    return (
        spark.createDataFrame([Row(t=text)])
        .select(pii_scrub(F.col("t")).alias("s"))
        .first()["s"]
    )


def test_pii_scrub_redacts_all_three_kinds(spark):
    out = _scrub_one(
        spark,
        "mail a.b+c@sub.example.org from 192.168.0.1 call +45 12 34 56 78 now",
    )
    assert out == "mail <EMAIL> from <IP> call <PHONE> now"


def test_pii_scrub_is_idempotent_and_counts_match(spark):
    text = "x@y.dk and 10.0.0.255 and 555-0199-8812"
    df = spark.createDataFrame([Row(t=text)])
    counts = df.select(
        pii_count(F.col("t"), "email").alias("e"),
        pii_count(F.col("t"), "ipv4").alias("i"),
        pii_count(F.col("t"), "phone").alias("p"),
    ).first()
    assert (counts["e"], counts["i"], counts["p"]) == (1, 1, 1)
    once = _scrub_one(spark, text)
    assert _scrub_one(spark, once) == once
    residual = (
        spark.createDataFrame([Row(t=once)])
        .select(
            (
                pii_count(F.col("t"), "email")
                + pii_count(F.col("t"), "ipv4")
                + pii_count(F.col("t"), "phone")
            ).alias("n")
        )
        .first()["n"]
    )
    assert residual == 0


def test_pii_scrub_leaves_clean_text_alone(spark):
    text = "no contact details here, just words and 42 numbers"
    assert _scrub_one(spark, text) == text


# ---- repetition signals -------------------------------------------------


def test_ngram_and_repetition_edges(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, t="a b a b a"),  # bigrams: ab ba ab ba -> 2 distinct of 4
            Row(id=2, t="one"),  # < n tokens -> empty grams, frac 0
            Row(id=3, t="x x x x"),  # all same token
        ]
    )
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            F.size(ngram_strings(F.col("t"), 2)).alias("n_grams"),
            dup_ngram_fraction(F.col("t"), 2).alias("dup"),
            top_token_fraction(F.col("t")).alias("top"),
        ).collect()
    }
    assert got[1]["n_grams"] == 4 and got[1]["dup"] == 0.5
    assert got[2]["n_grams"] == 0 and got[2]["dup"] == 0.0 and got[2]["top"] == 1.0
    assert got[3]["dup"] == pytest.approx(2 / 3, abs=1e-6)
    assert got[3]["top"] == 1.0


# ---- chunking -----------------------------------------------------------


def test_token_chunks_cover_every_token_with_overlap(spark):
    n_tokens, size, stride = 95, 40, 30
    text = " ".join(f"t{i}" for i in range(n_tokens))
    rows = (
        spark.createDataFrame([Row(t=text)])
        .select(F.posexplode(token_chunks(F.col("t"), size, stride)))
        .collect()
    )
    # 1 + ceil((95-40)/30) = 3 chunks; windows [1..40],[31..70],[61..95]
    assert [len(r["col"]) for r in rows] == [40, 40, 35]
    seen = {tok for r in rows for tok in r["col"]}
    assert seen == {f"t{i}" for i in range(n_tokens)}
    # consecutive chunks overlap by size - stride tokens
    assert rows[0]["col"][30:] == rows[1]["col"][:10]


def test_token_chunks_single_chunk_when_short(spark):
    rows = (
        spark.createDataFrame([Row(t="a b c")])
        .select(F.posexplode(token_chunks(F.col("t"), 40, 30)))
        .collect()
    )
    assert len(rows) == 1 and rows[0]["col"] == ["a", "b", "c"]


def test_chunk_documents_fp_is_chunk_dedup_key(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b c d"), Row(doc_id=2, text="a b c d")]
    )
    out = chunk_documents(df, "doc_id", "text", chunk_size=2, stride=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_fp"])
    # identical docs -> identical chunk fingerprint sequences
    assert by_doc[1] == by_doc[2]
    assert len(by_doc[1]) == 2


def test_chunk_documents_invalid_stride_raises():
    with pytest.raises(ValueError):
        token_chunks(F.lit("x"), chunk_size=10, stride=0)
    with pytest.raises(ValueError):
        token_chunks(F.lit("x"), chunk_size=10, stride=11)


# ---- quantization -------------------------------------------------------


def test_quantize_int8_roundtrip_error_bounded(spark):
    vec = [0.5, -1.0, 0.25, 0.0, 1.0, -0.125]
    df = spark.createDataFrame([Row(v=vec)])
    scale, q = quantize_int8(F.col("v"))
    row = df.select(
        scale.alias("s"),
        q.alias("q"),
        dequantize_error(F.col("v"), scale, q).alias("err"),
    ).first()
    assert row["s"] == pytest.approx(1.0 / 127.0)
    assert max(row["q"]) <= 127 and min(row["q"]) >= -127
    # reconstruction error bounded by scale/2 per element in RMS
    assert row["err"] <= row["s"] / 2 + 1e-12
    deq = [qi * row["s"] for qi in row["q"]]
    rms = math.sqrt(sum((a - b) ** 2 for a, b in zip(vec, deq)) / len(vec))
    assert row["err"] == pytest.approx(rms, abs=1e-12)


def test_quantize_int8_zero_vector(spark):
    df = spark.createDataFrame([Row(v=[0.0, 0.0, 0.0])])
    scale, q = quantize_int8(F.col("v"))
    row = df.select(
        scale.alias("s"), q.alias("q"),
        dequantize_error(F.col("v"), scale, q).alias("err"),
    ).first()
    assert row["s"] == 0.0 and row["q"] == [0, 0, 0] and row["err"] == 0.0


# ---- end-to-end sanity on real testdata ---------------------------------


def test_pii_redaction_residual_is_zero_on_testdata(spark):
    from cses2humio_spark.queries import QUERIES

    rows = QUERIES["pii_redaction_stats"](spark, SF_ORACLE).collect()
    assert rows and all(r["n_residual"] == 0 for r in rows)
    assert all(r["n_emails"] == r["n_docs"] for r in rows)
    assert all(r["n_ips"] == r["n_docs"] for r in rows)
    assert all(r["n_phones"] == r["n_docs"] for r in rows)


def test_token_budget_two_phase_matches_naive_global_window(spark):
    """The banded running sum must select the EXACT same documents as the
    textbook single-sort global window (quality desc, doc_id ties)."""
    from pyspark.sql.window import Window

    from cses2humio_spark.functions.text import quality_score, token_count
    from cses2humio_spark.queries import QUERIES
    from cses2humio_spark.sources.catalog import load_table

    d = load_table(spark, SF_ORACLE, "documents").select(
        "doc_id",
        "lang",
        quality_score(F.col("text")).alias("q"),
        token_count(F.col("text")).alias("nt"),
    )
    total = d.agg(F.sum("nt")).first()[0]
    budget = int(0.4 * total)
    w = Window.orderBy(F.col("q").desc(), "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = (
        d.withColumn("cum", F.sum("nt").over(w))
        .where(F.col("cum") <= budget)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_selected"),
            F.sum("nt").alias("selected_tokens"),
        )
    )
    naive_rows = {
        r["lang"]: (r["n_selected"], r["selected_tokens"])
        for r in naive.collect()
    }
    got = {
        r["lang"]: (r["n_selected"], r["selected_tokens"])
        for r in QUERIES["token_budget_selection"](spark, SF_ORACLE).collect()
        if r["n_selected"] > 0
    }
    assert got == naive_rows


def test_lang_balance_weights_sum_to_one(spark):
    from cses2humio_spark.queries import QUERIES

    rows = QUERIES["lang_balance_weights"](spark, SF_ORACLE).collect()
    assert abs(sum(r["balance_weight"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-4
    # inverse-frequency: fewer tokens -> strictly larger weight
    ordered = sorted(rows, key=lambda r: r["lang_tokens"])
    weights = [r["balance_weight"] for r in ordered]
    assert weights == sorted(weights, reverse=True)


def test_source_mix_rates_monotone_on_testdata(spark):
    from cses2humio_spark.queries import QUERIES

    rows = QUERIES["source_mix_sample_counts"](spark, SF_ORACLE).collect()
    by_src = {r["source"]: r for r in rows}
    # src9 samples at 1.0 -> keeps everything
    assert by_src["src9"]["n_kept"] == by_src["src9"]["n_docs"]
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"]


def test_hypothesis_chunking_invariants(spark):
    """For ANY (n_tokens, chunk_size, stride) with 0 < stride <=
    chunk_size: chunks cover every token exactly, consecutive chunks
    overlap by chunk_size - stride (except a shorter tail), no chunk
    exceeds chunk_size, and only the final chunk may be shorter than
    the overlap-adjusted minimum."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    geometry = st.tuples(
        st.integers(1, 120),  # n_tokens
        st.integers(1, 40),   # chunk_size
    ).flatmap(
        lambda t: st.tuples(
            st.just(t[0]), st.just(t[1]), st.integers(1, t[1])  # stride
        )
    )

    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(geometry)
    def run(g):
        n, size, stride = g
        text = " ".join(f"t{i}" for i in range(n))
        rows = (
            spark.createDataFrame([(text,)], "t string")
            .select(F.posexplode(token_chunks(F.col("t"), size, stride)))
            .orderBy("pos")
            .collect()
        )
        chunks = [r["col"] for r in rows]
        # expected chunk count from the closed form
        expect_chunks = 1 if n <= size else 1 + -(-(n - size) // stride)
        assert len(chunks) == expect_chunks
        assert all(len(c) <= size for c in chunks)
        assert all(c for c in chunks)  # never an empty chunk
        # chunk i starts at token i*stride; covers contiguous slice
        for i, c in enumerate(chunks):
            start = i * stride
            assert c == [f"t{j}" for j in range(start, min(start + size, n))]
        # full coverage
        assert {tok for c in chunks for tok in c} == {f"t{i}" for i in range(n)}

    run()


def test_duplicate_span_coverage_union_and_alignment(spark):
    """Hand-built corpus pins the span semantics: (1) overlapping dup
    windows count UNION positions, not sum; (2) a duplicated span is
    caught at ANY alignment (stride-1), which strided chunk fingerprints
    would miss; (3) docs shorter than the window and fully-unique docs
    report zero."""
    from cses2humio_spark.operators.dedup import duplicate_span_coverage

    shared = "q w e r t y u i"  # 8 tokens -> exactly one shared window
    docs = spark.createDataFrame(
        [
            # doc 0: shared span at offset 2 of 12 tokens
            (0, "a0 b0 " + shared + " c0 d0"),
            # doc 1: the SAME span at offset 3 (different alignment)
            (1, "a1 b1 c1 " + shared + " d1"),
            # doc 2: shared span twice, overlapping itself via repeat —
            # 'q w e r t y u i q w e r t y u i' has the 8-gram at
            # offsets 0 and 8, plus every rotation in between is unique
            (2, shared + " " + shared),
            # doc 3: completely unique text
            (3, "z1 z2 z3 z4 z5 z6 z7 z8 z9"),
            # doc 4: shorter than the window
            (4, "t1 t2 t3"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_tokens, r.n_dup_tokens, r.dup_ratio)
        for r in duplicate_span_coverage(docs, "doc_id", "text", width=8).collect()
    }
    assert out[0] == (12, 8, round(8 / 12, 6))
    assert out[1] == (12, 8, round(8 / 12, 6))
    # doc 2: windows at offsets 0 and 8 match docs 0/1; the 9th..15th
    # windows ('w e r t y u i q', ...) exist only inside doc 2 itself —
    # within-doc repeats are NOT cross-document duplicates, so coverage
    # is the union of [0,8) and [8,16) = all 16 positions
    assert out[2] == (16, 16, 1.0)
    assert out[3] == (9, 0, 0.0)
    assert out[4] == (3, 0, 0.0)


def test_trim_duplicate_spans_removes_exactly_the_coverage(spark):
    """The trim must remove EXACTLY the positions duplicate_span_coverage
    reports: kept_tokens == n_tokens - n_dup_tokens for every doc, the
    shared span disappears from both carriers, and unique text survives
    verbatim."""
    from cses2humio_spark.operators.dedup import (
        duplicate_span_coverage,
        trim_duplicate_spans,
    )

    shared = "q w e r t y u i"
    docs = spark.createDataFrame(
        [
            (0, "a0 b0 " + shared + " c0 d0"),
            (1, "a1 b1 c1 " + shared + " d1"),
            (3, "z1 z2 z3 z4 z5 z6 z7 z8 z9"),
        ],
        "doc_id long, text string",
    )
    cov = {
        r.doc_id: r.n_dup_tokens
        for r in duplicate_span_coverage(docs, "doc_id", "text", width=8).collect()
    }
    out = {
        r.doc_id: (r.n_tokens, r.kept_tokens, r.trimmed_text)
        for r in trim_duplicate_spans(docs, "doc_id", "text", width=8).collect()
    }
    for d, (n, kept, _txt) in out.items():
        assert kept == n - cov[d], (d, n, kept, cov[d])
    assert out[0][2] == "a0 b0 c0 d0"
    assert out[1][2] == "a1 b1 c1 d1"
    assert out[3][2] == "z1 z2 z3 z4 z5 z6 z7 z8 z9"


def test_bigram_lm_scores_gibberish_above_fluent(spark, tmp_path):
    """The perplexity signal must point the right way: documents made of
    corpus-typical repeated bigrams score LOW mean NLL; a document of
    one-off shuffled tokens (every bigram unseen elsewhere, count 1)
    scores HIGH; and the score is partitioning-invariant (exact-decimal
    sum of pre-rounded terms)."""
    import os

    from cses2humio_spark.queries import QUERIES

    fluent = "the quick brown fox jumps over the lazy dog " * 5
    rows = [(i, fluent) for i in range(8)]
    rows.append((100, "zq xv jk wp mn bt lc dr fs gh"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {
        r.doc_id: r.avg_nll
        for r in QUERIES["bigram_lm_doc_quality"](spark, d).collect()
    }
    assert out[100] > out[0] * 1.5, out
    # partitioning invariance: same answer from a repartitioned source
    docs.repartition(7).write.mode("overwrite").parquet(f"{d}2/documents.parquet")
    out2 = {
        r.doc_id: r.avg_nll
        for r in QUERIES["bigram_lm_doc_quality"](spark, f"{d}2").collect()
    }
    assert out == out2


def test_bigram_lm_model_cache_evicted_on_gc(spark):
    """VERDICT r7 #6: the bigram query used to leave a corpus-sized
    persisted frame behind per invocation. Now only the model-sized
    bigram-count table persists, and `session.evict_on_gc` drops it once
    the caller releases the result — a long-lived engine session running
    the query N times must not accumulate N cache entries."""
    import gc

    from cses2humio_spark.queries import QUERIES
    from tests.conftest import SF_SMALL

    spark.catalog.clearCache()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty()
    df = QUERIES["bigram_lm_doc_quality"](spark, SF_SMALL)
    df.collect()
    assert not cm.isEmpty()  # model cache alive while the result is held
    del df
    gc.collect()
    assert cm.isEmpty(), "bigram model cache leaked past result GC"


def test_eval_contamination_planted_overlap(spark):
    """Planted fixture: a train doc embedding a verbatim eval 8-gram is
    flagged with the exact matched count; a clean doc reports 0; a doc
    shorter than n reports (0, 0, 0.0) instead of vanishing."""
    from cses2humio_spark.operators.dedup import eval_contamination

    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    # 10 tokens -> 3 distinct 8-grams in the eval doc
    train = spark.createDataFrame(
        [
            # contains eval tokens 1..8 verbatim, plus its own tail:
            # 11 tokens -> 4 8-grams, exactly 1 matching
            (1, "the quick brown fox jumps over the lazy extra tail words"),
            (2, "completely different content with no overlap at all here"),
            (3, "too short"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_ngrams, r.n_matched, r.contamination)
        for r in eval_contamination(train, ev, n=8).collect()
    }
    assert got[1] == (4, 1, 0.25)
    assert got[2] == (2, 0, 0.0)  # 9 tokens -> 2 distinct 8-grams
    assert got[3] == (0, 0, 0.0)


def test_eval_contamination_plan_broadcasts_eval_side(spark):
    """The scale contract: the eval fingerprint side must BROADCAST (no
    shuffle of the training explosion against a hash-partitioned eval
    table), and the training text column must not appear in any
    exchange."""
    from cses2humio_spark.operators.dedup import eval_contamination
    from cses2humio_spark.sources.catalog import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    df = eval_contamination(
        docs.filter(F.col("doc_id") % 7 != 0),
        docs.filter(F.col("doc_id") % 7 == 0),
        n=8,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan[:1500]


def test_source_overlap_identical_sources_jaccard_one(spark):
    """Two sources holding the same documents must report jaccard 1.0;
    a disjoint third source pairs with neither (absence IS the zero)."""
    from cses2humio_spark.operators.dedup import source_ngram_overlap

    body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            (1, "a", body),
            (2, "b", body),
            (3, "c", "totally different words one two three four five six"),
        ],
        "doc_id long, source string, text string",
    )
    rows = {
        (r.src_a, r.src_b): (r.n_inter, r.n_a, r.n_b, r.jaccard)
        for r in source_ngram_overlap(df, n=8).collect()
    }
    assert rows == {("a", "b"): (3, 3, 3, 1.0)}  # 10 tokens -> 3 8-grams
