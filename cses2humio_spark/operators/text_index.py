"""Persisted inverted text index: the build-once / search-many split for
LEXICAL retrieval (Okapi BM25) — the posting-list counterpart of
``operators/ann_index.PQIndex`` (vectors) and
``operators/dedup_index.MinHashIndex`` (near-dup signatures). With this
module every retrieval arm of the engine has a standing-index lifecycle:
ANN searches codes, dedup probes signatures, and BM25 now probes
postings — none of them re-reads corpus payload at query time.

The fused query operator (``queries/llm.bm25_search_top20``) re-tokenizes
the whole corpus inside every run — right for oracle-checkability, wrong
for the production shape of a search service: the corpus is tokenized
ONCE, queries arrive forever, and each query must touch only the posting
lists of its own terms. ``InvertedTextIndex`` persists exactly the
artifact the fused plan computes inline:

- ``seg=<v>``: postings ``(tb, tok, doc_id, tf, dl)`` — one row per
  distinct (document, token), PARTITIONED BY ``tb`` (a stable
  ``xxhash64(tok) mod n_buckets`` token bucket) so a query's term filter
  becomes DIRECTORY pruning at the scan: a 3-term query reads at most 3
  of ``n_buckets`` partitions no matter how large the corpus. The
  document length ``dl`` is DENORMALIZED into the posting row (8 bytes)
  so scoring needs no join against a corpus-sized doc-length table.
- ``dl=<v>``: doc lengths ``(doc_id, dl)`` — the narrow table the
  collection statistics (N, avgdl) are computed from at search time.
  Computing them from this table rather than pinning them in the
  manifest keeps them exact under tombstoned deletes for free; the scan
  is two scalar aggregates over a (bigint, bigint) table, embarrassingly
  parallel and tiny next to the corpus.

At 100 TB of documents the postings are a few TB (they carry token
hashes' worth of text once, not per query), the doc-length table is
~16 B/doc, and a search shuffles only |query terms| posting lists.

Transaction machinery is the shared ``VersionedSegmentStore``
(``operators/index_store.py``): immutable segments, manifest per version,
atomic ``_LATEST``, the dedicated ``last_batch_id`` replay guard
(exactly-once under foreachBatch replay), CDC-style tombstone deletes,
compaction, and grace-window pruning. Geometry (tokenizer id, bucket
count) is pinned in ``_TABLE.json`` — postings built under a different
tokenization are incomparable, so reopening with different parameters is
a loud error.

Reference parity note: the reference connector (app.py) has no retrieval
surface; this implements the LLM-pipeline / log-search production
lifecycle for the engine's BM25 operator (SURVEY §2 retrieval family).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cses2humio_spark.operators.index_store import VersionedSegmentStore

#: Tokenizer contract pinned in the geometry: whitespace split of the
#: trimmed text — EXACTLY the fused bm25/tfidf queries' tokenization, so
#: the split-vs-fused equality contract holds token-for-token.
_TOKENIZER_ID = "ws-split-v1"


class InvertedTextIndex(VersionedSegmentStore):
    """Versioned on-disk BM25 posting-list index over documents."""

    def __init__(
        self,
        index_dir: str,
        n_buckets: int = 64,
        positional: bool = False,
        id_col: str = "doc_id",
        text_col: str = "text",
        keep_versions: int = 2,
        guard_duplicates: bool = False,
    ):
        if n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
        self.n_buckets = n_buckets
        self.positional = positional
        self.guard_duplicates = guard_duplicates
        self.id_col, self.text_col = id_col, text_col
        super().__init__(
            index_dir,
            {
                "tokenizer": _TOKENIZER_ID,
                "n_buckets": n_buckets,
                "positional": positional,
            },
            keep_versions,
        )

    def _live_artifacts(self, manifest: dict) -> dict[str, set[int]]:
        return {
            r"seg=(-?\d+)": set(manifest["segments"]),
            r"dl=(-?\d+)": set(manifest["segments"]),
            r"tomb=(-?\d+)": set(manifest.get("tombstones", [])),
        }

    def _seg_dir(self, seg: int) -> str:
        return os.path.join(self.index_dir, f"seg={seg}")

    def _dl_dir(self, seg: int) -> str:
        return os.path.join(self.index_dir, f"dl={seg}")

    def _tomb_dir(self, version: int) -> str:
        return os.path.join(self.index_dir, f"tomb={version}")

    def _token_bucket(self, tok) -> F.Column:
        return F.pmod(F.xxhash64(tok), F.lit(self.n_buckets)).cast("int")

    def _postings(self, docs: DataFrame) -> DataFrame:
        """ONE pass over document text → the posting table.

        Tokenize (the pinned whitespace split), count term frequencies
        per (doc, token) — one shuffle keyed on the pair — then
        denormalize the document length onto each posting row with a
        window over the aggregated postings (``dl = SUM(tf) OVER doc``,
        exactly the token count). The window costs one further shuffle
        of the already-compact postings, but keeps the whole build a
        single lineage: a join against a dl aggregate would re-evaluate
        the explode subtree once per consumer (the token stream is the
        expensive thing at 100 TB — it must be materialized exactly
        once). The separate doc-length artifact is NOT computed here:
        the writers derive it by reading back the just-written postings
        parquet (compact, text-free) instead of re-tokenizing."""
        from pyspark.sql import Window

        # ws1: every INTERNAL separator of this doc is exactly one
        # space (no tabs/newlines, no runs) — the per-doc flag behind
        # the routed-phrase identity (hql.py::_route_free_text_stage):
        # under ws1 the trimmed text IS the tokens joined by single
        # spaces, so a quoted-phrase substring test is answerable from
        # positional postings alone. Computed HERE because this is the
        # one pass that reads the text; it rides each posting row (one
        # RLE-compressed boolean) into the doc-length artifact so no
        # second corpus scan ever recomputes it.
        ws1 = ~F.coalesce(
            F.trim(F.col(self.text_col)).rlike(r"\s\s|[^\S ]"),
            F.lit(False),
        )
        toks = docs.select(
            F.col(self.id_col).alias("doc_id"),
            ws1.alias("ws1"),
            F.posexplode(
                F.split(F.trim(F.col(self.text_col)), r"\s+")
            ).alias("pos", "tok"),
        )
        if self.positional:
            # positional mode: the posting row also carries the sorted
            # in-document positions (array<int>) — tf is its size, so
            # phrase adjacency is answerable from postings alone.
            tf = toks.groupBy("doc_id", "tok").agg(
                F.count(F.lit(1)).alias("tf"),
                F.min("ws1").alias("ws1"),
                F.sort_array(F.collect_list("pos")).alias("pos"),
            )
            extra = ["pos"]
        else:
            tf = toks.groupBy("doc_id", "tok").agg(
                F.count(F.lit(1)).alias("tf"),
                F.min("ws1").alias("ws1"),
            )
            extra = []
        return tf.select(
            self._token_bucket(F.col("tok")).alias("tb"),
            "tok",
            "doc_id",
            "tf",
            F.sum("tf").over(Window.partitionBy("doc_id")).alias("dl"),
            "ws1",
            *extra,
        )

    def _write_segment(self, docs: DataFrame, version: int) -> tuple[bool, int]:
        """Write the postings for ``docs`` as segment ``version``, then
        derive its doc-length artifact FROM the written postings (one
        (doc_id, dl) row per doc via max — dl is constant within a doc)
        — corpus text is tokenized exactly once per segment. Returns
        ``(seg_ws1, n_posting_rows)``: the segment's corpus-wide ``ws1``
        AND (computed from the just-written narrow doc-length artifact —
        17 B/doc, one scalar aggregate) so the writers can COMMIT it
        into the manifest (``ws_single_all`` then answers from manifest
        metadata instead of re-aggregating a corpus-sized table on every
        routed phrase query; ADVICE r12), and the posting row count,
        which rides the postings WRITE as an Observation so the ingest
        path can detect an empty micro-batch without the standalone
        ``isEmpty`` job it used to launch (r14). An empty segment skips
        the doc-length derivation outright — reading back an empty
        partitioned parquet dir would fail schema inference."""
        from pyspark.sql import Observation

        obs_n = Observation()
        self._write_dir(
            self._postings(docs).observe(
                obs_n, F.count(F.lit(1)).alias("n")
            ),
            self._seg_dir(version),
            partition_by=["tb"],
        )
        n_rows = int(obs_n.get["n"] or 0)
        if n_rows == 0:
            return False, 0
        spark = docs.sparkSession
        written = spark.read.option("basePath", self.index_dir).parquet(
            self._seg_dir(version)
        )
        dl = written.groupBy("doc_id").agg(
            F.max("dl").alias("dl"), F.min("ws1").alias("ws1")
        )
        # the segment-wide ws1 AND rides the dl WRITE as an Observation —
        # the same min(coalesce(ws1, false)) the old read-back job
        # computed, now collected during the action that already runs
        # (one fewer job per segment commit; r14)
        obs = Observation()
        self._write_dir(
            dl.observe(
                obs, F.min(F.coalesce(F.col("ws1"), F.lit(False))).alias("w")
            ),
            self._dl_dir(version),
        )
        w = obs.get["w"]
        return (bool(w) if w is not None else False), n_rows

    # -- build ---------------------------------------------------------------

    def build(self, docs: DataFrame) -> int:
        """Tokenize the full corpus and commit as a fresh version (prior
        segments are NOT carried forward — a rebuild supersedes them;
        tombstones clear, since the handed-in corpus is the new truth).
        ``last_batch_id`` carries forward so a restarted ingest stream's
        replay guard survives a rebuild. The unique-doc_id ingest
        contract (see ``__call__``) applies within ``docs`` too: one row
        per document id, or the duplicate rows double-count in every
        collection statistic."""
        latest = self.latest_version()
        version = -1 if latest is None else latest + 1
        seg_ws1, _n = self._write_segment(docs, version)
        prior_lb = (
            self._last_batch_id(self._load_manifest(latest), latest)
            if latest is not None
            else -1
        )
        # An EMPTY corpus commits an empty segment list (mirroring
        # __call__'s n_rows guard; ADVICE r14): _write_segment skipped
        # the doc-length artifact, so registering the version would
        # commit a segment whose dl dir does not exist — every later
        # search/ws_single_all read of it would crash.
        self._write_manifest(
            version,
            {
                "segments": [version] if _n > 0 else [],
                "last_batch_id": prior_lb,
                "tombstones": [],
                "ws1": {str(version): seg_ws1} if _n > 0 else {},
            },
        )
        self._commit(version)
        self._prune(version)
        return version

    # -- streaming ingest ----------------------------------------------------

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch sink: tokenize the micro-batch's documents and
        append them as one immutable segment pair (postings + doclens);
        write amplification is O(|delta postings|), independent of index
        size. Replayed batches are skipped by the dedicated
        ``last_batch_id`` manifest field — exactly-once, and an
        interleaved compact()/rebuild/delete() can never shadow a
        genuine future batch id. Collection statistics need no
        maintenance: they are computed from the doc-length artifacts at
        search time, so an appended segment is immediately consistent.

        INGEST CONTRACT — append-only, unique doc ids: a doc_id must be
        indexed at most once across all live segments (the upstream
        admission dedup is the natural enforcer). Re-ingesting a live id
        would double-count it in tf/df/N/avgdl, break search_prefix's
        COUNT(*)-as-distinct-terms identity and cross-product the
        per-term doc_id joins in search_phrase — same class of breakage
        as the documented deleted-then-reingested case (resurrection
        only lands after a compact has dropped the tombstone).
        ``guard_duplicates=True`` enforces the contract in-band: the
        batch is anti-joined against the existing segment doc ids
        (UNFILTERED by tombstones, so the resurrection rule above is
        preserved exactly) before tokenization. The guard reads only the
        narrow (doc_id, dl) artifacts, but at billions of docs that
        anti-join shuffles a corpus-sized id table per micro-batch —
        it's off by default because the admission pipeline already
        guarantees uniqueness for free."""
        latest = self.latest_version()
        if latest is None:
            raise ValueError(
                f"{self.index_dir}: ingest before build() — the geometry "
                "must be committed before deltas can be tokenized"
            )
        manifest = dict(self._load_manifest(latest))
        if batch_id <= self._last_batch_id(manifest, latest):
            return  # replayed micro-batch: segment already committed
        version = latest + 1
        manifest["last_batch_id"] = batch_id
        if self.guard_duplicates and manifest["segments"]:
            spark = batch_df.sparkSession
            existing = spark.read.parquet(
                *[self._dl_dir(s) for s in manifest["segments"]]
            ).select("doc_id")
            batch_df = batch_df.join(
                existing,
                batch_df[self.id_col] == existing["doc_id"],
                "left_anti",
            )
        # Emptiness is detected from the segment write's own row-count
        # Observation (r14) — the standalone ``isEmpty`` pre-check cost
        # one extra job per micro-batch; an empty batch's postings write
        # is no dearer than the scan isEmpty ran. The unlisted segment
        # dir it leaves behind is reclaimed by the NEXT commit's
        # ``_prune`` (``_prune`` only removes artifact dirs with id <
        # the committed version, so this commit's own prune skips it);
        # readers are manifest-driven and never see it either way.
        seg_ws1, n_rows = self._write_segment(batch_df, version)
        if n_rows > 0:
            manifest["segments"] = list(manifest["segments"]) + [version]
            manifest["ws1"] = {
                **manifest.get("ws1", {}),
                str(version): seg_ws1,
            }
        self._write_manifest(version, manifest)
        self._commit(version)
        self._prune(version)

    # -- delete / compact ----------------------------------------------------

    def delete(self, ids: DataFrame) -> int:
        """Tombstone the given document ids (takedowns, dedup losers):
        commits an id-list artifact under the next version — O(|deleted|)
        bytes, no segment touched — and every search anti-joins live
        tombstones out immediately, INCLUDING from the collection
        statistics (N and avgdl shrink the moment the tombstone commits,
        because both are computed from the tombstone-filtered doc-length
        table). ``compact()`` physically drops the dead postings.
        Deleting an id not in the index is a no-op; re-ingesting a
        deleted id resurrects it only after a compact has dropped the
        tombstone."""
        latest = self.latest_version()
        if latest is None:
            raise ValueError(
                f"{self.index_dir}: delete before build() — nothing to "
                "tombstone"
            )
        manifest = dict(self._load_manifest(latest))
        manifest["last_batch_id"] = self._last_batch_id(manifest, latest)
        version = latest + 1
        self._write_dir(
            ids.select(F.col(self.id_col).alias("doc_id")).distinct(),
            self._tomb_dir(version),
        )
        manifest["tombstones"] = list(manifest.get("tombstones", [])) + [
            version
        ]
        self._write_manifest(version, manifest)
        self._commit(version)
        self._prune(version)
        return version

    def compact(self, spark: SparkSession) -> int:
        """Merge all live segments into ONE and physically drop
        tombstoned postings — the small-files + deferred-delete answer
        for a long-running ingest stream. Search results are identical
        before and after by construction (the surviving rows are the
        same, and statistics are recomputed from the surviving doc
        lengths either way); ``last_batch_id`` carries forward
        untouched."""
        latest = self.latest_version()
        if latest is None:
            raise ValueError(
                f"{self.index_dir}: nothing to compact — run build() first"
            )
        manifest = dict(self._load_manifest(latest))
        manifest["last_batch_id"] = self._last_batch_id(manifest, latest)
        version = latest + 1
        survivors = self.read_doclens(spark, latest)
        if survivors.isEmpty():
            # every document is tombstoned: the merged segment would be
            # an EMPTY parquet dir, and a later read would die with
            # Spark's "unable to infer schema" instead of search()'s
            # intended "index is empty" — refuse loudly before touching
            # the manifest (the pre-compact version stays fully live)
            raise ValueError(
                f"{self.index_dir}: index is empty after compaction — "
                "every document is tombstoned; rebuild() with a fresh "
                "corpus instead of compacting away the last row"
            )
        self._write_dir(
            self.read_postings(spark, latest),
            self._seg_dir(version),
            partition_by=["tb"],
        )
        self._write_dir(survivors, self._dl_dir(version))
        # re-derive the merged segment's ws1 AND from the SURVIVORS: a
        # tombstoned mixed-separator doc no longer drags the flag False,
        # so a compact can re-enable phrase routing. NULL ws1 (rows from
        # pre-flag segments) coalesces to False — unknown separator
        # shapes must force the scan path (ADVICE r12).
        if "ws1" in survivors.columns:
            row = survivors.agg(
                F.min(F.coalesce(F.col("ws1"), F.lit(False))).alias("w")
            ).collect()[0]
            seg_ws1 = bool(row["w"]) if row["w"] is not None else False
        else:
            seg_ws1 = False
        manifest["segments"] = [version]
        manifest["tombstones"] = []
        manifest["ws1"] = {str(version): seg_ws1}
        self._write_manifest(version, manifest)
        self._commit(version)
        self._prune(version)
        return version

    # -- read / search -------------------------------------------------------

    def read_tombstones(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame | None:
        man = self._load_manifest(self._resolve_version(version))
        tombs = man.get("tombstones", [])
        if not tombs:
            return None
        return (
            spark.read.option("basePath", self.index_dir)
            .parquet(*[self._tomb_dir(t) for t in tombs])
            .select("doc_id")
            .distinct()
        )

    def read_postings(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        """The posting table as of ``version`` (default latest): the
        union of that manifest's immutable segments minus tombstoned ids
        (broadcast anti-join). ``basePath`` anchors partition discovery
        at the index root because ``seg=<id>``/``tb=<b>`` dirs are
        key=value-shaped — the ``tb`` partition column survives into the
        frame so a term filter prunes directories."""
        at = self._resolve_version(version)
        man = self._load_manifest(at)
        if not man["segments"]:
            # zero live segments (an empty-corpus build commits an empty
            # list — ADVICE r14): refuse loudly instead of handing
            # spark.read.parquet() zero paths (UNABLE_TO_INFER_SCHEMA)
            raise ValueError(
                f"{self.index_dir}: index is empty at version {at} — "
                "no live segments to read"
            )
        post = (
            spark.read.option("basePath", self.index_dir)
            .parquet(*[self._seg_dir(s) for s in man["segments"]])
            .drop("seg")
        )
        tombs = self.read_tombstones(spark, at)
        if tombs is not None:
            post = post.join(F.broadcast(tombs), on="doc_id", how="left_anti")
        return post

    def read_doclens(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        at = self._resolve_version(version)
        man = self._load_manifest(at)
        if not man["segments"]:
            raise ValueError(
                f"{self.index_dir}: index is empty at version {at} — "
                "no live segments to read"
            )
        # No basePath here (unlike read_postings): the artifact dirs are
        # named ``dl=<v>``, and root-anchored partition discovery would
        # surface a partition column named ``dl`` colliding with the data
        # column. Passing the leaf dirs directly treats each as its own
        # root — only the file columns (doc_id, dl) come back.
        dl = spark.read.parquet(
            *[self._dl_dir(s) for s in man["segments"]]
        )
        tombs = self.read_tombstones(spark, at)
        if tombs is not None:
            # tombstones filter HERE, not just in search(): the
            # collection statistics (N, avgdl) and compact()'s rewritten
            # doc-length artifact must both exclude deleted docs, or a
            # compaction would clear the tombstone list while the dead
            # lengths keep inflating every surviving score
            dl = dl.join(F.broadcast(tombs), on="doc_id", how="left_anti")
        return dl

    def ws_single_all(
        self, spark: SparkSession, version: int | None = None
    ) -> bool:
        """True iff EVERY live document's internal separators are single
        spaces (the AND of the per-doc ``ws1`` flags the build recorded)
        — the corpus-wide precondition for routing quoted-phrase
        free-text through the positional postings
        (hql.py::_route_free_text_stage).

        Fast path: the per-segment AND is COMMITTED in the manifest at
        write time, so when every live segment carries an entry this is
        a metadata read — zero scans per routed phrase query (ADVICE
        r12: the previous implementation re-aggregated the corpus-sized
        doc-length table on every phrase stage). All-True over the
        manifest is exact even under tombstones (the live docs are a
        subset of the recorded ones, and an AND over a superset of True
        stays True on any subset); an all-recorded False with NO
        tombstones is exact for the same reason. The one case the
        manifest cannot answer exactly — some segment recorded False
        AND deletes exist (the offending doc may be tombstoned) — falls
        through to the exact aggregate over the tombstone-filtered
        doc-length artifact, as does any segment missing its entry
        (written by pre-flag code).

        The exact fallback coalesces NULL ws1 to False BEFORE the min:
        a mixed-generation index (pre-flag segments appended to by new
        code) reads NULL for the old docs, and ``min([True, NULL])`` is
        True under SQL aggregate NULL-skipping — which would route
        phrases over docs with unrecorded separator shapes (ADVICE r12,
        medium). Unknown must mean False. Indexes built entirely before
        the flag (no ``ws1`` column at all) and empty indexes answer
        False: the caller falls back to the scan path, never to a wrong
        answer."""
        at = self._resolve_version(version)
        man = self._load_manifest(at)
        recorded = man.get("ws1", {})
        segs = man.get("segments", [])
        if segs and all(str(s) in recorded for s in segs):
            if all(bool(recorded[str(s)]) for s in segs):
                return True
            if not man.get("tombstones"):
                return False
        dl = self.read_doclens(spark, at)
        if "ws1" not in dl.columns:
            return False
        row = dl.agg(
            F.min(F.coalesce(F.col("ws1"), F.lit(False))).alias("w")
        ).collect()[0]
        return bool(row["w"]) if row["w"] is not None else False

    def search(
        self,
        spark: SparkSession,
        terms: list[str],
        k: int = 20,
        k1: float = 1.2,
        b: float = 0.75,
        version: int | None = None,
    ) -> DataFrame:
        """Okapi BM25 top-k over the standing index (k1/b and the Lucene
        +1 IDF exactly as the fused ``bm25_search_top20``): filter the
        postings to the query terms — the ``tb`` equality rides the
        partition column, so only |terms| of ``n_buckets`` directories
        are scanned — compute per-term document frequencies from the
        filtered postings (a |terms|-row broadcast), score with the
        denormalized ``dl``, sum per document, TakeOrdered k with doc-id
        tie-break. Collection statistics (N, avgdl) are two scalar
        aggregates over the tombstone-filtered doc-length table — the
        only action at construction, and the only part of the plan that
        touches anything corpus-sized (a narrow 16 B/doc scan)."""
        if not terms:
            raise ValueError("search needs at least one term")
        at = self._resolve_version(version)
        dl = self.read_doclens(spark, at)  # tombstone-filtered
        n_docs, total_dl = dl.agg(
            F.count(F.lit(1)), F.sum("dl")
        ).collect()[0]
        if not n_docs:
            raise ValueError(
                f"{self.index_dir}: index is empty at version {at}"
            )
        avgdl = float(total_dl) / float(n_docs)
        buckets = self._buckets_of(spark, terms)
        post = self.read_postings(spark, at).filter(
            F.col("tb").isin(buckets) & F.col("tok").isin(list(terms))
        )
        df_ = post.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
        idf = F.log(
            (F.lit(float(n_docs)) - F.col("df") + 0.5)
            / (F.col("df") + 0.5)
            + 1.0
        )
        tfpart = (F.col("tf") * (k1 + 1.0)) / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
        )
        scored = (
            post.join(F.broadcast(df_), on="tok")
            .groupBy("doc_id")
            .agg(F.sum(idf * tfpart).alias("s"))
        )
        return (
            scored.orderBy(F.col("s").desc(), F.col("doc_id").asc())
            .limit(k)
            .select("doc_id", F.round("s", 6).alias("bm25"))
        )

    def search_prefix(
        self,
        spark: SparkSession,
        prefix: str,
        k: int = 20,
        version: int | None = None,
    ) -> DataFrame:
        """Prefix (wildcard ``prefix*``) term search: top-k documents by
        total occurrences of tokens starting with ``prefix``, with the
        matching-term count — ``(doc_id, tf_sum, n_terms)``.

        Scale shape — and an honest trade the exact-term paths don't
        have: hash token-buckets CANNOT prune a prefix (matching terms
        scatter across all ``n_buckets`` directories), so this reads
        every bucket's metadata. What still protects the scan is
        parquet predicate pushdown: ``startswith(tok, ...)`` reaches the
        scan as a StartsWith pushed filter (pinned in
        tests/test_text_index.py), so row groups whose tok min/max
        range excludes the prefix are skipped on statistics. Document
        text is never read, and the aggregation sees only surviving
        posting rows. A deployment that is prefix-heavy should sort
        postings by ``tok`` within buckets at compact() time to tighten
        those statistics — the layout knob, not a different algorithm."""
        if not prefix:
            raise ValueError("search_prefix needs a non-empty prefix")
        at = self._resolve_version(version)
        post = self.read_postings(spark, at).filter(
            F.col("tok").startswith(prefix)
        )
        # within one segment a (doc, tok) pair is one row, and a doc
        # lives in one segment — COUNT(*) is the distinct-term count
        per_doc = post.groupBy("doc_id").agg(
            F.sum("tf").alias("tf_sum"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        return per_doc.orderBy(
            F.col("tf_sum").desc(), F.col("doc_id").asc()
        ).limit(k)

    def search_phrase(
        self,
        spark: SparkSession,
        terms: list[str],
        version: int | None = None,
    ) -> DataFrame:
        """Exact phrase search over a POSITIONAL index: documents where
        ``terms`` occur at strictly consecutive token positions, with the
        occurrence count — ``(doc_id, n_occ)``, matches only.

        Plan shape: one pruned posting-list frame per phrase term
        (|terms| of ``n_buckets`` directories scanned, document text
        never read), equi-joined on doc_id — a document survives the
        join chain only if it contains EVERY term, so the adjacency
        check runs on the already-small intersection. Adjacency itself
        is pure-codegen array HOFs on the positional payload: an
        occurrence is a position p of terms[0] with terms[i] at p+i for
        every i (``filter`` over the first term's positions probing the
        others via ``array_contains``). No explode, no per-position
        shuffle — positions ride inside their posting row end to end."""
        if len(terms) < 2:
            raise ValueError(
                f"phrase search needs >= 2 terms, got {len(terms)}"
            )
        if not self.positional:
            raise ValueError(
                f"{self.index_dir}: phrase search needs a positional "
                "index — rebuild with positional=True (geometry is "
                "pinned; a flat index stores no positions)"
            )
        at = self._resolve_version(version)
        buckets = self._buckets_of(spark, terms)
        post = self.read_postings(spark, at).filter(
            F.col("tb").isin(buckets)
        )
        joined = None
        for i, t in enumerate(terms):
            side = post.filter(F.col("tok") == t).select(
                "doc_id", F.col("pos").alias(f"pos_{i}")
            )
            joined = side if joined is None else joined.join(
                side, on="doc_id"
            )
        return (
            joined.select(
                "doc_id",
                F.size(
                    F.expr(self._phrase_filter_expr(len(terms)))
                ).alias("n_occ"),
            )
            .filter(F.col("n_occ") > 0)
        )

    @staticmethod
    def _phrase_filter_expr(k: int) -> str:
        """SQL-expression spelling of the adjacency filter (the Column
        HOF API can't close over the lambda variable inside a prebuilt
        Column list — the classic lambda-arity trap — so the filter is
        built as an expression string: positions of term 0 that have
        term i at offset i for every i in 1..k-1)."""
        conds = " AND ".join(
            f"array_contains(pos_{i}, p + {i})" for i in range(1, k)
        )
        return f"filter(pos_0, p -> {conds})"

    def _buckets_of(self, spark: SparkSession, terms: list[str]) -> list[int]:
        """The token buckets the query terms live in, computed with the
        SAME JVM xxhash64 the build used (a reimplementation drifting by
        one bit would silently prune the wrong directories). The collect
        is bounded by |query terms| — a handful of rows, never
        corpus-sized."""
        rows = (
            spark.createDataFrame(
                [(t,) for t in terms], schema="tok string"
            )
            .select(self._token_bucket(F.col("tok")).alias("tb"))
            .collect()
        )
        return sorted({r["tb"] for r in rows})
