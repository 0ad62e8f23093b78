"""Multimodal columns (SURVEY.md §2.2): image/audio/video as opaque
``binary`` payloads with typed metadata, processed via Arrow-batched
``mapInPandas``.

The container has no image/audio libraries, so the *decode* step is stubbed
(``decode_media`` raises NotImplementedError for real codecs; a
deterministic byte-level "decode" stands in for tests/oracles). Everything
Spark-side — schema, partitioning, UDF signature, Arrow batch shape — is
real and is exactly what a production decode would plug into.

Scale notes:
- Payloads are the widest column by far; ``repartition_for_media`` spreads
  blobs by id hash BEFORE the Python stage so Arrow batches are balanced
  and no executor sees a skewed byte volume.
- ``mapInPandas`` streams Arrow record batches through Python — memory is
  bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``, not by
  partition size, so 100 MB videos don't need 100 MB × rows-per-partition
  of executor heap.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, "
    "meta struct<n_bytes: bigint, codec: string, duration_ms: bigint>"
)

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, n_chars bigint, "
    "first_code bigint, char_checksum bigint"
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media over the documents table: payload =
    UTF-8 bytes of the text (the opaque-binary stand-in), media type
    assigned round-robin, metadata derived from the payload."""
    payload = F.encode(F.col("text"), "UTF-8")
    media_type = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        media_type.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("bigint").alias("n_bytes"),
            F.lit("fake/v1").alias("codec"),
            (F.length(payload) * 10).cast("bigint").alias("duration_ms"),
        ).alias("meta"),
    )


def repartition_for_media(df: DataFrame, n: int | None = None) -> DataFrame:
    """Hash-spread blobs before the Python stage (see module docstring)."""
    return df.repartition(n, "doc_id") if n else df.repartition("doc_id")


def decode_media(df: DataFrame, codec: str = "fake/v1") -> DataFrame:
    """Decode/feature-extract via mapInPandas. Real codecs are not
    available in this environment -> NotImplementedError, exactly where a
    PIL/ffmpeg call would slot in. The 'fake/v1' codec byte-decodes
    deterministically so the full Spark plumbing is testable."""
    if codec != "fake/v1":
        raise NotImplementedError(
            f"codec {codec!r} requires image/audio libs not present in this "
            "container; plug a real decoder into _decode_batches"
        )

    # Self-contained executor closure (no module globals — see sinks.py).
    def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            payloads = pdf["payload"]
            texts = [bytes(b).decode("utf-8") for b in payloads]
            out = _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(b)) for b in payloads],
                    "n_chars": [len(t) for t in texts],
                    "first_code": [ord(t[0]) if t else -1 for t in texts],
                    "char_checksum": [sum(ord(c) for c in t) % 997 for t in texts],
                }
            )
            yield out

    return df.mapInPandas(_decode_batches, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Video frame-sampling stand-in: emit one row per sampled "frame"
    (byte offset) via posexplode over a computed offset array — the real
    implementation would decode frames at these offsets. Demonstrates the
    1-row -> N-rows media expansion shape (UDTF-like) without Python."""
    offsets = F.sequence(
        F.lit(0), F.greatest(F.col("meta.n_bytes") - 1, F.lit(0)), F.lit(every_n_bytes)
    )
    return df.select(
        "doc_id",
        "media_type",
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    )


RESIZED_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, "
    "meta struct<n_bytes: bigint, codec: string, scale: bigint>"
)


def resize_media(df: DataFrame, factor: int = 4) -> DataFrame:
    """Resize/downsample stand-in via mapInPandas: keep every ``factor``-th
    byte of the payload (where a real implementation calls PIL
    ``Image.resize`` / audio resampling). Binary in -> binary out, so the
    result is again a media column that downstream stages (decode,
    frame-sample, storage) consume unchanged — the composability that makes
    media transforms pipeline stages rather than terminal steps. Arrow
    moves the bytes; Python touches each blob once per batch."""
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")

    def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            resized = [bytes(bytes(b)[::factor]) for b in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": resized,
                    "meta": [
                        {"n_bytes": len(r), "codec": "fake/v1", "scale": factor}
                        for r in resized
                    ],
                }
            )

    return df.mapInPandas(_resize_batches, schema=RESIZED_SCHEMA)
