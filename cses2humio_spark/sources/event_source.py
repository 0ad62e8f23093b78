"""Event-stream source adapters (SURVEY.md §2.1 R1-R3, §1.7).

The reference consumes newline-delimited JSON from a partitioned chunked
HTTP feed (app.py:93-102). The idiomatic Spark stand-ins:

- Kafka (``kafka_stream``): 1 message = 1 record, partition ↔ stream
  partition, offset ↔ ``metadata.offset``, ``startingOffsets`` ↔ the
  reference's offset-file resume (app.py:77-79). Config-only here — no
  Kafka broker in the test environment.
- Text files (``ndjson_stream`` / ``ndjson_batch``): default line framing
  reproduces R2 (record framing); used by tests and the driver.

Keep-alive empty lines (app.py:101) are dropped by ``filter(length>0)``;
decode (R3) is implicit in the text source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ndjson_batch(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of newline-delimited event lines -> (value string)."""
    return spark.read.text(path).select(F.col("value")).filter(
        F.length(F.col("value")) > 0
    )


def ndjson_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming read of an NDJSON drop directory. ``maxFilesPerTrigger``
    is the file-source analog of the reference's bulk_max_size rate cap
    (R9) — bounds per-micro-batch volume."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return (
        reader.load(path)
        .select(F.col("value"))
        .filter(F.length(F.col("value")) > 0)
    )


def kafka_reader_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """The Kafka reader's full option map, as a pure value — separated from
    ``kafka_stream`` so the config contract is unit-testable in a
    broker-less environment (and composable with
    ``falcon_adapter.kafka_source_options`` for the SASL half)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "false",
    }
    if max_offsets_per_trigger:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka source configured to mirror the reference's consumption
    contract (partitioned, offset-resumable, rate-capped). Returns
    (value string, partition int, offset long) — ``partition``/``offset``
    are the source-level analogs of the reference's stream partition and
    ``metadata.offset``."""
    reader = spark.readStream.format("kafka").options(
        **kafka_reader_options(
            bootstrap_servers, topic, starting_offsets, max_offsets_per_trigger
        )
    )
    df = reader.load()
    return df.select(
        F.col("value").cast("string").alias("value"),
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("bigint").alias("offset"),
    )
