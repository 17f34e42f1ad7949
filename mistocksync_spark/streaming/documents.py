"""Structured Streaming over the documents table (north-star extension —
the reference has no streaming surface, SURVEY.md §2.8).

The batch ``exact_dedup`` re-expressed as a streaming plan: in a live
ingestion pipeline, exact duplicate tracking runs continuously over the
arriving corpus rather than as a nightly batch.  The SAME operator
(``operators.dedup.exact_dedup`` — md5 digest → min keep-id + count) is
applied to the stream; complete-mode output makes the result deterministic
and equal to the batch query, so the two share one DuckDB oracle.

Scale notes: state is one row per distinct digest — the digest dictionary a
dedup service holds anyway.  At 100 TB/day the memory sink becomes a
compacted key-value sink (Delta MERGE on digest / state store), and if the
corpus has an event-time column the state can be watermark-bounded with
``dropDuplicatesWithinWatermark`` (see streaming/events.throttle_stream for
that pattern); digest-identity dedup is deliberately unbounded — a duplicate
is a duplicate forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-based streaming source over the documents parquet."""
    raw_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{sf_dir.rstrip('/')}/documents.parq*")  # dir-or-glob source
    )
    return stream.select("doc_id", "text")


def augment_documents(docs: DataFrame) -> DataFrame:
    """The oracle corpus's duplicate injection (plans/feeds.DOCS_AUG_SQL) as
    stream-compatible DataFrame ops — a self-union of the one source, so the
    streaming dedup sees the same input as the batch query and they share
    one oracle."""
    a = docs.select("doc_id", "text")
    b = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" почти дубликат хвост")).alias("text"),
    )
    c = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text"
    )
    return a.unionAll(b).unionAll(c)


def exact_dedup_stream(docs: DataFrame) -> DataFrame:
    """Streaming exact-dedup groups: identical plan to the batch operator
    (groupBy digest → min keep-id + occurrence count); run with
    ``outputMode("complete")`` the result equals the batch query exactly."""
    from mistocksync_spark.operators.dedup import exact_dedup

    return exact_dedup(docs)
