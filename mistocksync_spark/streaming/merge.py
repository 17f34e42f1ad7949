"""Incremental price-sync: streaming supplier feed → foreachBatch MERGE
(the streaming composition of J7 + S12; north-star extension).

The reference re-reads the whole base workbook and re-runs the comparison
per button press (main.py:889-904).  The streaming shape subscribes to
supplier price-list arrivals and applies each micro-batch as a MERGE into
the base table: ``foreachBatch`` hands every micro-batch to the *batch*
operators verbatim, so the merge semantics (ε = 0.001 skip, null-old as
0.0) are literally the same code that passed the oracle.

At 100 TB: the sink becomes Delta/Iceberg ``MERGE INTO`` (idempotent per
batch id), the source a Kafka topic of price updates; state lives in the
table, not the stream.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def incremental_price_merge(
    spark: SparkSession, sf_dir: str, out_path: str, checkpoint: str
) -> None:
    """Run the supplier feed as a file stream and MERGE each micro-batch's
    price updates into the base, persisting the merged base to
    ``out_path`` (overwrite-per-batch stands in for a transactional
    MERGE)."""
    from pyspark.sql import functions as F

    from mistocksync_spark.operators.matching import price_update_join
    from mistocksync_spark.plans.feeds import SUPPLIER_FEED_SQL, base_feed
    from mistocksync_spark.sinks.mutate import price_merge

    raw_schema = spark.read.parquet(f"{sf_dir}/part.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{sf_dir.rstrip('/')}/part.parq*")
    )

    def apply_batch(batch_df, batch_id: int) -> None:
        from mistocksync_spark.plans.queries import _preprocess_vitya

        s = batch_df.sparkSession
        batch_df.createOrReplaceTempView("part")
        sup = _preprocess_vitya(s.sql(SUPPLIER_FEED_SQL)).na.drop(
            subset=["article_vitya", "price_usd"]
        )
        base = base_feed(s, sf_dir)
        updates = price_update_join(
            base,
            sup,
            base_article="article_vitya",
            base_price="price_vitya_usd",
            supplier_article="article_vitya",
            supplier_price="price_usd",
        )
        price_merge(base, updates).write.mode("overwrite").parquet(out_path)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
