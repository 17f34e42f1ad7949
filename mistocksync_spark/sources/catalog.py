"""Bucketed-table catalog path (scale extension of S7's "the database is a
file" model — SURVEY.md §1.4 maps it to "a real table").

At 100 TB the base is not an Excel file but a catalog table.  Bucketing it
by the article key co-locates both sides of the J1/J7 joins: a join
between two tables bucketed by the same key into the same bucket count
needs NO exchange — the single most expensive operator in the cascade
(the base-side shuffle) disappears from every comparison run.  Suppliers'
price lists are small enough to broadcast, but supplier-history or
multi-tenant layouts make the bucketed form the right default.

Local note: uses the session's in-memory catalog + parquet bucket files
under spark.sql.warehouse.dir; on a cluster the same calls target the
metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``key`` — the
    layout that makes subsequent equi-joins/aggregations on ``key``
    exchange-free."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # the in-memory catalog forgets tables between sessions but their files
    # persist in the warehouse dir; clear a stale location so the managed-
    # table create doesn't refuse it
    import shutil
    from urllib.parse import urlparse

    loc = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{loc.rstrip('/')}/{table}", ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed by ``key``: with matching bucket counts the
    planner reads bucket i against bucket i directly (no Exchange in the
    physical plan — asserted in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on=key, how=how)
