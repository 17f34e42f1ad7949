"""Global dense indexing without a single-partition window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY collapses the
whole dataset into one task — the classic scale-killer for "assign a
global presentation/order key".  The scale-correct plan is the two-phase
zipWithIndex shape:

  1. range-partition by the sort key (parallel global sort),
  2. count rows per partition (tiny job), prefix-sum the counts on the
     driver, broadcast the offsets,
  3. partition-LOCAL row_number + offset = the dense global index.

Every stage is parallel; the only driver-side data is one count per
partition.  ``localCheckpoint`` pins the range partitioning so the count
job and the final query read the same materialization (range boundaries
are sampled, so recomputation could disagree).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_dense_index(
    df: DataFrame,
    sort_cols: list[Column],
    out_col: str = "order_key",
    num_partitions: int | None = None,
) -> DataFrame:
    """1-based dense global index in ``sort_cols`` order, computed with a
    range shuffle + partition-local windows (no single-partition stage).

    ``sort_cols`` must be a total order (resolve ties before calling) —
    equal keys get an arbitrary but stable-within-run assignment.
    Runs one small count job at plan-build time.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    keyed = df.repartitionByRange(n, *sort_cols).localCheckpoint(eager=True)
    withpid = keyed.withColumn("__pid", F.spark_partition_id())
    counts = sorted(
        withpid.groupBy("__pid").count().collect(), key=lambda r: r["__pid"]
    )
    offsets: list[int] = []
    acc = 0
    for r in counts:
        offsets.append(acc)
        acc += r["count"]
    if not counts:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    omap = F.create_map(
        *[F.lit(v) for r, off in zip(counts, offsets) for v in (r["__pid"], off)]
    )
    w = Window.partitionBy("__pid").orderBy(*sort_cols)
    return (
        withpid.withColumn(out_col, (F.row_number().over(w) + omap[F.col("__pid")]).cast("long"))
        .drop("__pid")
    )
