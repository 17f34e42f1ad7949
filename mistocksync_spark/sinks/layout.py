"""Storage-layout sinks: the data-organization levers that decide whether
a 100 TB table is scannable (north-star extension; the reference's only
store is a single Excel workbook — SURVEY.md §2.1).

- ``clustered_write``: range-cluster rows on the filter columns before
  writing, so parquet row-group min/max statistics become DISJOINT and a
  predicate on those columns prunes whole files/row-groups at scan time
  (the poor man's Z-order; for one-to-two filter columns range clustering
  IS the optimal layout).
- ``compact_files``: rewrite a directory of many small files into
  size-targeted larger ones — small-file proliferation is the classic
  slow-death of streaming/incremental sinks (every file costs a task,
  footer fetch and scheduler round-trip at read time).

Both are thin, deliberate compositions of public DataFrame APIs; the
value is pinned by tests that READ BACK the parquet footers and assert
the pruning/compaction actually happened.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def clustered_write(
    df: DataFrame, path: str, cluster_cols: list[str], n_files: int = 8
) -> str:
    """Write ``df`` range-clustered on ``cluster_cols``: repartitionByRange
    gives disjoint per-file value ranges, the within-partition sort gives
    row-group-level min/max locality inside each file."""
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def compact_files(
    spark: SparkSession, src: str, dst: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Rewrite ``src`` into ``dst`` with files sized near
    ``target_file_bytes``; returns the output file count.  The count
    derives from the INPUT's on-disk bytes (post-compression), so the
    output files land near the target without a second pass."""
    import glob
    import os

    total = sum(
        os.path.getsize(p) for p in glob.glob(os.path.join(src, "*.parquet"))
    )
    n = max(1, -(-total // target_file_bytes))  # ceil division
    spark.read.parquet(src).coalesce(n).write.mode("overwrite").parquet(dst)
    return n


def zorder_key(a, b, bits: int = 16):
    """Z-order (Morton) interleave of two non-negative integer columns —
    the multi-dimension clustering key range clustering can't provide:
    sorting by the interleaved key keeps rows close in BOTH dimensions,
    so parquet min/max statistics prune on either filter column (the
    public Delta/Iceberg OPTIMIZE ZORDER technique).

    Pure integer shift/mask expressions — exact and bit-identical in any
    engine — folding ``bits`` levels of each input into a ``2*bits``-bit
    key.  Inputs must already be bucketized to ``[0, 2^bits)`` (callers
    rank/clamp first; the key of an out-of-range value would silently
    collide).
    """
    from pyspark.sql import functions as F

    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftright(a.cast("long"), i) % 2, 2 * i)
            + F.shiftleft(F.shiftright(b.cast("long"), i) % 2, 2 * i + 1)
        )
    return key


def zordered_write(
    df: DataFrame, path: str, col_a: str, col_b: str, bits: int = 8, n_files: int = 8
) -> str:
    """Write ``df`` clustered on the Z-order key of two columns: range
    partition + in-file sort by the interleaved key, so min/max footer
    statistics stay tight on BOTH dimensions and a point predicate on
    either column prunes files (asserted by reading footers back in
    tests)."""
    from pyspark.sql import functions as F

    keyed = df.withColumn("__zkey", zorder_key(col_a, col_b, bits))
    (
        keyed.repartitionByRange(n_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path
