"""Data-quality gates a 100 TB ingest runs before (and after) every
pipeline stage: a declarative single-pass rule engine (the Deequ /
Great-Expectations shape, public methods), a join-key skew profiler
(the pre-flight check before any large shuffle), and a leakage-safe
hash split (grouped train/val/test assignment).

On the DEFAULT paths, all outputs are exact integers or passthrough
values — no derived-float surface — so the DuckDB oracles replay them
bit-for-bit on any data (see functions/numeric.py for the determinism
doctrine).  The one documented exception is
``data_quality_report(approx=True)``: its ``unique`` rules use
HyperLogLog++ sketches, which are neither exact nor oracle-replayable —
those rows are marked ``kind = 'unique_approx'`` so a consumer can tell
a sketch-based verdict from an exact one.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One declarative check.  ``kind``: not_null | range | isin | regex
    | unique.  ``params`` per kind: range -> {lo, hi} (inclusive);
    isin -> {values}; regex -> {pattern} (full-match not required);
    unique -> {} (violations = rows beyond the first per value)."""

    name: str
    column: str
    kind: str
    params: dict = field(default_factory=dict)


def _violation_flag(rule: Rule) -> Column:
    c = F.col(rule.column)
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "range":
        lo, hi = rule.params["lo"], rule.params["hi"]
        # NULL never violates a range rule (not_null is its own rule)
        return c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))
    if rule.kind == "isin":
        return c.isNotNull() & ~c.isin(*rule.params["values"])
    if rule.kind == "regex":
        return c.isNotNull() & ~c.rlike(rule.params["pattern"])
    raise ValueError(f"row-level flag undefined for kind {rule.kind!r}")


def data_quality_report(
    df: DataFrame,
    rules: list[Rule],
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Evaluate every rule in as few passes as the rule mix allows and
    return one row per rule: ``(rule_name, column, kind, n_rows,
    n_violations, violation_ppm, passed)``.

    Plan: all ROW-LEVEL rules (not_null/range/isin/regex) compute in ONE
    full-scan aggregate — a map-side partial sum of violation flags per
    rule, one 1-row result — regardless of how many rules are declared
    (the Deequ "scan-sharing" property).  The per-rule rows unpivot from
    the single result row via explode, so adding a row-level rule never
    adds a pass over the data.

    ``unique`` rules are the exception to free scan sharing: each one is
    a count-distinct branch, and with k > 1 of them Catalyst rewrites
    the multi-distinct aggregate through an Expand node that emits k+1
    projected copies of every input row — one job still, but k unique
    rules silently cost ~k scans' worth of shuffled rows.  At audit
    scale that matters, so ``approx=True`` switches every unique rule to
    ``approx_count_distinct`` (HyperLogLog++, default 5% rsd): all
    sketches ride the ONE non-Expand aggregate with the row-level rules,
    restoring true single-pass behavior at any unique-rule count.  The
    trade is exactness — approximate ``n_violations``/``passed`` for
    unique rules can under- or over-count near the boundary (an HLL
    overestimate is clamped to 0 violations, i.e. a sketch-noise PASS) —
    so the exact path stays the default and the approx path is the
    100 TB pre-flight choice.  So a consumer can tell an advisory
    sketch verdict from an exact one, unique-rule rows produced under
    ``approx=True`` report ``kind = 'unique_approx'`` instead of
    ``'unique'``; ``rsd`` is the sketch's target relative standard
    deviation (passed to ``approx_count_distinct``, default 5%).

    ``violation_ppm`` is pure integer arithmetic ((v * 1e6) div n) and
    ``passed`` = zero violations — no float surface.  The multiply rides
    a decimal(38,0) intermediate so it cannot wrap at any row count
    (non-ANSI Spark would wrap a BIGINT product silently while DuckDB
    errors — the cross-engine asymmetry numeric_correlations guards);
    the quotient is bounded by 1e6 so the BIGINT result is exact.  On an
    empty input (n = 0) the ppm is NULL rather than an engine-dependent
    divide-by-zero (Spark NULL vs DuckDB error).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, r in enumerate(rules):
        if r.kind == "unique":
            if approx:
                # HLL can overestimate the distinct count past COUNT —
                # clamp so approximate violations never go negative
                v = F.greatest(
                    F.count(F.col(r.column))
                    - F.approx_count_distinct(F.col(r.column), rsd),
                    F.lit(0),
                )
            else:
                v = F.count(F.col(r.column)) - F.count_distinct(
                    F.col(r.column)
                )
            aggs.append(v.alias(f"__v_{i}"))
        else:
            # coalesce: SUM over an empty table is NULL in both engines,
            # but a gate over zero rows has zero violations and passes
            aggs.append(
                F.coalesce(
                    F.sum(_violation_flag(r).cast("long")), F.lit(0)
                ).alias(f"__v_{i}")
            )
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(r.name).alias("rule_name"),
                F.lit(r.column).alias("column"),
                F.lit(
                    "unique_approx"
                    if approx and r.kind == "unique"
                    else r.kind
                ).alias("kind"),
                F.col("__n").alias("n_rows"),
                F.col(f"__v_{i}").alias("n_violations"),
                F.when(
                    F.col("__n") > 0,
                    F.expr(
                        f"(CAST(__v_{i} AS DECIMAL(38,0)) * 1000000) div __n"
                    ),
                ).alias("violation_ppm"),
                (F.col(f"__v_{i}") == 0).alias("passed"),
            )
            for i, r in enumerate(rules)
        ]
    )
    return row.select(F.explode(entries).alias("r")).select("r.*")


def join_skew_profile(
    df: DataFrame, key: str, top_k: int = 10
) -> DataFrame:
    """Pre-shuffle skew audit for a join/groupBy key: the top-k heaviest
    key values with exact counts, each key's share of all rows (integer
    ppm) and its skew ratio vs a perfectly uniform key (count·n_keys/n —
    integer ppm; 1e6 = uniform).  The numbers that decide whether a key
    needs salting, AQE skew-join splitting, or a broadcast realignment
    BEFORE the 100 TB shuffle runs, not after it straggles.

    Plan: ONE map-side-partial groupBy on the key (≤ #keys rows), a
    1-row total attached by broadcast, and a top-k sort over the
    aggregated frame only.  Ties order by key string so the emitted set
    is total-order deterministic.

    Overflow/zero-division: both ppm products ride decimal(38,0)
    intermediates — ``cnt * n_keys * 1e6`` wraps BIGINT silently in
    non-ANSI Spark (while DuckDB errors) already at cnt~1e9, keys~1e4;
    the decimal product cannot wrap below 10^38.  The quotients are
    bounded (share ≤ 1e6, ratio ≤ n_keys·1e6) so the BIGINT results are
    exact.  No n > 0 guard is needed: an emitted row implies
    ``__n >= cnt >= 1`` (the total is summed over the same aggregated
    frame the row comes from), so the divisor is never zero.
    """
    kc = F.col(key).cast("string")
    per_key = df.groupBy(kc.alias("key_value")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = per_key.agg(
        F.sum("cnt").alias("__n"), F.count(F.lit(1)).alias("__k")
    )
    return (
        per_key.crossJoin(F.broadcast(tot))
        .orderBy(F.col("cnt").desc(), F.col("key_value").asc())
        .limit(top_k)
        .select(
            "key_value",
            "cnt",
            F.expr(
                "(CAST(cnt AS DECIMAL(38,0)) * 1000000) div __n"
            ).alias("share_ppm"),
            F.expr(
                "(CAST(cnt AS DECIMAL(38,0)) * __k * 1000000) div __n"
            ).alias("skew_ratio_ppm"),
        )
    )


def hash_split(
    df: DataFrame,
    group_col: Column | str,
    weights: dict[str, int],
    modulus: int = 10_000,
) -> DataFrame:
    """Leakage-safe deterministic train/val/test assignment: every row of
    a GROUP (site, domain, dedup cluster — whatever near-duplicates
    share) lands in the same split, because the split is a pure function
    of the group key, never of the row.  A random split leaks: near-
    identical documents from one site straddle train and eval.

    ``weights`` maps split name → integer weight; the group's uniform
    16-bit-style bucket md5(group) % modulus is compared against the
    cumulative integer thresholds (weight_i · modulus // total), so the
    assignment is exact integer arithmetic reproducible in any engine.
    No shuffle — the assignment is a stateless column expression.
    """
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    bucket = F.conv(F.substring(F.md5(g.cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % F.lit(modulus)
    total = sum(weights.values())
    expr = None
    acc = 0
    for name, w in weights.items():
        acc += w
        thr = acc * modulus // total
        cond = bucket < F.lit(thr)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)
