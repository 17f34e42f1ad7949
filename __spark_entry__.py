"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` exposes
one callable per implemented operator (SURVEY.md §2) and ``oracle_sql()``
the matching DuckDB SQL over the same parquet tables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mistocksync_spark.plans.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def _graded_keys() -> set[str]:
    """Query names already graded in a prior round's CORRECTNESS file.

    The driver grades a bounded window of the registry in iteration order;
    listing never-graded queries first rotates them into the window so the
    binding correctness signal eventually covers the whole registry (round-4
    verdict ask #4).  Falls back to the full-registry order if the artifact
    files are absent.
    """
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    graded: set[str] = set()
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                graded |= set(json.load(f).keys())
        except (OSError, ValueError):
            continue
    return graded


def _window_order(d: dict) -> dict:
    graded = _graded_keys()
    fresh = {k: v for k, v in d.items() if k not in graded}
    rest = {k: v for k, v in d.items() if k in graded}
    return {**fresh, **rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _window_order(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted keys → rows-only check)."""
    return _window_order(dict(ORACLES))
