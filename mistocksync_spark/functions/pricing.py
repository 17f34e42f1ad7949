"""Price helpers (reference parity: C9, C10 both variants, A6).

Reference semantics: /root/reference/main.py:2057-2075
(get_base_price_from_config), 2077-2095 (get_min_base_price),
2198-2203 (match-path pct: base 0 → 0), 4272-4277 (update-path pct:
base 0 → 100.0).  Price-equality epsilon 0.001 (main.py:2180, 4268),
minimum price threshold 0.01 (main.py:52).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MIN_PRICE_THRESHOLD = 0.01
PRICE_EPSILON = 0.001
SIGNIFICANT_CHANGE_PERCENT = 20.0
PRICE_CHANGE_PERCENT = 5.0
FUZZY_THRESHOLD = 0.33


def base_price_from_config(col: Column) -> Column:
    """Config-selected base price; null/≤0 → 0.0 (ref main.py:2057-2075)."""
    return F.coalesce(F.when(col > 0, col.cast("double")), F.lit(0.0))


def min_base_price(*cols: Column) -> Column:
    """Row-wise min over supplier price columns ignoring null/≤0; all
    missing → 0.0 (ref main.py:2077-2095).  ``least`` skips nulls."""
    guarded = [F.when(c > 0, c.cast("double")) for c in cols]
    return F.coalesce(F.least(*guarded), F.lit(0.0))


def pct_change_match(new: Column, old: Column) -> Column:
    """Match-path percent change: old ≤ 0 → 0 (ref main.py:2198-2203)."""
    return F.when(old > 0, (new - old) / old * 100.0).otherwise(F.lit(0.0))


def pct_change_update(new: Column, old: Column) -> Column:
    """Update-path percent change: old == 0 → 100.0 (ref main.py:4272-4277)."""
    return F.when(old != 0, (new - old) / old * 100.0).otherwise(F.lit(100.0))
