"""Supplier→base record mapping (reference parity: C11).

The reference maps a matched supplier record into the base workbook's
column vocabulary per supplier: the generic ``article``/``price`` pair plus
the supplier-specific ``article_<s>`` / ``price_<s>_usd`` slots, a
``supplier`` display name, and ``quantity = 0``
(``map_supplier_to_base_data``, /root/reference/main.py:1889-1974).

Spark-first: a single ``select`` with a per-supplier alias map — no
row-level code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# supplier key → (article slot, usd price slot, rub price slot, display name)
SUPPLIER_SLOTS = {
    "vitya": ("article_vitya", "price_vitya_usd", "price_vitya_rub", "Витя"),
    "dimi": ("article_dimi", "price_dimi_usd", "price_dimi_rub", "Дима"),
    "mila": ("article_mila", "price_mila_usd", "price_mila_rub", "Мила"),
}


def map_supplier_to_base(
    df: DataFrame,
    supplier: str,
    article_col: str = "article",
    price_col: str = "price",
    name_col: str = "name",
    color_col: str | None = None,
    price_rub_col: str | None = None,
) -> DataFrame:
    """Project supplier records into the base schema for ``supplier``
    (one of vitya/dimi/mila — ref main.py:1928-1964).

    Emits: name [, color], article, price, article_<s>, price_<s>_usd
    [, price_<s>_rub], supplier, quantity.
    """
    art_slot, usd_slot, rub_slot, display = SUPPLIER_SLOTS[supplier]
    cols: list[Column] = [F.col(name_col).alias("name")]
    if color_col is not None and color_col in df.columns:
        cols.append(F.col(color_col).alias("color"))
    cols += [
        F.col(article_col).alias("article"),
        F.col(price_col).cast("double").alias("price"),
        F.col(article_col).alias(art_slot),
        F.col(price_col).cast("double").alias(usd_slot),
    ]
    if price_rub_col is not None and price_rub_col in df.columns:
        cols.append(F.col(price_rub_col).cast("double").alias(rub_slot))
    cols += [
        F.lit(display).alias("supplier"),
        F.lit(0).cast("long").alias("quantity"),
    ]
    return df.select(*cols)
