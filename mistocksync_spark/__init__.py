"""mistocksync_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference MiStockSync application
(config-driven ingest, cleansing, a four-stage entity-resolution matching
cascade, price-delta detection, duplicate audit, reporting and merge-style
store updates), extended with large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Everything is expressed Spark-first: declarative DataFrame plans that
Catalyst can optimize (predicate pushdown, broadcast joins, AQE), with
Python/pandas UDFs only where built-in operators genuinely cannot express
the semantics (Ratcliff–Obershelp similarity scoring).
"""

__version__ = "0.1.0"

from mistocksync_spark.session import get_spark  # noqa: F401
