from mistocksync_spark.sources.testdata import load_table, load_tables, TABLES  # noqa: F401
