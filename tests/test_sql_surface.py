"""The engine's results are reachable through the plain SQL API surface:
temp views + spark.sql must agree with the library operators — a user who
only speaks SQL gets the same answers."""

from pyspark.sql import functions as F


def test_sql_view_matches_library_operator(spark, sf_dir):
    from mistocksync_spark.operators.textual import gopher_rules

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("documents_v")
    lib = {r.doc_id: r.n_words for r in gopher_rules(docs).collect()}
    sql = {
        r.doc_id: r.n_words
        for r in spark.sql(
            r"""
            SELECT doc_id,
                   CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                        ELSE size(split(trim(text), '\\s+')) END AS n_words
            FROM documents_v
            """
        ).collect()
    }
    assert sql == lib and len(lib) > 0


def test_sql_join_agg_matches_dataframe(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from mistocksync_spark.sources.testdata import load_events

    load_events(spark, sf_dir).createOrReplaceTempView("events_v")
    got = {
        (r.event_type,): r.cnt
        for r in spark.sql(
            "SELECT event_type, COUNT(*) AS cnt FROM events_v GROUP BY event_type"
        ).collect()
    }
    want = {
        (r.event_type,): r["count"]
        for r in load_events(spark, sf_dir).groupBy("event_type").count().collect()
    }
    assert got == want
