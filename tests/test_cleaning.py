from pyspark.sql import functions as F

from mistocksync_spark.functions import (
    clean_article_dimi,
    clean_article_vitya,
    clean_invisible_chars,
    safe_color,
)


def _run(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r[0] for r in df.select(fn(F.col("v"))).collect()]


def test_clean_article_vitya(spark):
    cases = {
        "'0001234": 1234,
        "0001234": 1234,
        "1234": 1234,
        "00001": 1,        # strips one 000 prefix, then cast
        "AB12CD34": 1234,  # digit-run concatenation quirk
        "AB-12": 12,
        "XYZ": 0,          # no digits → 0
        "nan": None,
        "NaN": None,
        "": None,
        "  ": None,
        None: None,
        "'": 0,            # apostrophe stripped, empty → 0 (ref: isdigit fails, '' → 0)
        "000": 0,
    }
    got = _run(spark, clean_article_vitya, list(cases))
    assert got == list(cases.values())


def test_clean_article_dimi(spark):
    cases = {
        "'XM-123A": "XM-123A",
        "000XM5": "XM5",
        "XM-123A": "XM-123A",
        "nan": None,
        "": None,
        None: None,
        "000": None,  # prefix stripped → empty → null
    }
    got = _run(spark, clean_article_dimi, list(cases))
    assert got == list(cases.values())


def test_clean_invisible_chars(spark):
    cases = {
        "  a   b\t c \n": "a b c",
        "x": "x",
        "   ": None,
        None: None,
    }
    got = _run(spark, clean_invisible_chars, list(cases))
    assert got == list(cases.values())


def test_safe_color(spark):
    cases = {
        " Black ": "black",
        "WHITE": "white",
        "nan": "",
        "None": "",
        "": "",
        None: "",
        "  ": "",
    }
    got = _run(spark, safe_color, list(cases))
    assert got == list(cases.values())
