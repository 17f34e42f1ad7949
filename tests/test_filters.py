from mistocksync_spark.operators import filters as flt


def test_price_filter(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 0.0), (4, 0.005), (5, 0.011)],
        "id long, price_usd double",
    )
    got = sorted(r.id for r in flt.filter_by_price(df).collect())
    assert got == [1, 5]


def test_price_filter_missing_column_noop(spark):
    df = spark.createDataFrame([(1,)], "id long")
    assert flt.filter_by_price(df).count() == 1


def test_vitya_balance_filter(spark):
    df = spark.createDataFrame(
        [
            (1, "Имеются в нал."),
            (2, "Распродажа"),
            (3, "Ожидается"),
            (4, "Нет в наличии"),
            (5, None),
        ],
        "id long, balance string",
    )
    got = sorted(r.id for r in flt.filter_vitya_balance(df).collect())
    assert got == [1, 2]


def test_dimi_balance_filter_keeps_nulls(spark):
    # pandas != semantics: NaN rows survive the filter (SURVEY §2 F3 trap)
    df = spark.createDataFrame(
        [
            (1, "Ожидается", None),
            (2, None, "Ожидается"),
            (3, None, None),
            (4, "В наличии", "В наличии"),
            (5, "В наличии", "Ожидается"),
        ],
        "id long, balance string, balance1 string",
    )
    got = sorted(r.id for r in flt.filter_dimi_balance(df).collect())
    assert got == [3, 4]


def test_anti_and_semi(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    other = spark.createDataFrame([(2,), (9,)], "k long")
    assert sorted(r.k for r in flt.anti_filter_matched(df, other, "k").collect()) == [1, 3]
    assert sorted(r.k for r in flt.semi_restrict(df, other, "k").collect()) == [2]
