"""Strict-cast quarantine: silent cast-to-NULL corruption caught per row."""

import pyspark.sql.types as T

from mysql_secure_agent_spark.operators.cast_guard import split_invalid_casts

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("n", T.IntegerType(), True),
        T.StructField("d", T.DecimalType(4, 1), True),
        T.StructField("s", T.StringType(), True),
    ]
)


def test_split_invalid_casts(spark):
    df = spark.createDataFrame(
        [
            ("1", "10", "12.5", "ok"),        # clean
            ("2", None, None, None),            # NULLs are legal
            ("3", "abc", "1.0", "x"),          # n unparseable
            ("4", "5", "99999.0", "y"),        # d overflows DECIMAL(4,1)
            ("bad", "1", "1.0", "z"),          # key unparseable
        ],
        "k string, n string, d string, s string",
    )
    valid, invalid = split_invalid_casts(df, SCHEMA)
    assert {r["k"] for r in valid.collect()} == {"1", "2"}
    got = {r["k"]: sorted(r["_bad_cols"]) for r in invalid.collect()}
    assert got == {"3": ["n"], "4": ["d"], "bad": ["k"]}


def test_no_checkable_columns_passthrough(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    valid, invalid = split_invalid_casts(df, SCHEMA)
    assert valid.count() == 1 and invalid.count() == 0
    assert "_bad_cols" in invalid.columns


def test_fractional_to_integral_check(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (2, float("nan"))], "k long, n double"
    )
    valid, invalid = split_invalid_casts(df, SCHEMA)
    assert {r["k"] for r in valid.collect()} == {1}
    assert [r["_bad_cols"] for r in invalid.collect()] == [["n"]]
