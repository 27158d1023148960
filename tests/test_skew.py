"""Salting utilities: results must equal the unsalted equivalents."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_python_spark.operators.skew import (
    key_skew_profile,
    salted_join,
    salted_topk_per_key,
)


def _skewed_df(spark):
    # key 0 holds 90% of rows — the straggler shape
    return spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") < 900, F.lit(0)).otherwise(F.col("id") % 7 + 1).alias("k"),
        (F.col("id") * 37 % 101).alias("score"),
    )


def test_salted_join_matches_plain_join(spark):
    big = _skewed_df(spark)
    small = spark.createDataFrame(
        [(i, f"name_{i}") for i in range(8)], "k long, name string"
    )
    plain = big.join(small, "k").select("id", "k", "name")
    salted = salted_join(big, small, on="k", salt_by="id", n_salts=8).select(
        "id", "k", "name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_topk_matches_window_topk(spark):
    df = _skewed_df(spark)
    w = Window.partitionBy("k").orderBy(F.desc("score"), F.asc("id"))
    direct = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("k", "id", "score")
    )
    salted = salted_topk_per_key(df, key="k", order_col="score", k=5, salt_by="id")
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, salted.select("k", "id", "score").collect())
    )


def test_key_skew_profile_flags_hot_key(spark):
    prof = {r.k: r.skew_factor for r in key_skew_profile(_skewed_df(spark), "k").collect()}
    assert max(prof, key=prof.get) == 0
    assert prof[0] > 5
