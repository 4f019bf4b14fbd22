"""Salted aggregation: result parity with plain groupBy + plan shape."""

import pandas as pd
from pyspark.sql import functions as F

from dataflows_spark.operators.skew import (
    explain_shuffle_keys,
    salted_agg,
    salted_apply_in_pandas,
)


def _skewed_df(spark):
    # 90% of rows share one key — the codec-skew shape
    return spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, "pcm_s16le").otherwise(F.concat(F.lit("c"), (F.col("id") % 7).cast("string"))).alias("codec"),
        (F.col("id") % 100).cast("double").alias("v"),
    )


def test_salted_agg_matches_plain(spark):
    df = _skewed_df(spark)
    plain = {
        (r["codec"]): (r["n"], r["s"], r["mn"], r["mx"], round(r["a"], 9))
        for r in df.groupBy("codec")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.min("v").alias("mn"), F.max("v").alias("mx"), F.avg("v").alias("a"))
        .collect()
    }
    salted = {
        (r["codec"]): (r["n"], r["s"], r["mn"], r["mx"], round(r["a"], 9))
        for r in salted_agg(
            df,
            ["codec"],
            {"n": ("v", "count"), "s": ("v", "sum"), "mn": ("v", "min"), "mx": ("v", "max"), "a": ("v", "avg")},
            n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_salted_agg_plan_has_salt_exchange(spark):
    df = _skewed_df(spark)
    out = salted_agg(df, ["codec"], {"n": ("v", "count")}, n_salts=8)
    exchanges = explain_shuffle_keys(out)
    assert "__salt__" in exchanges  # phase-1 partitioning includes the salt


def test_salted_apply_in_pandas(spark):
    df = _skewed_df(spark)

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"codec": [pdf["codec"].iloc[0]], "s": [pdf["v"].sum()], "n": [len(pdf)]})

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"codec": [pdf["codec"].iloc[0]], "mean_v": [pdf["s"].sum() / pdf["n"].sum()]})

    got = {r["codec"]: round(r["mean_v"], 9) for r in salted_apply_in_pandas(
        df, ["codec"], partial, "codec string, s double, n long", merge, "codec string, mean_v double", n_salts=8
    ).collect()}
    want = {r["codec"]: round(r["m"], 9) for r in df.groupBy("codec").agg(F.avg("v").alias("m")).collect()}
    assert got == want
