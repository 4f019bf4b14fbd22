"""dump_to_sql against an embedded Derby database (real JDBC round
trip): rewrite / append / update (MERGE upsert) — reference
processors/dumpers/to_sql.py:103-140 parity."""

import pytest

from dataflows_spark import Flow, dump_to_sql, load, set_primary_key

URL = "jdbc:derby:memory:dfs_test;create=true"


def _read(spark, table):
    return (
        spark.read.format("jdbc").option("url", URL).option("dbtable", table).load()
    )


def test_dump_to_sql_rewrite_and_append(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], schema="id int, v string")
    from dataflows_spark.core.context import Context
    from dataflows_spark.core.package import TablePackage

    pkg = TablePackage()
    pkg.add("t", df)
    dump_to_sql({"tbl_rw": {"resource-name": "t", "mode": "rewrite"}}, engine=URL).process(Context(spark), pkg)
    assert sorted((r["id"], r["v"]) for r in _read(spark, "tbl_rw").collect()) == [(1, "a"), (2, "b")]
    dump_to_sql({"tbl_rw": {"resource-name": "t", "mode": "append"}}, engine=URL).process(Context(spark), pkg)
    assert _read(spark, "tbl_rw").count() == 4


def test_dump_to_sql_update_upserts_on_keys(spark):
    from dataflows_spark.core.context import Context
    from dataflows_spark.core.package import TablePackage

    b0 = spark.createDataFrame([(1, "v1", 10.0), (2, "v1", 20.0)], schema="id int, v string, x double")
    b1 = spark.createDataFrame([(2, "v2", 21.0), (3, "v1", 30.0)], schema="id int, v string, x double")

    pkg = TablePackage()
    pkg.add("t", b0)
    stage = dump_to_sql({"tbl_up": {"resource-name": "t", "mode": "update", "update_keys": ["id"]}}, engine=URL)
    stage.process(Context(spark), pkg)
    pkg["t"] = b1
    stage.process(Context(spark), pkg)
    # re-delivery of the same batch → idempotent
    stage.process(Context(spark), pkg)

    rows = {r["id"]: (r["v"], r["x"]) for r in _read(spark, "tbl_up").collect()}
    assert rows == {1: ("v1", 10.0), 2: ("v2", 21.0), 3: ("v1", 30.0)}


def test_dump_to_sql_update_uses_primary_key_fallback(spark):
    pkg = Flow(
        [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}],
        set_primary_key(["id"]),
        dump_to_sql({"tbl_pk": {"resource-name": "res_1", "mode": "update"}}, engine=URL),
    ).dataframes(spark)
    sp = pkg  # noqa: F841
    import pyspark.sql.functions as F  # noqa: F401

    spark_df = _read(spark, "tbl_pk")
    assert spark_df.count() == 2
