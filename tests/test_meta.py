"""Metadata & flow-control stages (reference processors/update_*,
printer, conditional, finalizer, parallelize, sources)."""

from dataflows_spark import (
    Flow,
    conditional,
    filter_rows,
    finalizer,
    parallelize,
    printer,
    set_primary_key,
    sources,
    update_resource,
    update_schema,
    update_stats,
)


DATA = [{"x": 1, "y": "a"}, {"x": 2, "y": "b"}, {"x": 3, "y": "c"}]


def test_update_resource_rename_and_props(spark):
    res, meta, _ = Flow(DATA, update_resource("res_1", name="renamed", title="T")).results(spark)
    assert "renamed" in meta["resources"] and meta["resources"]["renamed"]["title"] == "T"


def test_update_schema_and_pk(spark):
    _, meta, _ = Flow(
        DATA, update_schema("res_1", primaryKey=["x"], missingValues=["-"]), set_primary_key(["x"])
    ).results(spark)
    assert meta["resources"]["res_1"]["primaryKey"] == ["x"]
    assert meta["resources"]["res_1"]["schema_props"]["missingValues"] == ["-"]


def test_update_stats_and_finalizer(spark):
    seen = {}

    def done(stats):
        seen.update(stats)

    _, _, stats = Flow(DATA, update_stats({"custom": 42}), finalizer(done)).results(spark)
    assert stats["custom"] == 42 and seen["custom"] == 42


def test_printer_passthrough(spark, capsys):
    res, _, _ = Flow(DATA, printer(num_rows=2)).results(spark)
    assert len(res[0]) == 3
    assert "res_1" in capsys.readouterr().out


def test_conditional_applies_when_schema_matches(spark):
    # reference conditional.py: splice a sub-flow iff predicate(pkg)
    has_x = lambda pkg: "x" in pkg.first().columns  # noqa: E731
    res, _, _ = Flow(DATA, conditional(has_x, Flow(filter_rows(condition="x > 1")))).results(spark)
    assert sorted(r["x"] for r in res[0]) == [2, 3]
    res, _, _ = Flow(DATA, conditional(lambda pkg: False, Flow(filter_rows(condition="x > 1")))).results(spark)
    assert len(res[0]) == 3


def test_sources_merges_subflows(spark):
    res, meta, _ = Flow(sources(Flow([{"a": 1}]), Flow([{"b": 2}]))).results(spark)
    assert len(res) == 2


def test_parallelize_repartitions_and_maps(spark):
    def double(row):
        row["x"] = row["x"] * 2
        return row

    pkg = Flow(DATA, parallelize(double, num_processors=4)).dataframes(spark)
    df = pkg["res_1"]
    assert df.rdd.getNumPartitions() == 4
    assert sorted(r["x"] for r in df.collect()) == [2, 4, 6]


def test_parallelize_predicate_fast_path(spark):
    def double(row):
        row["x"] = row["x"] * 2
        return row

    res, _, _ = Flow(DATA, parallelize(double, num_processors=2, predicate=lambda r: r["x"] > 1)).results(spark)
    assert sorted(r["x"] for r in res[0]) == [1, 4, 6]
