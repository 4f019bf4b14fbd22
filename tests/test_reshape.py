"""Reshape-operator goldens mirroring the reference's
``tests/test_lib.py`` cases (concatenate :441-495, unpivot :355-440,
deduplicate, checkpoint :961-1006)."""

import os

from dataflows_spark import (
    Flow,
    checkpoint,
    concatenate,
    deduplicate,
    delete_resource,
    dump_to_path,
    duplicate,
    load,
    set_primary_key,
    sort_rows,
    unpivot,
)


def test_concatenate_mapping(spark):
    a = [{"col1": 1, "col2": "x"}, {"col1": 2, "col2": "y"}]
    b = [{"colA": 3, "colB": "z"}]
    res, meta, _ = Flow(
        a,
        b,
        concatenate(
            {"a": ["col1", "colA"], "b": ["col2", "colB"]},
            target={"name": "merged", "primaryKey": ["a"]},
        ),
        sort_rows(["a"]),
    ).results(spark)
    assert res[0] == [
        {"a": 1, "b": "x"},
        {"a": 2, "b": "y"},
        {"a": 3, "b": "z"},
    ]
    assert meta["resources"]["merged"]["primaryKey"] == ["a"]


def test_concatenate_missing_fields_null(spark):
    a = [{"col1": 1}]
    b = [{"colB": "z"}]
    res, _, _ = Flow(
        a, b, concatenate({"a": ["col1"], "b": ["colB"]}, target={"name": "m"})
    ).results(spark)
    rows = sorted(res[0], key=lambda r: (r["a"] is None, r["a"] if r["a"] is not None else 0))
    assert rows == [{"a": 1, "b": None}, {"a": None, "b": "z"}]


def test_unpivot_regex_backref(spark):
    # reference tests/test_lib.py:355-440 — melt year columns
    data = [{"name": "n1", "1990": 1, "2000": 2, "2010": 3}]
    res, _, _ = Flow(
        data,
        unpivot(
            [{"name": r"(\d{4})", "keys": {"year": r"\1"}}],
            [{"name": "year", "type": "integer"}],
            {"name": "amount", "type": "integer"},
        ),
        sort_rows(["year"]),
    ).results(spark)
    assert res[0] == [
        {"name": "n1", "year": 1990, "amount": 1},
        {"name": "n1", "year": 2000, "amount": 2},
        {"name": "n1", "year": 2010, "amount": 3},
    ]


def test_deduplicate_keeps_first(spark):
    data = [
        {"id": 1, "v": "a"},
        {"id": 1, "v": "b"},
        {"id": 2, "v": "c"},
        {"id": 2, "v": "d"},
    ]
    res, _, _ = Flow(
        data,
        set_primary_key(["id"]),
        deduplicate(),
        sort_rows(["id"]),
    ).results(spark)
    assert res[0] == [{"id": 1, "v": "a"}, {"id": 2, "v": "c"}]


def test_deduplicate_passthrough_without_pk(spark):
    data = [{"id": 1}, {"id": 1}]
    res, _, _ = Flow(data, deduplicate()).results(spark)
    assert len(res[0]) == 2


def test_duplicate_and_delete_resource(spark):
    data = [{"x": 1}]
    res, meta, _ = Flow(data, duplicate(target_name="copy")).results(spark)
    assert len(res) == 2 and res[0] == res[1]
    res, _, _ = Flow(data, duplicate(target_name="copy"), delete_resource("res_1")).results(spark)
    assert len(res) == 1


def test_dump_load_roundtrip(spark, tmp_path):
    out = str(tmp_path / "out")
    data = [{"x": 1, "y": "a"}, {"x": 2, "y": "b"}]
    _, stats = Flow(data, dump_to_path(out)).process(spark)
    assert stats["count_of_rows"]["res_1"] == 2
    assert os.path.exists(os.path.join(out, "datapackage.json"))
    res, _, _ = Flow(load(os.path.join(out, "res_1"), format="parquet"), sort_rows(["x"])).results(spark)
    assert res[0] == data


def test_checkpoint_skips_recompute(spark, tmp_path):
    # reference tests/test_lib.py:961-1006 — second run must NOT re-execute
    # upstream stages
    cp = str(tmp_path / "cps")
    calls = {"n": 0}

    def gen():
        calls["n"] += 1
        return [{"x": 1}, {"x": 2}]

    def make_flow():
        return Flow(gen(), checkpoint("c1", cp))

    res1, _, _ = make_flow().results(spark)
    assert calls["n"] == 1
    res2, _, _ = make_flow().results(spark)
    # generator was called while building the flow args (eager python), but
    # the checkpoint rewrite must replace the upstream stage with a read:
    rows = sorted(r["x"] for r in res2[0])
    assert rows == [1, 2]
    # verify the rewrite actually bypasses upstream: a flow whose upstream
    # stage would raise still works because it's never executed
    def boom():
        raise AssertionError("upstream must not run")

    from dataflows_spark.core.flow import FuncStage

    res3, _, _ = Flow(FuncStage(boom, name="boom"), checkpoint("c1", cp)).results(spark)
    assert sorted(r["x"] for r in res3[0]) == [1, 2]


def test_csv_load(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("name,age\n john ,3\npaul,4\n")
    res, _, _ = Flow(load(str(p)), sort_rows(["age"])).results(spark)
    assert res[0] == [{"name": "john", "age": 3}, {"name": "paul", "age": 4}]


def test_csv_infer_strategy_strings(spark, tmp_path):
    # reference INFER_STRINGS (load.py:183-204): all columns stay string
    p = tmp_path / "s.csv"
    p.write_text("name,age\njohn,3\n")
    res, _, _ = Flow(load(str(p), infer_strategy="strings")).results(spark)
    assert res[0] == [{"name": "john", "age": "3"}]
    res, _, _ = Flow(load(str(p))).results(spark)  # default: full inference
    assert res[0] == [{"name": "john", "age": 3}]


def test_load_limit_rows(spark, tmp_path):
    # reference test_lib.py:1718-1727
    p = tmp_path / "b.csv"
    p.write_text("name,instrument\njohn,guitar\npaul,bass\ngeorge,guitar\nringo,drums\n")
    res, _, _ = Flow(load(str(p), limit_rows=3)).results(spark)
    assert len(res[0]) == 3


def test_load_deduplicate_headers(spark, tmp_path):
    # reference load.py:284-302 (duplicate_headers fixture)
    p = tmp_path / "d.csv"
    p.write_text("a,a,b\n1,2,3\n")
    res, _, _ = Flow(load(str(p), deduplicate_headers=True, infer_strategy="strings")).results(spark)
    assert set(res[0][0].keys()) == {"a", "a (2)", "b"}


def test_dump_csv_and_json_roundtrip(spark, tmp_path):
    data = [{"x": 1, "y": "a"}, {"x": 2, "y": "b"}]
    for fmt in ("csv", "json"):
        out = str(tmp_path / f"out_{fmt}")
        Flow(data, dump_to_path(out, format=fmt)).process(spark)
        res, _, _ = Flow(load(os.path.join(out, "res_1"), format=fmt), sort_rows(["x"])).results(spark)
        got = [{"x": int(r["x"]), "y": r["y"]} for r in res[0]]
        assert got == data
