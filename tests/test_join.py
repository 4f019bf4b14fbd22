"""join / join_with_self goldens, mirroring the reference's
``tests/test_lib.py:1589-1716`` (characters/houses) with DoubleType in
place of Decimal (documented in SURVEY.md §1.3)."""

from dataflows_spark import Flow, join, join_with_self, sort_rows

CHARACTERS = [
    {"first_name": "Jaime", "house": "Lannister", "last_name": "Lannister", "age": 34.0},
    {"first_name": "Tyrion", "house": "Lannister", "last_name": "Lannister", "age": 27.0},
    {"first_name": "Cersei", "house": "Lannister", "last_name": "Lannister", "age": 34.0},
    {"first_name": "Jon", "house": "Stark", "last_name": "Snow", "age": 17.0},
    {"first_name": "Sansa", "house": "Stark", "last_name": "Stark", "age": 14.0},
    {"first_name": "Rickon", "house": "Stark", "last_name": "Stark", "age": 5.0},
    {"first_name": "Arya", "house": "Stark", "last_name": "Stark", "age": 11.0},
    {"first_name": "Bran", "house": "Stark", "last_name": "Stark", "age": 10.0},
    {"first_name": "Daenerys", "house": "Targaryen", "last_name": "Targaryen", "age": 16.0},
]

HOUSES = [
    {"house": "House of Lannister"},
    {"house": "House of Greyjoy"},
    {"house": "House of Stark"},
    {"house": "House of Targaryen"},
    {"house": "House of Martell"},
    {"house": "House of Tyrell"},
]


def _characters_df(spark):
    # single partition so scan order == list order (reference is a
    # single-threaded stream; order-sensitive aggregators need it)
    return spark.createDataFrame(CHARACTERS).coalesce(1)


def test_join_format_keys_aggregators(spark):
    res, _, _ = Flow(
        _characters_df(spark),
        spark.createDataFrame(HOUSES).coalesce(1),
        join(
            "res_1",
            "House of {house}",
            "res_2",
            "{house}",
            dict(
                max_age={"name": "age", "aggregate": "max"},
                avg_age={"name": "age", "aggregate": "avg"},
                representative={"name": "first_name", "aggregate": "last"},
                representative_age={"name": "age"},
                number_of_characters={"aggregate": "count"},
                last_names={"name": "last_name", "aggregate": "counters"},
            ),
            mode="inner",
        ),
        sort_rows(["house"]),
    ).results(spark)
    rows = res[0]
    assert [r["house"] for r in rows] == [
        "House of Lannister",
        "House of Stark",
        "House of Targaryen",
    ]
    lan, stark, targ = rows
    assert lan["max_age"] == 34.0 and abs(lan["avg_age"] - 31.666666666666668) < 1e-9
    assert lan["number_of_characters"] == 3
    assert lan["representative"] == "Cersei" and lan["representative_age"] == 34.0
    assert lan["last_names"] == [{"value": "Lannister", "count": 3}]
    assert stark["avg_age"] == 11.4 and stark["max_age"] == 17.0
    assert stark["number_of_characters"] == 5
    assert stark["representative"] == "Bran" and stark["representative_age"] == 10.0
    assert stark["last_names"] == [
        {"value": "Stark", "count": 4},
        {"value": "Snow", "count": 1},
    ]
    assert targ["number_of_characters"] == 1 and targ["representative"] == "Daenerys"


def test_join_half_outer_keeps_unmatched(spark):
    res, _, _ = Flow(
        _characters_df(spark),
        spark.createDataFrame(HOUSES).coalesce(1),
        join(
            "res_1",
            "House of {house}",
            "res_2",
            "{house}",
            {"n": {"aggregate": "count"}},
            mode="half-outer",
        ),
        sort_rows(["house"]),
    ).results(spark)
    rows = {r["house"]: r["n"] for r in res[0]}
    assert rows["House of Greyjoy"] is None
    assert rows["House of Lannister"] == 3
    assert len(rows) == 6


def test_join_with_self_first_after_sort(spark):
    # reference test_lib.py:1676-1716 — youngest per house via sort + first
    res, _, _ = Flow(
        _characters_df(spark),
        sort_rows("{age:02}"),
        join_with_self(
            "res_1",
            "{house}",
            {"the_house": {"name": "house"}, "*": {"aggregate": "first"}},
        ),
        sort_rows("{the_house}"),
    ).results(spark)
    assert res[0] == [
        {"the_house": "Lannister", "first_name": "Tyrion", "last_name": "Lannister", "age": 27.0},
        {"the_house": "Stark", "first_name": "Rickon", "last_name": "Stark", "age": 5.0},
        {"the_house": "Targaryen", "first_name": "Daenerys", "last_name": "Targaryen", "age": 16.0},
    ]


def test_join_field_list_keys_full_outer(spark):
    left = [{"k": 1, "v": 10}, {"k": 2, "v": 20}]
    right = [{"k": 2, "w": "b"}, {"k": 3, "w": "c"}]
    res, _, _ = Flow(
        spark.createDataFrame(left).coalesce(1),
        spark.createDataFrame(right).coalesce(1),
        join("res_1", ["k"], "res_2", ["k"], {"v": {"name": "v", "aggregate": "sum"}}, mode="full-outer"),
        sort_rows(["k"]),
    ).results(spark)
    assert res[0] == [
        {"k": 1, "w": None, "v": 10},
        {"k": 2, "w": "b", "v": 20},
        {"k": 3, "w": "c", "v": None},
    ]


def test_join_aggregator_set_and_array(spark):
    data = [
        {"g": "a", "v": 3},
        {"g": "a", "v": 1},
        {"g": "a", "v": 3},
        {"g": "b", "v": 2},
    ]
    res, _, _ = Flow(
        spark.createDataFrame(data).coalesce(1),
        join_with_self(
            "res_1",
            ["g"],
            {
                "g": None,
                "vals": {"name": "v", "aggregate": "array"},
                "uniq": {"name": "v", "aggregate": "set"},
                "med": {"name": "v", "aggregate": "median"},
                "mn": {"name": "v", "aggregate": "min"},
            },
        ),
        sort_rows(["g"]),
    ).results(spark)
    a, b = res[0]
    assert a["vals"] == [3, 1, 3]  # arrival order preserved
    assert a["uniq"] == [1, 3]  # sorted-set (documented deviation)
    assert a["med"] == 3 and a["mn"] == 1
    assert b["vals"] == [2]


def test_join_full_outer_format_keys_reconstructs_target_key(spark):
    # reference __key__ mechanism (join.py:258-268, test_edge_cases.py:104-133):
    # unmatched SOURCE keys emit rows with the target key fields filled from
    # the captured source key values
    src = [{"house": "Lannister", "age": 30.0}, {"house": "Greyjoy", "age": 20.0}]
    tgt = [{"h": "Lannister", "seat": "Casterly Rock"}, {"h": "Stark", "seat": "Winterfell"}]
    res, _, _ = Flow(
        spark.createDataFrame(src).coalesce(1),
        spark.createDataFrame(tgt).coalesce(1),
        join(
            "res_1",
            "{house}",
            "res_2",
            "{h}",
            {"max_age": {"name": "age", "aggregate": "max"}},
            mode="full-outer",
        ),
        sort_rows(["h"]),
    ).results(spark)
    assert res[0] == [
        {"h": "Greyjoy", "seat": None, "max_age": 20.0},     # reconstructed key
        {"h": "Lannister", "seat": "Casterly Rock", "max_age": 30.0},
        {"h": "Stark", "seat": "Winterfell", "max_age": None},
    ]


def test_join_with_self_decimal_exact_parity(spark):
    """SURVEY §7.4 item 4 — 'number' fields cast to DecimalType give
    EXACT aggregation like the reference's Decimal goldens
    (tests/test_lib.py:1646-1654: avg_age Decimal('31.666...67')).
    Spark's decimal avg carries scale 22 (p+4/s+4 capped at 38) vs
    Python's 28-significant-digit context — same exact rational,
    documented quantization difference."""
    from decimal import Decimal

    from dataflows_spark import Context, set_type
    from dataflows_spark.core.package import TablePackage

    pkg = TablePackage()
    pkg.add("characters", _characters_df(spark))
    set_type("age", type="decimal").process(Context(spark), pkg)
    join_with_self(
        "characters",
        ["house"],
        {
            "house": None,
            "avg_age": {"name": "age", "aggregate": "avg"},
            "max_age": {"name": "age", "aggregate": "max"},
        },
    ).process(Context(spark), pkg)
    rows = {r["house"]: r for r in pkg["characters"].collect()}
    lan = rows["Lannister"]
    assert lan["avg_age"] == Decimal("31.6666666666666666666667")  # exact, not 31.666666666666668
    assert lan["max_age"] == Decimal(34)
    assert rows["Stark"]["avg_age"] == Decimal("11.4")
    assert rows["Targaryen"]["avg_age"] == Decimal(16)
