"""load format surface: xlsx (stdlib OOXML parser) and datapackage://
round trips — reference processors/load.py:130-137 format dispatch and
the tests/test_lib.py load matrix."""

from pyspark.sql import functions as F

from dataflows_spark import Flow, dump_to_path, load, set_primary_key
from dataflows_spark.sources.xlsx import read_xlsx, write_xlsx


def test_xlsx_roundtrip_types(spark, tmp_path):
    path = str(tmp_path / "t.xlsx")
    write_xlsx(
        path,
        ["name", "qty", "price", "active", "note"],
        [
            ["ab & <c>", 3, 1.5, True, None],
            ["d", 4, 2.0, False, "hi"],
            [None, 5, 2.25, True, "yo"],
        ],
    )
    header, rows = read_xlsx(path)
    assert header == ["name", "qty", "price", "active", "note"]
    assert rows[0][0] == "ab & <c>" and rows[0][1] == 3 and rows[0][3] is True

    pkg = Flow(load(path, name="sheet")).dataframes(spark)
    df = pkg["sheet"]
    assert dict(df.dtypes) == {
        "name": "string", "qty": "bigint", "price": "double",
        "active": "boolean", "note": "string",
    }
    got = sorted((r["qty"], r["price"]) for r in df.collect())
    assert got == [(3, 1.5), (4, 2.0), (5, 2.25)]


def test_xlsx_sheet_by_name(spark, tmp_path):
    path = str(tmp_path / "s.xlsx")
    write_xlsx(path, ["a"], [[1], [2]], sheet_name="data")
    header, rows = read_xlsx(path, sheet="data")
    assert header == ["a"] and [r[0] for r in rows] == [1, 2]


def test_datapackage_roundtrip_by_name(spark, tmp_path):
    out = str(tmp_path / "pkg")
    Flow(
        load("/root/testdata/sf0.001/nation.parquet", name="nation"),
        load("/root/testdata/sf0.001/region.parquet", name="region"),
        set_primary_key(["n_nationkey"], resources="nation"),
        dump_to_path(out),
    ).process(spark)

    pkg = Flow(load(f"{out}/datapackage.json")).dataframes(spark)
    assert set(pkg.names) == {"nation", "region"}
    assert pkg.resource_meta["nation"]["primaryKey"] == ["n_nationkey"]
    n = pkg["nation"]
    orig = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    assert n.count() == orig.count()
    assert set(n.columns) == set(orig.columns)

    only = Flow(load(f"{out}/datapackage.json", resources="region")).dataframes(spark)
    assert only.names == ["region"]


def test_datapackage_csv_resources(spark, tmp_path):
    out = str(tmp_path / "pkgcsv")
    Flow(
        load("/root/testdata/sf0.001/region.parquet", name="region"),
        dump_to_path(out, format="csv"),
    ).process(spark)
    pkg = Flow(load(f"{out}/datapackage.json")).dataframes(spark)
    assert pkg["region"].count() == 5


def test_load_override_fields_with_on_error(spark, tmp_path):
    """reference load.py:55-63: per-field type overrides + error policy."""
    p = str(tmp_path / "m.csv")
    with open(p, "w") as fh:
        fh.write("id,v\n1,10\n2,xx\n3,30\n")
    pkg = Flow(
        load(p, name="m", infer_strategy="strings",
             override_fields={"v": "integer"}, on_error="drop"),
    ).dataframes(spark)
    rows = sorted((r["id"], r["v"]) for r in pkg["m"].collect())
    assert rows == [("1", 10), ("3", 30)]
    # clear: failed cast nulls the value, row kept
    pkg = Flow(
        load(p, name="m", cast_strategy="strings",
             override_fields={"v": {"type": "integer"}}, on_error="clear"),
    ).dataframes(spark)
    rows = {r["id"]: r["v"] for r in pkg["m"].collect()}
    assert rows == {"1": 10, "2": None, "3": 30}


def test_dump_counters_bytes_and_hash(spark, tmp_path):
    """reference dumper_base.py:67-75 counter parity: rows + bytes +
    content hash; add_filehash_to_path nests the dump under its hash."""
    out = str(tmp_path / "d1")
    _, stats = Flow(
        load("/root/testdata/sf0.001/region.parquet", name="region"),
        dump_to_path(out),
    ).process(spark)
    assert stats["count_of_rows"]["region"] == 5
    assert stats["bytes"]["region"] > 0
    assert len(stats["hash"]["region"]) == 32

    out2 = str(tmp_path / "d2")
    _, stats2 = Flow(
        load("/root/testdata/sf0.001/region.parquet", name="region"),
        dump_to_path(out2, add_filehash_to_path=True),
    ).process(spark)
    h = stats2["dump"]["hash"]
    assert stats2["dump"]["path"] == f"{out2}/{h}"
    import os as _os
    assert _os.path.exists(f"{out2}/{h}/datapackage.json")
    reread = Flow(load(f"{out2}/{h}/datapackage.json")).dataframes(spark)
    assert reread["region"].count() == 5


def test_dump_to_zip_roundtrip(spark, tmp_path):
    """reference dumpers/to_zip.py: csv + datapackage.json inside one zip."""
    import zipfile

    from dataflows_spark import dump_to_zip

    out = str(tmp_path / "pkg.zip")
    Flow(
        load("/root/testdata/sf0.001/region.parquet", name="region"),
        dump_to_zip(out, format="csv"),
    ).process(spark)
    with zipfile.ZipFile(out) as zf:
        names = zf.namelist()
        assert "datapackage.json" in names
        assert any(n.startswith("region/") and n.endswith(".csv") for n in names)


def test_load_xml_rows(spark, tmp_path):
    p = str(tmp_path / "t.xml")
    with open(p, "w") as fh:
        fh.write(
            "<root><row id=\"1\"><name>a</name><qty>3</qty></row>"
            "<row id=\"2\"><name>b</name><qty>4</qty></row></root>"
        )
    pkg = Flow(load(p, name="t", override_fields={"qty": "integer"})).dataframes(spark)
    rows = sorted((r["id"], r["name"], r["qty"]) for r in pkg["t"].collect())
    assert rows == [("1", "a", 3), ("2", "b", 4)]


def test_load_geojson_features(spark, tmp_path):
    """GeoJSON FeatureCollection: one row per feature, properties as
    columns, geometry preserved as JSON."""
    import json as _json

    p = str(tmp_path / "g.geojson")
    fc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "properties": {"name": "a", "pop": 10},
             "geometry": {"type": "Point", "coordinates": [34.75, 32.06]}},
            {"type": "Feature", "properties": {"name": "b", "pop": 20},
             "geometry": {"type": "Point", "coordinates": [0.0, 51.5]}},
        ],
    }
    with open(p, "w") as fh:
        _json.dump(fc, fh)
    pkg = Flow(load(p, name="g")).dataframes(spark)
    rows = {r["name"]: r for r in pkg["g"].collect()}
    assert rows["a"]["pop"] == 10
    geom = _json.loads(rows["a"]["geometry"])
    assert geom["type"] == "Point" and geom["coordinates"] == [34.75, 32.06]


def test_load_zip_package_roundtrip(spark, tmp_path):
    """load() reads a dump_to_zip package back by manifest (paths
    resolved relative to the extracted manifest, not the origin dir)."""
    from dataflows_spark import dump_to_zip

    out = str(tmp_path / "pkg2.zip")
    Flow(
        load("/root/testdata/sf0.001/region.parquet", name="region"),
        dump_to_zip(out, format="csv"),
    ).process(spark)
    pkg = Flow(load(out)).dataframes(spark)
    assert pkg["region"].count() == 5


def test_dump_filehash_idempotent_and_scoped(spark, tmp_path):
    """add_filehash_to_path must move ONLY this dump's resources
    (advisor round-2): a second identical dump into the same out_path
    replaces in place instead of nesting/crashing, and unrelated
    entries in out_path are left alone."""
    import os

    out = str(tmp_path / "d3")
    os.makedirs(out)
    with open(os.path.join(out, "unrelated.txt"), "w") as fh:
        fh.write("keep me")

    def dump_once():
        _, stats = Flow(
            load("/root/testdata/sf0.001/region.parquet", name="region"),
            dump_to_path(out, add_filehash_to_path=True),
        ).process(spark)
        return stats

    s1 = dump_once()
    s2 = dump_once()  # identical content → identical hash → idempotent
    h = s1["dump"]["hash"]
    assert s2["dump"]["hash"] == h
    assert sorted(os.listdir(out)) == [h, "unrelated.txt"]
    assert not os.path.exists(os.path.join(out, h, h))  # no nesting
    reread = Flow(load(f"{out}/{h}/datapackage.json")).dataframes(spark)
    assert reread["region"].count() == 5


def test_load_remote_url(spark, tmp_path):
    """http(s):// sources load transparently via the fetch-to-temp shim
    (reference tabulator remote support) — plain CSV and a remote
    dump_to_zip package, against a local HTTP fixture server."""
    import functools
    import http.server
    import threading

    from dataflows_spark import dump_to_zip

    root = tmp_path / "www"
    root.mkdir()
    (root / "data.csv").write_text("a,b\n1,x\n2,y\n")
    Flow(
        load("/root/testdata/sf0.001/region.parquet", name="region"),
        dump_to_zip(str(root / "pkg.zip"), format="csv"),
    ).process(spark)

    handler = functools.partial(http.server.SimpleHTTPRequestHandler, directory=str(root))
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    try:
        pkg = Flow(load(f"http://127.0.0.1:{port}/data.csv", name="r")).dataframes(spark)
        assert sorted((r["a"], r["b"]) for r in pkg["r"].collect()) == [(1, "x"), (2, "y")]

        pkg2 = Flow(load(f"http://127.0.0.1:{port}/pkg.zip")).dataframes(spark)
        assert pkg2["region"].count() == 5

        # extension-less remote URL + explicit format= (Google-Sheets-
        # style export endpoints)
        import shutil as _sh

        _sh.copy(str(root / "data.csv"), str(root / "export"))
        pkg3 = Flow(load(f"http://127.0.0.1:{port}/export", name="r3", format="csv")).dataframes(spark)
        assert pkg3["r3"].count() == 2

        # bare remote datapackage.json: loud error with guidance, never
        # a silent wrong read
        import pytest as _p

        with _p.raises(Exception, match="dump_to_zip"):  # Flow wraps stage errors
            Flow(load(f"http://127.0.0.1:{port}/datapackage.json")).dataframes(spark)
    finally:
        srv.shutdown()


def test_ods_roundtrip_types(spark, tmp_path):
    """ODS (OpenDocument) load path: stdlib zip+XML parser, typed
    columns, repeat-count expansion — reference tabulator loads .ods
    transparently (cli.py:12 format list)."""
    from dataflows_spark.sources.ods import read_ods, write_ods

    path = str(tmp_path / "t.ods")
    write_ods(
        path,
        ["name", "n", "ratio", "flag"],
        [["alpha", 1, 1.5, True], ["beta & <co>", 2, 2.25, False], [None, 3, 3.5, True]],
    )
    header, rows = read_ods(path)
    assert header == ["name", "n", "ratio", "flag"]
    assert rows[1][0] == "beta & <co>"  # XML escaping round-trips
    assert rows[0][1] == 1 and isinstance(rows[0][1], int)
    assert rows[2][2] == 3.5

    pkg = Flow(load(path, name="t")).dataframes(spark)
    df = pkg["t"]
    assert dict(df.dtypes)["n"] == "bigint" and dict(df.dtypes)["ratio"] == "double"
    assert dict(df.dtypes)["flag"] == "boolean"
    assert df.count() == 3


def test_ods_sheet_by_name_and_repeats(tmp_path):
    from dataflows_spark.sources.ods import read_ods, write_ods

    path = str(tmp_path / "s.ods")
    write_ods(path, ["a"], [[1], [2]], sheet_name="data")
    header, rows = read_ods(path, sheet="data")
    assert header == ["a"] and [r[0] for r in rows] == [1, 2]


def test_gsheet_url_rewrite():
    """Google-Sheets UI URLs rewrite onto the CSV export endpoint the
    http shim fetches (reference gsheet support via tabulator)."""
    from dataflows_spark.operators.load import _gsheet_export_url as gs

    assert (
        gs("https://docs.google.com/spreadsheets/d/KEY123/edit#gid=77")
        == "https://docs.google.com/spreadsheets/d/KEY123/export?format=csv&gid=77"
    )
    assert (
        gs("https://docs.google.com/spreadsheets/d/KEY123/edit?usp=sharing")
        == "https://docs.google.com/spreadsheets/d/KEY123/export?format=csv"
    )
    # already an export endpoint → untouched
    u = "https://docs.google.com/spreadsheets/d/K/export?format=csv"
    assert gs(u) == u
    # non-sheet URLs pass through (no rewrite) unless forced
    assert gs("https://example.com/data.csv") is None
    assert gs("http://h/spreadsheets/d/K/edit", force=True) == "http://h/spreadsheets/d/K/export?format=csv"


def test_gsheet_load_via_fixture_server(spark, tmp_path):
    """format='gsheet' end-to-end: the UI-style URL is rewritten to the
    export endpoint and fetched through the http shim (local fixture
    server stands in for docs.google.com — no network)."""
    import functools
    import http.server
    import threading

    root = tmp_path / "gs"
    (root / "spreadsheets" / "d" / "KEY9").mkdir(parents=True)
    (root / "spreadsheets" / "d" / "KEY9" / "export").write_text("a,b\n1,x\n2,y\n")
    handler = functools.partial(http.server.SimpleHTTPRequestHandler, directory=str(root))
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    try:
        pkg = Flow(
            load(f"http://127.0.0.1:{port}/spreadsheets/d/KEY9/edit#gid=0", name="g", format="gsheet")
        ).dataframes(spark)
        assert sorted((r["a"], r["b"]) for r in pkg["g"].collect()) == [(1, "x"), (2, "y")]
    finally:
        srv.shutdown()


def test_gsheet_published_urls_pass_through():
    from dataflows_spark.operators.load import _gsheet_export_url as gs

    u = "https://docs.google.com/spreadsheets/d/e/2PACX-abc/pub?output=csv"
    assert gs(u) == u  # published link already serves CSV
    assert (
        gs("https://docs.google.com/spreadsheets/d/e/2PACX-abc/pub?gid=3")
        == "https://docs.google.com/spreadsheets/d/e/2PACX-abc/pub?gid=3&output=csv"
    )
    # explicit sheet= against a /pub URL that ALREADY has a query gid:
    # the gid substitutes in place, and single=true must still be
    # guaranteed or the selection is silently ignored (advisor r5)
    assert gs(
        "https://docs.google.com/spreadsheets/d/e/2PACX-abc/pub?gid=3&output=csv",
        sheet=7,
    ) == (
        "https://docs.google.com/spreadsheets/d/e/2PACX-abc/pub?gid=7&output=csv"
        "&single=true"
    )
    # …but when single=true is already present it is not duplicated
    assert gs(
        "https://docs.google.com/spreadsheets/d/e/2PACX-abc/pub?gid=3&single=true",
        sheet=7,
    ) == (
        "https://docs.google.com/spreadsheets/d/e/2PACX-abc/pub?gid=7&single=true"
        "&output=csv"
    )


def test_ods_roundtrip_property():
    """Hypothesis: arbitrary cell content (XML-special chars, unicode,
    numbers, bools, Nones) survives the write_ods → read_ods round-trip."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dataflows_spark.sources.ods import read_ods, write_ods

    text = st.text(
        alphabet=st.characters(blacklist_categories=("Cs", "Cc")), min_size=0, max_size=40
    )
    cell = st.one_of(
        st.none(),
        text,
        st.integers(min_value=-(2**50), max_value=2**50),
        st.booleans(),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
    )

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.lists(cell, min_size=3, max_size=3), min_size=1, max_size=6))
    def check(rows):
        import tempfile, os

        path = os.path.join(tempfile.mkdtemp(prefix="ods_prop_"), "t.ods")
        write_ods(path, ["a", "b", "c"], rows)
        header, got = read_ods(path)
        assert header == ["a", "b", "c"]
        # trailing all-empty rows are spreadsheet padding — trimmed by
        # the reader (same as tabulator/openpyxl semantics)
        def empty(r):
            return all(v is None or v == "" for v in r)

        while rows and empty(rows[-1]):
            rows = rows[:-1]
        assert len(got) == len(rows)
        for want_row, got_row in zip(rows, got):
            for w, g in zip(want_row, got_row):
                if w is None or (isinstance(w, str) and w == ""):
                    # empty string and None both render as an empty cell
                    assert g is None or g == ""
                elif isinstance(w, float):
                    assert g is not None and abs(float(g) - w) <= 1e-6 * max(1.0, abs(w))
                elif isinstance(w, str):
                    # ODF text: leading/trailing whitespace normalization is
                    # out of scope for the minimal writer — compare stripped
                    assert isinstance(g, str) and g.split() == w.split()
                else:
                    assert g == w

    check()


def test_custom_parser_hook(spark, tmp_path):
    """``custom_parsers`` (reference load.py:131-137): a user-supplied
    format-name → parser callable takes precedence for its format."""
    p = tmp_path / "data.wkv"
    p.write_text("a=1;b=x\na=2;b=y\n")

    def wkv_parser(sp, path, stage):
        rows = []
        for line in open(path):
            d = dict(kv.split("=") for kv in line.strip().split(";"))
            rows.append((int(d["a"]), d["b"]))
        return sp.createDataFrame(rows, "a bigint, b string")

    pkg = Flow(
        load(str(p), name="r", format="wkv", custom_parsers={"wkv": wkv_parser})
    ).dataframes(spark)
    assert sorted((r["a"], r["b"]) for r in pkg["r"].collect()) == [(1, "x"), (2, "y")]


def test_custom_file_formatter_hook(spark, tmp_path):
    """``file_formatters`` (reference file_dumper.py:37): a user writer
    owns the write for its format name."""
    from dataflows_spark import dump_to_path

    import os

    written = {}

    def tsvish_writer(df, target, stage):
        rows = df.collect()  # fixture-scale custom writer
        os.makedirs(target, exist_ok=True)
        with open(os.path.join(target, "data.tsv"), "w") as fh:
            for r in rows:
                fh.write("\t".join(str(v) for v in r) + "\n")
        written["target"] = target

    out = str(tmp_path / "dump")
    Flow(
        load("/root/testdata/sf0.001/region.parquet", name="region"),
        dump_to_path(out, format="tsvish", file_formatters={"tsvish": tsvish_writer}),
    ).process(spark)
    assert written and os.path.exists(os.path.join(written["target"], "data.tsv"))
    assert len(open(os.path.join(written["target"], "data.tsv")).readlines()) == 5


def test_ods_midrow_repeated_empty_cells(tmp_path):
    """Review fix: mid-row repeated EMPTY cells must expand with full
    multiplicity (column positions shift otherwise); trailing filler
    and interior blank-row runs behave like tabulator/ezodf."""
    import zipfile

    from dataflows_spark.sources.ods import read_ods

    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        "<office:body><office:spreadsheet>"
        '<table:table table:name="S">'
        # header: h0..h4
        "<table:table-row>"
        + "".join(
            f'<table:table-cell office:value-type="string"><text:p>h{i}</text:p></table:table-cell>'
            for i in range(5)
        )
        + "</table:table-row>"
        # A, <3 blank>, B, then huge trailing filler (LibreOffice pads rows)
        "<table:table-row>"
        '<table:table-cell office:value-type="string"><text:p>A</text:p></table:table-cell>'
        '<table:table-cell table:number-columns-repeated="3"/>'
        '<table:table-cell office:value-type="string"><text:p>B</text:p></table:table-cell>'
        '<table:table-cell table:number-columns-repeated="16379"/>'
        "</table:table-row>"
        # two interior blank rows, then a data row
        '<table:table-row table:number-rows-repeated="2"><table:table-cell '
        'table:number-columns-repeated="16384"/></table:table-row>'
        "<table:table-row>"
        '<table:table-cell office:value-type="float" office:value="7"><text:p>7</text:p></table:table-cell>'
        "</table:table-row>"
        # trailing whole-sheet blank filler row — must disappear
        '<table:table-row table:number-rows-repeated="1048576"><table:table-cell '
        'table:number-columns-repeated="16384"/></table:table-row>'
        "</table:table></office:spreadsheet></office:body></office:document-content>"
    )
    p = str(tmp_path / "lo.ods")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.spreadsheet")
        zf.writestr("content.xml", content)
    header, rows = read_ods(p)
    assert header == ["h0", "h1", "h2", "h3", "h4"]
    assert rows[0] == ["A", None, None, None, "B"]  # B in column 4, not 1
    assert rows[1] == [None] * 5 and rows[2] == [None] * 5  # interior blanks kept
    assert rows[3][0] == 7
    assert len(rows) == 4  # trailing filler rows trimmed


def test_gsheet_pubhtml_rewrite_and_bad_url_error(spark):
    from dataflows_spark.operators.load import _gsheet_export_url as gs

    assert (
        gs("https://docs.google.com/spreadsheets/d/e/2PACX-xyz/pubhtml")
        == "https://docs.google.com/spreadsheets/d/e/2PACX-xyz/pub?output=csv"
    )
    assert (
        gs("https://docs.google.com/spreadsheets/d/e/2PACX-xyz/pubhtml?gid=5&single=true")
        == "https://docs.google.com/spreadsheets/d/e/2PACX-xyz/pub?gid=5&single=true&output=csv"
    )
    # forced gsheet on an unrecognizable URL: loud error, not a
    # DATA_SOURCE_NOT_FOUND crash from spark.read.format('gsheet')
    import pytest as _p

    with _p.raises(Exception, match="gsheet"):
        Flow(load("https://host/opaque-endpoint", name="r", format="gsheet")).dataframes(spark)


def test_custom_formatter_without_spark_action(spark, tmp_path):
    """Review fix: a formatter that never runs a Spark action on the
    DataFrame (e.g. copies a precomputed file) must not hang the dump
    on an unfired Observation; single-file targets hash fine."""
    from dataflows_spark import dump_to_path

    def file_writer(df, target, stage):
        with open(target, "w") as fh:  # no df action at all
            fh.write("precomputed\n")

    out = str(tmp_path / "d")
    _, stats = Flow(
        load("/root/testdata/sf0.001/region.parquet", name="region"),
        dump_to_path(out, format="blob", file_formatters={"blob": file_writer}),
    ).process(spark)
    assert stats["count_of_rows"]["region"] == 5
    assert stats["bytes"]["region"] == len("precomputed\n")


def test_gsheet_rewrite_with_pinned_csv_format(spark, tmp_path):
    """Review fix 2: format='csv' on a sheets UI URL must still rewrite
    to the export endpoint (it serves exactly csv) — the narrowing for
    xlsx/ods pins must not regress csv-pinned callers."""
    import functools
    import http.server
    import threading

    root = tmp_path / "gs2"
    (root / "spreadsheets" / "d" / "K2").mkdir(parents=True)
    (root / "spreadsheets" / "d" / "K2" / "export").write_text("a,b\n5,z\n")
    handler = functools.partial(http.server.SimpleHTTPRequestHandler, directory=str(root))
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    try:
        import sys as _sys

        load_mod = _sys.modules["dataflows_spark.operators.load"]
        orig = load_mod._gsheet_export_url

        def fake(url, force=False, sheet=None):
            # stand in for the docs.google.com host match on localhost
            return orig(url, force=True, sheet=sheet)

        load_mod._gsheet_export_url = fake
        try:
            pkg = Flow(
                load(f"http://127.0.0.1:{port}/spreadsheets/d/K2/edit#gid=0", name="g", format="csv")
            ).dataframes(spark)
            assert [(r["a"], r["b"]) for r in pkg["g"].collect()] == [(5, "z")]
        finally:
            load_mod._gsheet_export_url = orig
    finally:
        srv.shutdown()


def test_ods_interior_gap_beyond_10k(tmp_path):
    """Review fix 2: a mid-row empty run larger than the generic repeat
    cap must keep full multiplicity (positions matter); only trailing
    filler may be dropped."""
    import zipfile

    from dataflows_spark.sources.ods import read_ods

    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        "<office:body><office:spreadsheet>"
        '<table:table table:name="S">'
        "<table:table-row>"
        '<table:table-cell office:value-type="string"><text:p>h</text:p></table:table-cell>'
        "</table:table-row>"
        "<table:table-row>"
        '<table:table-cell office:value-type="string"><text:p>A</text:p></table:table-cell>'
        '<table:table-cell table:number-columns-repeated="12000"/>'
        '<table:table-cell office:value-type="string"><text:p>B</text:p></table:table-cell>'
        "</table:table-row>"
        "</table:table></office:spreadsheet></office:body></office:document-content>"
    )
    p = str(tmp_path / "gap.ods")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.spreadsheet")
        zf.writestr("content.xml", content)
    _header, rows = read_ods(p)
    assert rows[0][0] == "A" and rows[0][12001] == "B"  # exact column kept
    assert len(rows[0]) == 12002


def _mini_ods(tmp_path, rows_xml, name="r5.ods"):
    import zipfile

    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        "<office:body><office:spreadsheet>"
        '<table:table table:name="S">' + rows_xml + "</table:table>"
        "</office:spreadsheet></office:body></office:document-content>"
    )
    p = str(tmp_path / name)
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.spreadsheet")
        zf.writestr("content.xml", content)
    return p


def test_ods_valued_row_repeat_over_cap_raises(tmp_path):
    """round-4 advisor: LibreOffice legitimately compresses identical
    consecutive DATA rows via number-rows-repeated — silently truncating
    >10k of them loses rows, so the reader fails loud instead. Interior
    blank runs and trailing filler stay silent (positions exact / free)."""
    import pytest as _p

    from dataflows_spark.sources.ods import read_ods

    cell = '<table:table-cell office:value-type="string"><text:p>v</text:p></table:table-cell>'
    hdr = f"<table:table-row>{cell}</table:table-row>"
    p = _mini_ods(
        tmp_path,
        hdr + f'<table:table-row table:number-rows-repeated="20000">{cell}</table:table-row>',
    )
    with _p.raises(ValueError, match="number-rows-repeated=20000"):
        read_ods(p)

    # valued rows UNDER the cap expand exactly
    p2 = _mini_ods(
        tmp_path,
        hdr + f'<table:table-row table:number-rows-repeated="9999">{cell}</table:table-row>',
        name="ok.ods",
    )
    _h, rows = read_ods(p2)
    assert len(rows) == 9999

    # interior BLANK runs beyond the cap keep positions (no raise)
    p3 = _mini_ods(
        tmp_path,
        hdr
        + '<table:table-row table:number-rows-repeated="20000"><table:table-cell/></table:table-row>'
        + f"<table:table-row>{cell}</table:table-row>",
        name="gap.ods",
    )
    _h, rows = read_ods(p3)
    assert len(rows) == 20001 and rows[-1][0] == "v"

    # trailing blank filler with a huge repeat never materializes
    p4 = _mini_ods(
        tmp_path,
        hdr
        + '<table:table-row table:number-rows-repeated="1000000"><table:table-cell/></table:table-row>',
        name="tail.ods",
    )
    _h, rows = read_ods(p4)
    assert rows == []


def test_gsheet_fragment_and_sheet_selection():
    """round-4 advisor + judge stretch 8: (a) '#gid=0' fragments are
    stripped before appending query params (a '?output=csv' after the
    fragment never reaches the server — HTML, not CSV); (b) sheet=
    selects a worksheet: int/digit-string → gid, name → public gviz
    CSV endpoint."""
    import pytest as _p

    from dataflows_spark.operators.load import _gsheet_export_url as gs

    # fragment on a published link: params must land in the QUERY
    assert (
        gs("https://docs.google.com/spreadsheets/d/e/2PACX-a/pub#gid=7")
        == "https://docs.google.com/spreadsheets/d/e/2PACX-a/pub?gid=7&single=true&output=csv"
    )
    assert (
        gs("https://docs.google.com/spreadsheets/d/e/2PACX-a/pubhtml#gid=0")
        == "https://docs.google.com/spreadsheets/d/e/2PACX-a/pub?gid=0&single=true&output=csv"
    )
    # explicit sheet= wins over the URL's own gid, on every branch
    assert (
        gs("https://docs.google.com/spreadsheets/d/K/edit#gid=5", sheet=3)
        == "https://docs.google.com/spreadsheets/d/K/export?format=csv&gid=3"
    )
    assert (
        gs("https://docs.google.com/spreadsheets/d/K/export?format=csv", sheet="2")
        == "https://docs.google.com/spreadsheets/d/K/export?format=csv&gid=2"
    )
    assert (
        gs("https://docs.google.com/spreadsheets/d/e/2PACX-a/pub", sheet=4)
        == "https://docs.google.com/spreadsheets/d/e/2PACX-a/pub?gid=4&single=true&output=csv"
    )
    # worksheet by NAME → gviz CSV endpoint (the only public name surface)
    assert (
        gs("https://docs.google.com/spreadsheets/d/K/edit", sheet="My Sheet")
        == "https://docs.google.com/spreadsheets/d/K/gviz/tq?tqx=out:csv&sheet=My%20Sheet"
    )
    # names aren't addressable on /export or /pub → loud error
    with _p.raises(ValueError, match="gid"):
        gs("https://docs.google.com/spreadsheets/d/K/export?format=csv", sheet="Data")
    with _p.raises(ValueError, match="gid"):
        gs("https://docs.google.com/spreadsheets/d/e/2PACX-a/pub", sheet="Data")


def test_gsheet_sheet_selection_via_fixture_server(spark, tmp_path):
    """load(url, sheet=...) end-to-end: the rewritten URL carries the
    gid and the fixture server serves per-gid CSVs."""
    import http.server
    import threading

    from dataflows_spark import Flow
    from dataflows_spark.operators.load import load

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = b"a,b\n1,x\n" if "gid=9" in self.path else b"a,b\n2,y\n"
            self.send_response(200)
            self.send_header("Content-Type", "text/csv")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        pkg = Flow(
            load(
                f"http://127.0.0.1:{port}/spreadsheets/d/KEY9/edit",
                name="g",
                format="gsheet",
                sheet=9,
            )
        ).dataframes(spark)
        rows = pkg["g"].collect()
        assert [(r["a"], r["b"]) for r in rows] == [(1, "x")]
    finally:
        srv.shutdown()


def test_xls_roundtrip_types(spark, tmp_path):
    """Legacy .xls (BIFF8): write with the stdlib CFB+BIFF writer, load
    back through the Flow load stage — typed columns, same contract as
    xlsx/ods (reference tabulator .xls support via xlrd, cli.py:12)."""
    from dataflows_spark import Flow
    from dataflows_spark.operators.load import load
    from dataflows_spark.sources.xls import write_xls

    p = str(tmp_path / "t.xls")
    write_xls(
        p,
        ["name", "n", "f", "b", "note"],
        [
            ["alice", 1, 1.5, True, None],
            ["bob", 2, -2.25, False, "x"],
            ["čžß", 3, 100.25, True, "ünïcode"],
        ],
    )
    pkg = Flow(load(p, name="t")).dataframes(spark)
    df = pkg["t"]
    assert dict(df.dtypes) == {"name": "string", "n": "bigint", "f": "double", "b": "boolean", "note": "string"}
    rows = sorted(df.collect(), key=lambda r: r["n"])
    assert [tuple(r) for r in rows] == [
        ("alice", 1, 1.5, True, None),
        ("bob", 2, -2.25, False, "x"),
        ("čžß", 3, 100.25, True, "ünïcode"),
    ]


def test_xls_sheet_selection_validation(tmp_path):
    """sheet= out of the 1-based range (0, negative, too large) and
    unknown names raise a ValueError that lists the available sheets —
    never Python negative indexing silently picking from the END of the
    book (advisor r5)."""
    import pytest

    from dataflows_spark.sources.xls import read_xls, write_xls

    p = str(tmp_path / "sheets.xls")
    write_xls(p, ["a"], [[1], [2]], sheet_name="only")
    assert read_xls(p, sheet=1)[1] == [[1.0], [2.0]]
    assert read_xls(p, sheet="only")[1] == [[1.0], [2.0]]
    for bad in (0, -1, 2, 99):
        with pytest.raises(ValueError, match=r"out of range 1\.\.1.*'only'"):
            read_xls(p, sheet=bad)
    with pytest.raises(ValueError, match=r"no sheet named 'nope'.*'only'"):
        read_xls(p, sheet="nope")


def test_xls_big_file_and_sst_continue(tmp_path):
    """>4096-byte workbook stream exercises the regular-FAT CFB path;
    3000 distinct strings split the SST across CONTINUE records at the
    8224-byte BIFF limit."""
    from dataflows_spark.sources.xls import read_xls, write_xls

    p = str(tmp_path / "big.xls")
    rows = [[f"string-value-{i:05d}", i] for i in range(3000)]
    write_xls(p, ["s", "n"], rows)
    import os as _os

    assert _os.path.getsize(p) > 100_000  # regular-FAT territory
    h, r = read_xls(p)
    assert h == ["s", "n"] and len(r) == 3000
    assert r[0] == ["string-value-00000", 0]
    assert r[2999] == ["string-value-02999", 2999]

    # sheet by name (same contract as xlsx/ods)
    p2 = str(tmp_path / "named.xls")
    write_xls(p2, ["a"], [[1], [2]], sheet_name="data")
    h, r = read_xls(p2, sheet="data")
    assert h == ["a"] and [x[0] for x in r] == [1, 2]


def test_xls_crafted_records(tmp_path):
    """Record paths the minimal writer never emits, from hand-crafted
    BIFF8 bytes: RK (int / ÷100 / truncated-double encodings), MULRK,
    inline LABEL, FORMULA with cached numeric + string (STRING record)
    results, and an SST string split MID-character-data across a
    CONTINUE boundary (per-continuation compression flag)."""
    import struct

    from dataflows_spark.sources.xls import _parse_workbook, _rec

    def rk_int(v):
        return (v << 2) | 2

    def rk_int_div100(v):
        return (v << 2) | 3

    def rk_float(f):
        q = struct.unpack("<Q", struct.pack("<d", f))[0]
        return (q >> 32) & 0xFFFFFFFC

    g = bytearray()
    g += _rec(0x0809, struct.pack("<HHHHIH", 0x0600, 0x0005, 0, 0, 0, 0))
    s = "HELLOWORLD"
    chunk1 = struct.pack("<II", 1, 1) + struct.pack("<HB", 10, 0x01) + s[:4].encode("utf-16-le")
    chunk2 = b"\x01" + s[4:].encode("utf-16-le")  # grbit restarts per CONTINUE
    g += _rec(0x00FC, bytes(chunk1)) + _rec(0x003C, chunk2)
    bs_at = len(g)
    g += _rec(0x0085, struct.pack("<IBBB", 0, 0, 0, 2) + b"\x01" + "S1".encode("utf-16-le"))
    g += _rec(0x000A, b"")
    struct.pack_into("<I", g, bs_at + 4, len(g))
    sh = bytearray()
    sh += _rec(0x0809, struct.pack("<HHHHIH", 0x0600, 0x0010, 0, 0, 0, 0))
    sh += _rec(0x00FD, struct.pack("<HHHI", 0, 0, 15, 0))
    sh += _rec(0x027E, struct.pack("<HHHI", 0, 1, 15, rk_int(42)))
    sh += _rec(0x027E, struct.pack("<HHHI", 0, 2, 15, rk_int_div100(12345)))
    sh += _rec(0x027E, struct.pack("<HHHI", 0, 3, 15, rk_float(2.5)))
    mul = (
        struct.pack("<HH", 1, 0)
        + b"".join(struct.pack("<HI", 15, rk_int(v)) for v in (7, 8, 9))
        + struct.pack("<H", 2)
    )
    sh += _rec(0x00BD, bytes(mul))
    sh += _rec(0x0204, struct.pack("<HHHH", 1, 3, 15, 3) + b"\x00" + b"abc")
    sh += _rec(
        0x0006,
        struct.pack("<HHH", 2, 0, 15) + b"\x00\x00\x00\x00\x00\x00\xff\xff" + struct.pack("<HI", 0, 0),
    )
    sh += _rec(0x0207, struct.pack("<H", 4) + b"\x00" + b"calc")
    sh += _rec(0x0006, struct.pack("<HHH", 2, 1, 15) + struct.pack("<d", 9.75) + struct.pack("<HI", 0, 0))
    sh += _rec(0x000A, b"")
    names, cells = _parse_workbook(bytes(g) + bytes(sh))
    assert names == ["S1"]
    assert cells["S1"] == {
        (0, 0): "HELLOWORLD",
        (0, 1): 42,
        (0, 2): 123.45,
        (0, 3): 2.5,
        (1, 0): 7,
        (1, 1): 8,
        (1, 2): 9,
        (1, 3): "abc",
        (2, 0): "calc",
        (2, 1): 9.75,
    }


def test_xls_not_ole2_raises(tmp_path):
    import pytest as _p

    from dataflows_spark.sources.xls import read_xls

    p = str(tmp_path / "fake.xls")
    with open(p, "wb") as fh:
        fh.write(b"a,b\n1,2\n")
    with _p.raises(ValueError, match="OLE2"):
        read_xls(p)


def test_gsheet_explicit_sheet_overrides_query_gid():
    """Review fix: sheet= must replace a gid already in the QUERY
    string (the 'Publish to web' dialog emits ?gid=0&single=true), not
    just fill one in when absent."""
    from dataflows_spark.operators.load import _gsheet_export_url as gs

    assert (
        gs("https://docs.google.com/spreadsheets/d/e/2PACX-a/pub?gid=0&single=true&output=csv", sheet=7)
        == "https://docs.google.com/spreadsheets/d/e/2PACX-a/pub?gid=7&single=true&output=csv"
    )
    assert (
        gs("https://docs.google.com/spreadsheets/d/K/export?format=csv&gid=3", sheet=9)
        == "https://docs.google.com/spreadsheets/d/K/export?format=csv&gid=9"
    )
    # no explicit sheet → URL's own gid stays
    u = "https://docs.google.com/spreadsheets/d/e/2PACX-a/pub?gid=3&output=csv"
    assert gs(u) == u


def test_xls_long_string_splits_mid_chardata(tmp_path):
    """Review fix: one string longer than a BIFF record splits MID
    character data across CONTINUE records (per-continuation flag
    byte), staying within the 8224-byte record limit; >32767-char cells
    raise instead of silently corrupting the u16 length."""
    import struct

    import pytest as _p

    from dataflows_spark.sources.xls import _records, read_xls, write_xls

    long_s = "x" * 10_000 + "END"
    p = str(tmp_path / "long.xls")
    write_xls(p, ["s"], [[long_s], ["short"]])
    h, rows = read_xls(p)
    assert rows[0][0] == long_s and rows[1][0] == "short"
    # no record exceeds the BIFF8 data limit
    with open(p, "rb") as fh:
        data = fh.read()
    from dataflows_spark.sources.xls import _cfb_streams

    wb = _cfb_streams(data)["Workbook"]
    assert all(len(d) <= 8224 for _op, d, _pos in _records(wb))

    with _p.raises(ValueError, match="32767"):
        write_xls(str(tmp_path / "over.xls"), ["s"], [["y" * 40_000]])


def test_ods_cells_ceiling_guards_blank_run_bomb(tmp_path):
    """Review fix: a crafted huge interior blank run times a wide row
    must fail loud at the rows x width ceiling, not OOM the driver."""
    import pytest as _p

    from dataflows_spark.sources.ods import read_ods

    wide = (
        "<table:table-row>"
        + '<table:table-cell table:number-columns-repeated="16383"/>'
        + '<table:table-cell office:value-type="string"><text:p>w</text:p></table:table-cell>'
        + "</table:table-row>"
    )
    blank_run = '<table:table-row table:number-rows-repeated="1000000"><table:table-cell/></table:table-row>'
    val = '<table:table-row><table:table-cell office:value-type="string"><text:p>v</text:p></table:table-cell></table:table-row>'
    p = _mini_ods(tmp_path, wide + blank_run + val, name="bomb.ods")
    with _p.raises(ValueError, match="ceiling"):
        read_ods(p)
