"""Sources: load / sources / unstream.

Parity target: reference ``dataflows/processors/load.py:40-302``. The
reference loads CSV/JSON/XLSX/SQL/datapackage via tabulator with schema
inference + post-processors (strip, limit_rows, deduplicate_headers,
extract_missing_values, cast strategies). Spark-natively each of those
is a reader option or a cheap expression:

- format dispatch → ``spark.read.format(...)`` (load.py:70-137)
- infer strategies → ``inferSchema`` / explicit ``schema=``
  (load.py:183-204)
- ``strip`` → ``trim()`` on string columns (load.py:231-241)
- ``limit_rows`` → ``df.limit(n)`` (load.py:243-249)
- ``deduplicate_headers`` → rename at read (load.py:284-302)
- ``extract_missing_values`` → ``when(isin(values))`` map column
  (load.py:258-270)

Iceberg catalogs are preferred when the runtime jar is present
(``spark.read.table``); otherwise parquet paths are a drop-in
(SURVEY.md §7.4 item 6).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..core.context import Context
from ..core.flow import Flow, Stage
from ..core.package import TablePackage

_EXT_FORMAT = {
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".ndjson": "json",
    ".jsonl": "json",
    ".parquet": "parquet",
    ".orc": "orc",
    ".txt": "text",
    ".xlsx": "xlsx",
    ".xls": "xls",
    ".ods": "ods",
    ".xml": "xml",
    ".geojson": "geojson",
}


def _gsheet_export_url(url: str, force: bool = False, sheet=None) -> str | None:
    """Rewrite a Google-Sheets UI URL to its CSV export endpoint — the
    reference loads ``gsheet`` sources transparently via tabulator
    (reference ``cli.py:12`` format list); here the rewrite feeds the
    existing http(s) fetch shim. Returns None for non-sheet URLs unless
    ``force`` (``format='gsheet'``), which applies the path rewrite on
    any host (how the offline fixture-server test exercises it).

    ``sheet`` selects a worksheet: an int (or digit string) is the
    sheet ``gid`` (Google's stable per-worksheet id, visible in the UI
    URL); a non-digit string is the worksheet NAME, served through the
    public gviz CSV endpoint (names aren't addressable on ``/export``;
    published ``/pub`` links only address by gid, so a name there
    raises)."""
    import re
    import urllib.parse

    if not (force or "docs.google.com/spreadsheets" in url):
        return None
    # the UI puts the worksheet selector in the FRAGMENT (…#gid=0),
    # which browsers never send to the server — strip it first and
    # re-extract the gid, else anything appended lands inside the
    # fragment and the server ignores it (returns HTML, not CSV)
    url, _, frag = url.partition("#")
    gid = None
    m = re.search(r"(?:^|[?&])gid=(\d+)", frag) or re.search(r"[?&]gid=(\d+)", url)
    if m:
        gid = m.group(1)
    sheet_name = None
    explicit_gid = False
    if sheet is not None:
        if isinstance(sheet, str) and not sheet.isdigit():
            sheet_name = sheet
        else:
            gid = str(int(sheet))  # explicit selection wins over the URL's
            explicit_gid = True

    def with_param(u: str, param: str) -> str:
        return u + ("&" if "?" in u else "?") + param

    def apply_gid(u: str, param: str) -> str:
        """Carry the worksheet gid into the query: REPLACE an existing
        query gid when sheet= was explicit (the URL's own selection
        must not silently win), append otherwise."""
        if re.search(r"[?&]gid=\d+", u):
            return re.sub(r"([?&]gid=)\d+", rf"\g<1>{gid}", u) if explicit_gid else u
        return with_param(u, param)

    if re.search(r"/export\b", url):
        if sheet_name is not None:
            raise ValueError(
                "Google-Sheets /export endpoints address worksheets by gid, not "
                f"name ({sheet_name!r}); pass sheet=<gid> or a UI /d/<id> link"
            )
        if gid is not None:
            url = apply_gid(url, f"gid={gid}")
        return url
    # the standard 'Publish to web' HTML link (…/d/e/2PACX-…/pubhtml):
    # its 2PACX token is NOT a document id, so the /export rewrite would
    # 404 — the correct machine endpoint is /pub?output=csv
    url = re.sub(r"/pubhtml\b", "/pub", url)
    if re.search(r"/pub\b", url):
        # published-to-web link — already serves the chosen format
        # directly (and /export would need auth); ensure csv output and
        # carry the worksheet gid (published links address sheets ONLY
        # by gid — '&single=true' makes the selection effective)
        if sheet_name is not None:
            raise ValueError(
                "published Google-Sheets links (/pub) address worksheets by gid, "
                f"not name ({sheet_name!r}); pass sheet=<gid>"
            )
        if gid is not None:
            url = apply_gid(url, f"gid={gid}&single=true")
            # an explicit sheet= against a URL with a pre-existing query
            # gid takes the REPLACE path above, which substitutes only
            # the digits — the selection is still ineffective without
            # single=true, so guarantee it (URLs without explicit
            # sheet= pass through untouched, as published)
            if explicit_gid and not re.search(r"[?&]single=true\b", url):
                url = with_param(url, "single=true")
        if "output=" not in url.split("?", 1)[-1]:
            url = with_param(url, "output=csv")
        return url
    m = re.search(r"/spreadsheets/(?:u/\d+/)?d/(?:e/)?([^/?#]+)", url)
    if not m:
        return None
    base = url[: url.index("/spreadsheets/")]
    if sheet_name is not None:
        # worksheet-by-NAME needs the gviz CSV endpoint — the only
        # public surface that takes sheet= as a name
        q = urllib.parse.quote(sheet_name)
        return f"{base}/spreadsheets/d/{m.group(1)}/gviz/tq?tqx=out:csv&sheet={q}"
    out = f"{base}/spreadsheets/d/{m.group(1)}/export?format=csv"
    if gid is not None:
        out += f"&gid={gid}"
    return out


def _infer_format(source: str, explicit: str | None) -> str:
    if explicit:
        return explicit
    root, ext = os.path.splitext(source.rstrip("/"))
    return _EXT_FORMAT.get(ext.lower(), "parquet")


def _fetch_to_temp(url: str, format_hint: str | None = None) -> str:
    """Download a remote source to a temp file (removed at interpreter
    exit), preserving the URL path's extension so format inference
    still works; URLs with no path extension (Google-Sheets-style
    export endpoints, APIs with ``?format=csv`` query strings) fall
    back to the caller's explicit ``format=`` for the suffix. The
    reference's tabulator loads ``http(s)://`` sources transparently
    (reference ``processors/load.py:40-63``); this is the explicit
    fetch-to-temp shim for the same UX — remote CSVs/zips are
    interchange files, not scale-path data (parquet at scale lives on
    a shared filesystem/object store the cluster reads directly)."""
    import atexit
    import tempfile
    import urllib.parse
    import urllib.request

    path = urllib.parse.urlparse(url).path
    suffix = os.path.splitext(path)[1] or (f".{format_hint}" if format_hint else "")
    fd, local = tempfile.mkstemp(prefix="dfs_fetch_", suffix=suffix)
    os.close(fd)
    atexit.register(lambda p=local: os.path.exists(p) and os.remove(p))
    with urllib.request.urlopen(url) as resp, open(local, "wb") as out:
        while True:
            chunk = resp.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)
    return local


class load(Stage):
    """Load a table as a new resource.

    ``source`` is a path (csv/json/parquet/orc/xlsx/xls/ods by
    extension),
    an ``http(s)://`` URL (fetched to a temp file — reference tabulator
    remote-source support; Google-Sheets UI URLs rewrite onto the CSV
    export endpoint, ``format='gsheet'`` forces the rewrite for
    non-google hosts), a ``table://name`` catalog reference, a
    ``jdbc://`` URL with ``query=``/``dbtable=`` options, or a
    ``datapackage.json`` manifest (as written by ``dump_to_path``)
    which loads its named resources with their saved metadata —
    reference load.py datapackage support. ``env://VAR`` resolves the
    source from an environment variable (reference load.py env://
    support). ``sheet=`` selects the worksheet: for xlsx/ods a
    1-based index or name; for Google-Sheets URLs an int/digit-string
    is the worksheet ``gid`` and a name routes through the public gviz
    CSV endpoint. ``resources=`` filters datapackage resources.
    """

    name = "load"

    def __init__(
        self,
        source: str,
        name: str | None = None,
        format: str | None = None,
        schema: Any = None,
        strip: bool = True,
        limit_rows: int | None = None,
        deduplicate_headers: bool = False,
        extract_missing_values: Any = None,
        override_schema: Any = None,
        infer_strategy: str | None = None,
        cast_strategy: str | None = None,
        override_fields: dict[str, Any] | None = None,
        on_error: str | None = None,
        sheet: Any = None,
        resources: Any = None,
        custom_parsers: dict[str, Any] | None = None,
        **options: Any,
    ):
        self.source = source
        self.res_name = name
        self.format = format
        #: the caller's ORIGINAL format pin — process() may resolve
        #: self.format (gsheet → csv after a URL rewrite), and a stage
        #: re-run after a transient failure must take the same branch
        self._pinned_format = format
        self.sheet = sheet
        self.resources = resources
        #: reference load.py:131-137 ``custom_parsers``: format name →
        #: ``fn(spark, path, stage) -> DataFrame``. A user parser takes
        #: precedence over the built-in for the same format name; at
        #: scale a parser that needs executor-side parallelism should
        #: return a DataFrame built from a distributed read (DataSource
        #: V2 / spark.read.format plugin), not a driver loop.
        self.custom_parsers = custom_parsers or {}
        # reference load.py:55-63 knobs: per-field type overrides applied
        # post-read as try_casts with schema_validator error policies
        self.override_fields = override_fields
        self.on_error = on_error
        self.schema = schema or override_schema
        self.strip = strip
        self.limit_rows = limit_rows
        self.deduplicate_headers = deduplicate_headers
        self.extract_missing_values = extract_missing_values
        # reference infer strategies (load.py:183-204): 'full' parses
        # string sources into types, 'strings' keeps everything string;
        # cast_strategy is the reference alias for the same choice
        self.infer_strategy = infer_strategy or cast_strategy
        self.options = options

    def _read(self, ctx: Context) -> DataFrame:
        source = self.source
        if source.startswith("env://"):
            source = os.environ[source[6:]]
        if source.startswith("table://"):
            return ctx.spark.read.table(source[8:])
        if source.startswith("jdbc:"):
            reader = ctx.spark.read.format("jdbc").option("url", source)
            for k, v in self.options.items():
                reader = reader.option(k, v)
            return reader.load()
        fmt = _infer_format(source, self.format)
        if fmt in self.custom_parsers:
            return self.custom_parsers[fmt](ctx.spark, source, self)
        if fmt == "xlsx":
            from ..sources.xlsx import xlsx_to_dataframe

            return xlsx_to_dataframe(ctx.spark, source, self.sheet if self.sheet is not None else 1)
        if fmt == "xls":
            from ..sources.xls import xls_to_dataframe

            return xls_to_dataframe(ctx.spark, source, self.sheet if self.sheet is not None else 1)
        if fmt == "ods":
            from ..sources.ods import ods_to_dataframe

            return ods_to_dataframe(ctx.spark, source, self.sheet if self.sheet is not None else 1)
        if fmt == "xml":
            return self._read_xml(ctx, source)
        if fmt == "geojson":
            return self._read_geojson(ctx, source)
        reader = ctx.spark.read.format(fmt)
        if fmt == "csv":
            reader = reader.option("header", "true")
            if self.schema is None:
                infer = self.infer_strategy not in ("strings", "INFER_STRINGS")
                reader = reader.option("inferSchema", str(infer).lower())
        if self.schema is not None:
            reader = reader.schema(self.schema)
        for k, v in self.options.items():
            reader = reader.option(k, v)
        return reader.load(source)

    def _read_xml(self, ctx: Context, source: str) -> DataFrame:
        """Row-oriented XML (reference custom XMLParser,
        ``processors/parsers``): each repeated ``row_tag`` element is a
        record; child elements/attributes become string fields. Parsed
        on the driver via stdlib iterparse (XML is a small-file
        interchange format — not a scale-path source; documented)."""
        import xml.etree.ElementTree as ET

        row_tag = self.options.get("row_tag", "row")
        rows: list[dict] = []
        cols: list[str] = []
        for _event, el in ET.iterparse(source):
            tag = el.tag.split("}")[-1]
            if tag != row_tag:
                continue
            rec: dict[str, str] = dict(el.attrib)
            for child in el:
                rec[child.tag.split("}")[-1]] = child.text
            for k in rec:
                if k not in cols:
                    cols.append(k)
            rows.append(rec)
            el.clear()
        schema = ", ".join(f"`{c}` string" for c in cols) or "`value` string"
        data = [tuple(r.get(c) for c in cols) for r in rows]
        return ctx.spark.createDataFrame(data, schema=schema)

    def _read_geojson(self, ctx: Context, source: str) -> DataFrame:
        """GeoJSON FeatureCollection → one row per feature: properties
        flattened to columns, geometry kept as a JSON string column
        (reference custom GeoJSON parser + ``format_geojson`` dumper).
        Fully Spark-native: multiline JSON read + explode — the file
        parses in executors, not on the driver."""
        raw = ctx.spark.read.option("multiLine", "true").json(source)
        feats = raw.select(F.explode("features").alias("f"))
        prop_fields = [
            sf.name for sf in feats.select("f.properties.*").schema.fields
        ] if "properties" in [x.name for x in feats.schema["f"].dataType.fields] else []
        cols = [F.col(f"f.properties.{p}").alias(p) for p in prop_fields]
        cols.append(F.to_json(F.col("f.geometry")).alias("geometry"))
        return feats.select(*cols)

    def _load_datapackage(self, ctx: Context, pkg: TablePackage, source: str) -> None:
        import json

        base = os.path.dirname(source)
        with open(source) as fh:
            manifest = json.load(fh)
        pkg.meta.update(manifest.get("meta", {}))
        wanted = manifest.get("resources", [])
        if self.resources is not None:
            sel = {self.resources} if isinstance(self.resources, str) else set(self.resources)
            wanted = [r for r in wanted if r in sel]
        for rname in wanted:
            meta = dict(manifest.get("resource_meta", {}).get(rname, {}))
            path = meta.get("path")
            if not path or not os.path.exists(path):
                # relocated packages (zip extraction, copied dirs): resolve
                # relative to the manifest, not the recorded origin
                path = os.path.join(base, rname)
            fmt = meta.get("format")
            if fmt is None:  # older manifests: sniff from the part files
                exts = {os.path.splitext(f)[1] for f in os.listdir(path) if not f.startswith(("_", "."))}
                fmt = next((_EXT_FORMAT[e] for e in exts if e in _EXT_FORMAT), "parquet")
            if fmt in self.custom_parsers:
                # a package dumped through a custom file_formatter can
                # only reload through the matching custom parser — the
                # manifest branch must honor the hook like _read does
                pkg.add(rname, self.custom_parsers[fmt](ctx.spark, path, self), **meta)
                continue
            reader = ctx.spark.read.format(fmt)
            if fmt == "csv":
                reader = reader.option("header", "true").option("inferSchema", "true")
            pkg.add(rname, reader.load(path), **meta)

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        src = self.source
        if src.startswith("env://"):
            src = os.environ[src[6:]]
        if src.startswith(("http://", "https://")):
            # rewrite unless the caller pinned a format that means
            # "parse the fetched bytes as-is" (an explicit
            # format='xlsx'/'ods' on a sheets URL fetches those bytes);
            # format='csv' still rewrites — the export endpoint serves
            # exactly csv, and UI links pinned csv worked pre-round-4
            if self._pinned_format in (None, "gsheet", "csv"):
                gs = _gsheet_export_url(
                    src, force=self._pinned_format == "gsheet", sheet=self.sheet
                )
                if gs is None and self._pinned_format == "gsheet":
                    raise ValueError(
                        f"format='gsheet' but {src!r} is not a recognizable Google-Sheets "
                        "URL (expected a /spreadsheets/d/<id>/… UI link, an /export "
                        "endpoint, or a published /pub(html) link)"
                    )
                if gs is not None:
                    src = gs
                    self.format = "csv"  # the export endpoint serves CSV
            # a bare remote datapackage.json can't work: its resource
            # paths are directories relative to the manifest, which live
            # on the remote server — ship packages as dump_to_zip
            # archives instead (those DO load remotely)
            if src.split("?")[0].endswith("datapackage.json") or self.format == "datapackage":
                raise ValueError(
                    "remote datapackage.json manifests are not supported (their "
                    "resource directories live on the server); package the dump "
                    "with dump_to_zip and load the .zip URL instead"
                )
            src = _fetch_to_temp(src, self.format)
            self.source = src  # downstream readers (csv header re-read,
            # format inference) see the fetched local copy
        if src.endswith(".zip") and os.path.isfile(src):
            # a dump_to_zip package: extract and load its manifest. The
            # extracted copy must outlive the flow (lazy DataFrames keep
            # reading from it), so clean up at interpreter exit rather
            # than in a flow finalizer
            import atexit
            import shutil
            import tempfile
            import zipfile

            tmp = tempfile.mkdtemp(prefix="dfs_zip_")
            atexit.register(shutil.rmtree, tmp, ignore_errors=True)
            with zipfile.ZipFile(src) as zf:
                zf.extractall(tmp)
            self._load_datapackage(ctx, pkg, os.path.join(tmp, "datapackage.json"))
            return
        if os.path.basename(src) == "datapackage.json" or self.format == "datapackage":
            self._load_datapackage(ctx, pkg, src)
            return
        df = self._read(ctx)
        if self.deduplicate_headers:
            # reference naming (load.py:284-302): second 'a' → 'a (2)'.
            # csv: Spark already mangles duplicate headers (a→a0,a1), so
            # recover the raw header line and rename positionally.
            names = df.columns
            fmt = _infer_format(self.source, self.format)
            if fmt == "csv":
                header = ctx.spark.read.text(self.source).limit(1).collect()[0][0]
                names = [h.strip() for h in header.split(",")]
            seen: dict[str, int] = {}
            out = []
            for c in names:
                if c in seen:
                    seen[c] += 1
                    out.append(f"{c} ({seen[c]})")
                else:
                    seen[c] = 1
                    out.append(c)
            df = df.toDF(*out)
        if self.extract_missing_values:
            spec = self.extract_missing_values
            if spec is True:
                spec = {}
            values = spec.get("values") or []
            target = spec.get("target", "missingValues")
            source_fields = spec.get("source") or [
                f.name for f in df.schema.fields if isinstance(f.dataType, StringType)
            ]
            if values:
                pairs = [
                    F.when(F.col(c).isin(values), F.struct(F.lit(c).alias("key"), F.col(c).alias("value")))
                    for c in source_fields
                ]
                df = df.withColumn(
                    target,
                    F.map_from_entries(F.filter(F.array(*pairs), lambda x: x.isNotNull())),
                )
                for c in source_fields:
                    df = df.withColumn(c, F.when(F.col(c).isin(values), None).otherwise(F.col(c)))
        if self.strip:
            for f in df.schema.fields:
                if isinstance(f.dataType, StringType):
                    df = df.withColumn(f.name, F.trim(F.col(f.name)))
        if self.override_fields:
            from .transforms import _cast_with_on_error

            for fname, spec in self.override_fields.items():
                dtype = spec.get("type") if isinstance(spec, dict) else spec
                if fname in df.columns and dtype:
                    df = _cast_with_on_error(df, fname, dtype, self.on_error)
        if self.limit_rows:
            df = df.limit(self.limit_rows)
        rname = self.res_name or os.path.splitext(os.path.basename(self.source.rstrip("/")))[0]
        pkg.add(rname, df, path=self.source)


class sources(Stage):
    """Merge several sub-flows' resources into one package (reference
    ``processors/sources.py:6-32``)."""

    name = "sources"

    def __init__(self, *flows: Any):
        self.flows = flows

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        for fl in self.flows:
            sub = fl if isinstance(fl, Flow) else Flow(fl)
            sub_pkg = sub._run(ctx, TablePackage())
            for name, df in sub_pkg.items():
                # sub-flows number their resources independently; re-number
                # auto-named collisions into the merged package
                out_name, i = name, len(pkg)
                while out_name in pkg:
                    i += 1
                    out_name = f"res_{i}"
                pkg.add(out_name, df, **sub_pkg.resource_meta.get(name, {}))


class unstream(Stage):
    """Re-load a checkpoint/export written by ``stream`` (reference
    ``processors/unstream.py``). Our stream format is parquet, so this
    is a parquet read of the checkpoint dir."""

    name = "unstream"

    def __init__(self, path: str):
        self.path = path

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        import json

        manifest_path = os.path.join(self.path, "_manifest.json")
        with open(manifest_path) as fh:
            manifest = json.load(fh)
        pkg.meta.update(manifest.get("meta", {}))
        for rname in manifest["resources"]:
            df = ctx.spark.read.parquet(os.path.join(self.path, rname))
            pkg.add(rname, df, **manifest.get("resource_meta", {}).get(rname, {}))
