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
}


def _infer_format(source: str, explicit: str | None) -> str:
    if explicit:
        return explicit
    root, ext = os.path.splitext(source.rstrip("/"))
    return _EXT_FORMAT.get(ext.lower(), "parquet")


class load(Stage):
    """Load a table as a new resource.

    ``source`` is a path (csv/json/parquet/orc by extension), a
    ``table://name`` catalog reference, or a ``jdbc://`` URL with
    ``query=``/``dbtable=`` options. ``env://VAR`` resolves the source
    from an environment variable (reference load.py env:// support).
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
        **options: Any,
    ):
        self.source = source
        self.res_name = name
        self.format = format
        self.schema = schema or override_schema
        self.strip = strip
        self.limit_rows = limit_rows
        self.deduplicate_headers = deduplicate_headers
        self.extract_missing_values = extract_missing_values
        # reference infer strategies (load.py:183-204): 'full' parses
        # string sources into types, 'strings' keeps everything string
        self.infer_strategy = infer_strategy
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

    def process(self, ctx: Context, pkg: TablePackage) -> None:
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
