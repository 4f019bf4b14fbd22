"""Column operators: add_field, add_computed_field, select_fields,
delete_fields, rename_fields.

Parity targets in the reference:
- add_field: ``dataflows/processors/add_field.py:4-17``
- add_computed_field: ``dataflows/processors/add_computed_field.py``
  (op table at :8-19, row loop at :37-53)
- select_fields: ``dataflows/processors/select_fields.py:18-55``
- delete_fields: ``dataflows/processors/delete_fields.py:15-51``
- rename_fields: ``dataflows/processors/rename_fields.py:14-61``

All horizontal math compiles to JVM-side Catalyst expressions (no
Python in the hot path); only a user-supplied callable falls back to
the Arrow UDF shim.
"""

from __future__ import annotations

import re
from functools import reduce
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core.context import Context
from ..core.flow import Stage
from ..core.package import TablePackage

# Frictionless Table Schema type → Spark SQL type (SURVEY.md §1.3)
TABLE_SCHEMA_TYPES: dict[str, str] = {
    "string": "string",
    "integer": "bigint",
    "number": "double",
    "decimal": "decimal(38,18)",
    "boolean": "boolean",
    "array": "array<string>",
    "object": "map<string,string>",
    "date": "date",
    "datetime": "timestamp",
    "time": "string",
    "duration": "interval day to second",
    "year": "int",
    "yearmonth": "struct<year:int,month:int>",
    "geopoint": "array<double>",
    "geojson": "string",
    "binary": "binary",
    "any": "string",
}


def spark_type(t: str) -> str:
    return TABLE_SCHEMA_TYPES.get(t, t)


class add_field(Stage):
    """Append a typed column with a constant or callable default
    (reference ``add_field.py:4-17``)."""

    name = "add_field"

    def __init__(self, name: str, type: str = "any", default: Any = None, resources: Any = None, **options: Any):
        self.field = name
        self.type = type
        self.default = default
        self.resources = resources

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        t = spark_type(self.type)

        def apply(name, df):
            if callable(self.default):
                from .udf import row_mapper  # slow path, documented

                fn = self.default
                tmp = df.withColumn(self.field, F.lit(None).cast(t))
                shim = row_mapper(lambda row: {**row, self.field: fn(row)})
                p = TablePackage()
                p.add(name, tmp)
                shim.process(ctx, p)
                return p[name]
            return df.withColumn(self.field, F.lit(self.default).cast(t))

        pkg.apply(apply, self.resources)


def _computed_column(op: str, spec: dict, df: DataFrame) -> Column:
    """The reference's op table (``add_computed_field.py:8-19``):
    sum/avg/max/min/multiply over source columns, constant, join
    (delimiter concat), format (str.format over the row)."""
    src = [F.col(c) for c in spec.get("source", [])]
    if op == "sum":
        return reduce(lambda a, b: a + b, src)
    if op == "avg":
        return reduce(lambda a, b: a + b, src) / F.lit(len(src))
    if op == "max":
        return F.greatest(*src) if len(src) > 1 else src[0]
    if op == "min":
        return F.least(*src) if len(src) > 1 else src[0]
    if op == "multiply":
        return reduce(lambda a, b: a * b, src)
    if op == "constant":
        return F.lit(spec.get("with"))
    if op == "join":
        delim = spec.get("with", "-")
        return F.concat_ws(delim, *[c.cast("string") for c in src])
    if op == "expr":
        # engine extension: arbitrary SQL expression (JVM-side; the
        # reference routes this through a Python row callable instead)
        return F.expr(spec.get("with", ""))
    if op == "format":
        # Python "{field}" format string → format_string with positional args
        template = spec.get("with", "")
        fields = re.findall(r"{([A-Za-z_][A-Za-z0-9_]*)(?:![rs])?(?::[^}]*)?}", template)
        fmt = re.sub(r"{[A-Za-z_][A-Za-z0-9_]*(?:![rs])?(?::[^}]*)?}", "%s", template)
        fmt = fmt.replace("{{", "{").replace("}}", "}")
        return F.format_string(fmt, *[F.col(f).cast("string") for f in fields])
    raise ValueError(f"unknown computed-field operation: {op}")


class add_computed_field(Stage):
    """Add column(s) from horizontal row-level ops (reference
    ``add_computed_field.py``). Accepts either the modern kwargs form
    ``add_computed_field(target=..., operation=..., source=[...])`` or a
    list of spec dicts."""

    name = "add_computed_field"

    def __init__(self, *specs: Any, resources: Any = None, **kw: Any):
        if kw:
            specs = specs + (kw,)
        flat: list[dict] = []
        for s in specs:
            if isinstance(s, dict):
                flat.append(s)
            elif isinstance(s, (list, tuple)):
                flat.extend(s)
            else:
                raise TypeError(f"bad spec: {s!r}")
        self.specs = flat
        self.resources = resources

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        def apply(name, df):
            for spec in self.specs:
                target = spec["target"]
                op = spec.get("operation")
                if callable(op):
                    from .udf import row_mapper

                    fn = op
                    tmp = df.withColumn(target, F.lit(None).cast("string"))
                    shim = row_mapper(lambda row: {**row, target: fn(row)})
                    p = TablePackage()
                    p.add(name, tmp)
                    shim.process(ctx, p)
                    df = p[name]
                else:
                    df = df.withColumn(target, _computed_column(op, spec, df))
            return df

        pkg.apply(apply, self.resources)


def _resolve_fields(patterns: list[str], columns: list[str], regex: bool) -> list[str]:
    """Expand (optionally regex) field patterns against actual columns,
    preserving the pattern order (reference ``select_fields.py:26-38``)."""
    out: list[str] = []
    for pat in patterns:
        if regex:
            rx = re.compile(f"^(?:{pat})$")
            matched = [c for c in columns if rx.match(c)]
        else:
            matched = [c for c in columns if c == pat]
        for m in matched:
            if m not in out:
                out.append(m)
    return out


class select_fields(Stage):
    """Keep only named/regex columns, reordered to match the list
    (reference ``select_fields.py:18-55``). Column pruning then reaches
    the parquet scan via Catalyst."""

    name = "select_fields"

    def __init__(self, fields: list[str], resources: Any = None, regex: bool = True):
        self.fields = fields
        self.resources = resources
        self.regex = regex

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        def apply(name, df):
            cols = _resolve_fields(self.fields, df.columns, self.regex)
            if not cols:
                raise ValueError(f"select_fields matched no columns in {df.columns}")
            return df.select(*cols)

        pkg.apply(apply, self.resources)


class delete_fields(Stage):
    """Drop named/regex columns (reference ``delete_fields.py:15-51``)."""

    name = "delete_fields"

    def __init__(self, fields: list[str], resources: Any = None, regex: bool = True):
        self.fields = fields
        self.resources = resources
        self.regex = regex

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        def apply(name, df):
            cols = _resolve_fields(self.fields, df.columns, self.regex)
            return df.drop(*cols)

        pkg.apply(apply, self.resources)


class rename_fields(Stage):
    """Rename via regex with backreferences (reference
    ``rename_fields.py:14-61``), expanded at build time into a plain
    ``withColumnsRenamed``."""

    name = "rename_fields"

    def __init__(self, fields: dict[str, str], resources: Any = None, regex: bool = True):
        self.fields = fields
        self.resources = resources
        self.regex = regex

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        def apply(name, df):
            mapping: dict[str, str] = {}
            for pat, repl in self.fields.items():
                if self.regex:
                    rx = re.compile(f"^(?:{pat})$")
                    for c in df.columns:
                        m = rx.match(c)
                        if m:
                            mapping[c] = m.expand(repl)
                elif pat in df.columns:
                    mapping[pat] = repl
            return df.withColumnsRenamed(mapping) if mapping else df

        pkg.apply(apply, self.resources)
