"""Reshape / set ops: concatenate, unpivot, deduplicate, sort_rows,
duplicate, delete_resource.

Parity targets:
- concatenate: reference ``processors/concatenate.py`` (mapping-driven
  union, missing fields null-filled, PK propagation at :58-67)
- unpivot: ``processors/unpivot.py`` (regex melt with capture-group
  substitution at :60-70)
- deduplicate: ``processors/deduplicate.py:6-17`` (keep FIRST row per
  primaryKey, set-based)
- sort_rows: ``processors/sort_rows.py`` — the KVFile external sort and
  its IEEE-754 bit-flip key encoding (:28-43) are replaced wholesale by
  Spark's typed sort-exchange; stability (:55-57) via an explicit
  tiebreaker
- duplicate: ``processors/duplicate.py``
- delete_resource: ``processors/delete_resource.py``
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..core.context import Context
from ..core.flow import Stage
from ..core.package import TablePackage


class concatenate(Stage):
    """Union resources into one target, renaming source→target columns
    via ``fields`` mapping ``{target_col: [source_aliases...]}``;
    unmapped target columns null-fill (reference ``concatenate.py``).
    """

    name = "concatenate"

    def __init__(self, fields: dict[str, list[str] | None], target: dict | None = None, resources: Any = None):
        self.fields = fields
        self.target = target or {}
        self.resources = resources

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        # alias → target mapping (target name maps to itself)
        mapping: dict[str, str] = {}
        for tcol, aliases in self.fields.items():
            mapping[tcol] = tcol
            for a in aliases or []:
                mapping[a] = tcol
        targets = list(self.fields)

        names = pkg.select_names(self.resources)
        parts: list[DataFrame] = []
        for rname in names:
            df = pkg[rname]
            cols: list[Column] = []
            present = {mapping[c]: c for c in df.columns if c in mapping}
            if not present:
                raise ValueError(f"concatenate: resource {rname} maps no fields")
            for t in targets:
                if t in present:
                    cols.append(F.col(present[t]).alias(t))
                else:
                    cols.append(F.lit(None).alias(t))
            parts.append(df.select(*cols))
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p)
        target_name = self.target.get("name", "concat")
        pk = self.target.get("primaryKey")
        for rname in names:
            if rname in pkg and rname != target_name:
                del pkg[rname]
        pkg.add(target_name, merged)
        if pk:
            pkg.resource_meta[target_name]["primaryKey"] = pk


class unpivot(Stage):
    """Melt matched value columns into rows (reference ``unpivot.py``).

    ``unpivot_fields``: list of ``{'name': pattern, 'keys': {extra_key:
    value-or-backref}}``; ``extra_keys``: list of field descriptors
    ``{'name':..., 'type':...}``; ``extra_value``: ``{'name':...,
    'type':...}``. Compiles to a ``stack()`` expression — one pass, no
    shuffle.
    """

    name = "unpivot"

    def __init__(self, unpivot_fields: list[dict], extra_keys: list[dict], extra_value: dict, regex: bool = True, resources: Any = None):
        self.unpivot_fields = unpivot_fields
        self.extra_keys = extra_keys
        self.extra_value = extra_value
        self.regex = regex
        self.resources = resources

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        from .fields import spark_type

        key_names = [k["name"] for k in self.extra_keys]
        val_name = self.extra_value["name"]
        val_type = spark_type(self.extra_value.get("type", "string"))
        key_types = {k["name"]: spark_type(k.get("type", "string")) for k in self.extra_keys}

        def apply(rname, df):
            matched: list[tuple[str, dict[str, str]]] = []  # (column, key values)
            for spec in self.unpivot_fields:
                pat = spec["name"]
                keys_spec = spec.get("keys", {})
                for c in df.columns:
                    if self.regex:
                        m = re.fullmatch(pat, c)
                        if not m:
                            continue
                        kv = {k: (m.expand(v) if isinstance(v, str) else v) for k, v in keys_spec.items()}
                    else:
                        if c != pat:
                            continue
                        kv = dict(keys_spec)
                    matched.append((c, kv))
            if not matched:
                raise ValueError("unpivot matched no columns")
            id_cols = [c for c in df.columns if c not in {m[0] for m in matched}]
            structs = [
                F.struct(
                    *[F.lit(kv.get(k)).cast(key_types[k]).alias(k) for k in key_names],
                    F.col(c).cast(val_type).alias(val_name),
                )
                for c, kv in matched
            ]
            exploded = df.select(*id_cols, F.explode(F.array(*structs)).alias("__m__"))
            return exploded.select(
                *id_cols, *[F.col(f"__m__.{k}").alias(k) for k in key_names], F.col(f"__m__.{val_name}").alias(val_name)
            )

        pkg.apply(apply, self.resources)


class deduplicate(Stage):
    """Keep the FIRST row per primaryKey (reference
    ``deduplicate.py:6-17``). Deterministic-first needs an order: uses
    ``ordering`` columns when given, else scan order. Pass-through when
    the resource has no primaryKey (reference behavior)."""

    name = "deduplicate"

    def __init__(self, resources: Any = None, primary_key: list[str] | None = None, ordering: list[str] | None = None):
        self.resources = resources
        self.primary_key = primary_key
        self.ordering = ordering

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        def apply(rname, df):
            pk = self.primary_key or pkg.resource_meta.get(rname, {}).get("primaryKey")
            if not pk:
                return df
            order = (
                [F.col(c) for c in self.ordering]
                if self.ordering
                else [F.monotonically_increasing_id()]
            )
            w = Window.partitionBy(*pk).orderBy(*order)
            return (
                df.withColumn("__rn__", F.row_number().over(w))
                .filter(F.col("__rn__") == 1)
                .drop("__rn__")
            )

        pkg.apply(apply, self.resources)


class sort_rows(Stage):
    """Sort a resource (reference ``sort_rows.py``). ``key`` is a field
    list, a ``'{a}{b}'`` format string (typed columns are compared
    natively — the reference's IEEE-754 bit trick is unnecessary), or a
    CALLABLE ``row → sortable`` (reference key-function support): the
    callable runs once per row in an Arrow-batched stage to materialize
    a sort-key column (slow path, documented), then Spark sorts on it.
    Stability: appends scan order as the final tiebreaker (reference
    :55-57)."""

    name = "sort_rows"

    def __init__(self, key: Any, resources: Any = None, reverse: bool = False):
        self.key = key
        self.resources = resources
        self.reverse = reverse

    def _callable_key(self, ctx: Context, rname: str, df):
        from .udf import row_mapper

        fn = self.key
        first = df.head()
        if first is None:
            return df
        from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

        probe = fn(first.asDict(recursive=True))
        if isinstance(probe, int) and not isinstance(probe, bool):
            ktype, kdt = "int", LongType()
        elif isinstance(probe, float):
            ktype, kdt = "float", DoubleType()
        else:
            ktype, kdt = "string", StringType()

        def add_key(row, fn=fn, ktype=ktype):
            v = fn(dict(row))
            if ktype == "float" and v is not None:
                v = float(v)
            row["__sortkey__"] = v if ktype != "string" else (None if v is None else str(v))
            return row

        # a fresh StructType — StructType.add would mutate df.schema itself
        schema = StructType(list(df.schema.fields) + [StructField("__sortkey__", kdt)])
        p = TablePackage()
        p.add(rname, df)
        row_mapper(add_key, schema=schema).process(ctx, p)
        out = p[rname].withColumn("__ord__", F.monotonically_increasing_id())
        cols = [F.col("__sortkey__"), F.col("__ord__")]
        if self.reverse:
            cols = [c.desc() for c in cols]
        return out.orderBy(*cols).drop("__sortkey__", "__ord__")

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        if callable(self.key) and not isinstance(self.key, (str, list)):
            pkg.apply(lambda rname, df: self._callable_key(ctx, rname, df), self.resources)
            return
        fields = (
            self.key
            if isinstance(self.key, list)
            else [m.split(":")[0].split("!")[0] for m in re.findall(r"\{(.*?)\}", self.key)]
        )

        def apply(rname, df):
            df = df.withColumn("__ord__", F.monotonically_increasing_id())
            cols = [F.col(c) for c in fields] + [F.col("__ord__")]
            if self.reverse:
                cols = [c.desc() for c in cols]
            return df.orderBy(*cols).drop("__ord__")

        pkg.apply(apply, self.resources)


class duplicate(Stage):
    """Copy a resource under a new name (reference ``duplicate.py``).
    The KVFile buffering disappears: Catalyst reuses the scan, and
    ``cache=True`` pins it when recompute matters."""

    name = "duplicate"

    def __init__(self, source: str | None = None, target_name: str | None = None, cache: bool = False, **_: Any):
        self.source = source
        self.target_name = target_name
        self.cache = cache

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        src = self.source or pkg.names[0]
        df = pkg[src]
        if self.cache:
            df = df.cache()
            pkg[src] = df
        pkg.add(self.target_name or f"{src}_copy", df)


class delete_resource(Stage):
    """Remove resources from the package (reference
    ``delete_resource.py``)."""

    name = "delete_resource"

    def __init__(self, resources: Any):
        self.resources = resources

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        for rname in pkg.select_names(self.resources):
            del pkg[rname]
