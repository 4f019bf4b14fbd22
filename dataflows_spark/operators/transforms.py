"""Per-row transforms & predicates: find_replace, set_type, validate,
filter_rows.

Parity targets in the reference:
- find_replace: ``dataflows/processors/find_replace.py:17-28`` (regex
  substitute inside string fields; coerces via str() at :10-13)
- set_type: ``dataflows/processors/set_type.py:9-72`` with the error
  handlers of ``dataflows/base/schema_validator.py:23-50``
  (raise / drop row / ignore / clear field)
- validate: ``dataflows/processors/validate.py:8-61``
- filter_rows: ``dataflows/processors/filter_rows.py:24-38``

Everything compiles to Catalyst expressions (``regexp_replace``,
``try_cast``, boolean predicates) so filters push down to the scan and
casts run inside whole-stage codegen. Only user callables take the
Arrow UDF shim.
"""

from __future__ import annotations

import re
from functools import reduce
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..core.context import Context
from ..core.flow import Stage
from ..core.package import TablePackage
from .fields import _resolve_fields, spark_type

# error-mode names mirroring dataflows.base.schema_validator
RAISE = "raise"
DROP = "drop"
IGNORE = "ignore"
CLEAR = "clear"


class find_replace(Stage):
    """Regex substitution inside string fields. ``fields`` is a list of
    ``{'name': field, 'patterns': [{'find': rx, 'replace': s}, ...]}``
    (reference ``find_replace.py``). This is the transcript-normalization
    primitive of the audio tier."""

    name = "find_replace"

    def __init__(self, fields: list[dict], resources: Any = None):
        self.fields = fields
        self.resources = resources

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        def apply(name, df):
            for spec in self.fields:
                col = spec["name"]
                expr = F.col(col).cast("string")  # reference coerces via str()
                for pat in spec.get("patterns", []):
                    expr = F.regexp_replace(expr, pat["find"], pat["replace"])
                df = df.withColumn(col, expr)
            return df

        pkg.apply(apply, self.resources)


# strptime directive → Spark datetime pattern (reference temporal formats:
# tableschema field format '%d/%m/%Y' etc., tests/test_lib.py:2025)
_STRPTIME_TO_SPARK = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%I": "hh",
    "%M": "mm",
    "%S": "ss",
    "%f": "SSSSSS",
    "%b": "MMM",
    "%B": "MMMM",
    "%j": "DDD",
    "%p": "a",
    "%z": "XX",
    "%%": "%",
}


def strptime_to_spark(fmt: str) -> str:
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            d = fmt[i : i + 2]
            out.append(_STRPTIME_TO_SPARK.get(d, d))
            i += 2
        else:
            # literal chars that are pattern letters in Spark need quoting
            c = fmt[i]
            out.append(f"'{c}'" if c.isalpha() else c)
            i += 1
    return "".join(out)


_ISO_DURATION_RX = r"^P(?:(\d+)D)?(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?$"


def _temporal_cast(col: str, dtype: str, fmt: str | None):
    """Parse expression for date/datetime with an optional reference-style
    strptime format, plus the structured Table Schema types the plain
    cast can't express: ISO-8601 ``duration`` (reference parses via
    isodate, ``helpers/extended_json.py:68-72``), ``yearmonth``
    ('YYYY-MM' → struct), ``geopoint`` ('lon,lat' → array<double>)."""
    c = F.col(col)
    if dtype == "duration":
        s = F.trim(c.cast("string"))
        part = lambda i: F.coalesce(F.regexp_extract(s, _ISO_DURATION_RX, i).try_cast("double"), F.lit(0.0))  # noqa: E731
        return F.when(
            s.rlike(_ISO_DURATION_RX) & (F.length(s) > 1),
            F.make_dt_interval(part(1).cast("int"), part(2).cast("int"), part(3).cast("int"), part(4)),
        )
    if dtype == "yearmonth":
        s = F.trim(c.cast("string"))
        return F.when(
            s.rlike(r"^\d{4}-\d{1,2}$"),
            F.struct(
                F.split(s, "-")[0].try_cast("int").alias("year"),
                F.split(s, "-")[1].try_cast("int").alias("month"),
            ),
        )
    if dtype == "geopoint":
        s = F.trim(c.cast("string"))
        arr = F.transform(F.split(s, r",\s*"), lambda x: x.try_cast("double"))
        return F.when(
            (F.size(arr) == 2) & ~F.exists(arr, lambda x: x.isNull()), arr
        )
    if fmt in (None, "any", "default"):
        return None
    spark_fmt = strptime_to_spark(fmt)
    # try_* variants: null on parse failure (ANSI mode is Spark 4's
    # default, where the plain functions would throw)
    if dtype == "date":
        return F.try_to_timestamp(c.cast("string"), F.lit(spark_fmt)).try_cast("date")
    if dtype == "datetime":
        return F.try_to_timestamp(c.cast("string"), F.lit(spark_fmt))
    return None


def _cast_with_on_error(df, col: str, dtype: str, on_error: str | None, parse_expr=None):
    """Cast a column with reference error semantics
    (``schema_validator.py:23-50``). ``parse_expr`` overrides the
    try_cast (temporal formats — returns null on parse failure, same
    failure contract)."""
    on_error = on_error or RAISE
    target = spark_type(dtype)
    casted = parse_expr if parse_expr is not None else F.col(col).try_cast(target)
    if on_error == DROP:
        # drop rows whose non-null value fails the cast
        bad = F.col(col).isNotNull() & casted.isNull()
        return df.filter(~bad).withColumn(col, casted)
    if on_error == CLEAR:
        return df.withColumn(col, casted)
    if on_error == IGNORE:
        # TRUE mixed-type passthrough (reference schema_validator keeps
        # the uncast value in place): a static StructType can't hold
        # per-row mixed types, but Spark 4's VARIANT can — rows that
        # cast hold the TYPED value (number/bool), failures hold the
        # original string. Collectors see VariantVal; `.toPython()`
        # yields int/float/bool/str per row, matching the reference's
        # mixed-list output.
        def as_variant(c):
            # string → variant via Spark's OWN JSON escaping (to_json
            # on a struct): hand-rolled regex escaping silently
            # corrupted quotes and nulled control characters (round-3
            # review finding #1); variant_get unwraps the field back
            # out as a variant scalar, null-safe
            return F.variant_get(
                F.try_parse_json(F.to_json(F.struct(c.alias("x")))), "$.x", "variant"
            )

        bare_json_ok = dtype in ("number", "integer", "boolean")
        # number/integer/boolean stringify to bare JSON scalars, so
        # try_parse_json keeps them TYPED in the variant. Non-finite
        # doubles are the exception: 'Infinity'/'NaN' cast successfully
        # to double but stringify to invalid bare JSON, so the parse
        # yields null — fall back to the struct-wrapped string variant
        # (the original value, kept in place — round-3 advisor: the
        # pre-fix code silently LOST the value, worse than a failed
        # cast, which preserved the string)
        ok_variant = (
            F.coalesce(
                F.try_parse_json(casted.cast("string")),
                as_variant(F.col(col).cast("string")),
            )
            if bare_json_ok
            else as_variant(casted.cast("string"))
        )
        return df.withColumn(
            col,
            F.when(casted.isNotNull(), ok_variant).otherwise(
                as_variant(F.col(col).cast("string"))
            ),
        )
    # RAISE: failures surface at action time via assert_true
    guard = F.assert_true(
        F.col(col).isNull() | casted.isNotNull(),
        F.concat(F.lit(f"set_type({col}→{dtype}) failed for value: "), F.col(col).cast("string")),
    )
    return df.withColumn(col, F.when(guard.isNull(), casted))


class set_type(Stage):
    """Change a (regex-matched) field's type, optionally transforming
    first, casting with an ``on_error`` policy (reference
    ``set_type.py:9-72``)."""

    name = "set_type"

    def __init__(
        self,
        name: str,
        resources: Any = -1,
        regex: bool = True,
        on_error: str | None = None,
        transform: Callable | None = None,
        type: str = "string",
        **options: Any,
    ):
        self.pattern = name
        self.resources = None if resources == -1 else resources
        self.regex = regex
        self.on_error = on_error
        self.transform = transform
        self.type = type
        self.format = options.get("format")

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        def apply(rname, df):
            cols = _resolve_fields([self.pattern], df.columns, self.regex)
            if not cols:
                raise ValueError(f"set_type: no column matches {self.pattern!r}")
            for c in cols:
                if self.transform is not None:
                    from .udf import row_mapper

                    fn, cc = self.transform, c
                    import inspect

                    nparams = len(inspect.signature(fn).parameters)

                    def txrow(row, fn=fn, cc=cc, nparams=nparams):
                        if nparams >= 3:
                            v = fn(row[cc], cc, row)
                        elif nparams == 2:
                            v = fn(row[cc], cc)
                        else:
                            v = fn(row[cc])
                        # the pre-cast column is string-typed; the cast to
                        # the target type happens right after (reference
                        # set_type.py: transform then cast)
                        row[cc] = None if v is None else str(v)
                        return row

                    p = TablePackage()
                    p.add(rname, df.withColumn(c, F.col(c).cast("string")))
                    row_mapper(txrow).process(ctx, p)
                    df = p[rname]
                parse = _temporal_cast(c, self.type, self.format)
                df = _cast_with_on_error(df, c, self.type, self.on_error, parse_expr=parse)
            return df

        pkg.apply(apply, self.resources)


class validate(Stage):
    """Row validation (reference ``validate.py:8-61``): with NO args,
    re-cast every field against the declared schema — the package's
    ``schema_props['fields']`` type map (set by ``update_schema``), the
    reference's ``schema_validator`` pass (``base/schema_validator.py:
    23-50``) re-expressed as try_casts + an error-policy split. With a
    callable, keep rows satisfying it; with ``(field, validator)``, keep
    rows whose field passes. ``on_error='drop'`` drops failures (default
    raises); ``on_error='quarantine'`` routes failing ORIGINAL rows to a
    side resource ``<name>__invalid`` (SURVEY §2.3)."""

    name = "validate"

    QUARANTINE = "quarantine"

    def __init__(self, *args: Any, resources: Any = None, on_error: str | None = None):
        self.args = args
        self.resources = resources
        self.on_error = on_error or RAISE

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        def apply(name, df):
            pred: Column | None = None
            if len(self.args) == 0:
                return self._recast(name, df, pkg)
            if len(self.args) == 1 and callable(self.args[0]):
                fn = self.args[0]
                from .udf import rows_transform

                keep = lambda rows: (r for r in rows if fn(r))  # noqa: E731
                p = TablePackage()
                p.add(name, df)
                rows_transform(keep).process(ctx, p)
                return p[name]
            if len(self.args) == 2:
                field, validator = self.args
                if callable(validator):
                    from .udf import rows_transform

                    keep = lambda rows: (r for r in rows if validator(r[field]))  # noqa: E731
                    p = TablePackage()
                    p.add(name, df)
                    rows_transform(keep).process(ctx, p)
                    return p[name]
                pred = validator  # a Column predicate
            if pred is not None:
                if self.on_error == DROP:
                    return df.filter(pred)
                if self.on_error == self.QUARANTINE:
                    pkg.add(f"{name}__invalid", df.filter(~pred | pred.isNull()))
                    return df.filter(pred)
                # RAISE: the guard must live inside RETAINED output columns
                # — a guard in an immediately-dropped column is eliminated
                # by Catalyst column pruning and the validation silently
                # never runs (round-1 advisor finding). assert_true yields
                # NULL when the predicate holds, so when(guard.isNull(), c)
                # is an identity projection that cannot be pruned.
                guard = F.assert_true(
                    pred.isNotNull() & pred, F.lit(f"validate failed: {self.args}")
                )
                return df.select(
                    *[F.when(guard.isNull(), F.col(c)).alias(c) for c in df.columns]
                )
            return df

        pkg.apply(apply, self.resources)

    def _recast(self, name: str, df, pkg: TablePackage):
        """No-args mode: try_cast every declared field to its schema
        type; rows whose non-null values fail any cast follow the
        ``on_error`` policy. Fields without a declaration pass through."""
        props = pkg.resource_meta.get(name, {}).get("schema_props") or {}
        fields = [
            f for f in (props.get("fields") or [])
            if isinstance(f, dict) and f.get("name") in df.columns
        ]
        if not fields:
            return df  # nothing declared → structurally enforced already
        casted = {
            f["name"]: (
                _temporal_cast(f["name"], f.get("type", "string"), f.get("format"))
                if f.get("type") in ("date", "datetime", "duration", "yearmonth", "geopoint")
                else None
            )
            for f in fields
        }
        exprs = {}
        bads = []
        for f in fields:
            col, dtype = f["name"], f.get("type", "string")
            c = casted[col] if casted[col] is not None else F.col(col).try_cast(spark_type(dtype))
            exprs[col] = c
            bads.append(F.col(col).isNotNull() & c.isNull())
        bad = reduce(lambda a, b: a | b, bads)
        out_exprs = [(exprs.get(c, F.col(c)), c) for c in df.columns]
        if self.on_error == DROP:
            return df.filter(~bad).select(*[e.alias(n) for e, n in out_exprs])
        if self.on_error == self.QUARANTINE:
            pkg.add(f"{name}__invalid", df.filter(bad))
            return df.filter(~bad).select(*[e.alias(n) for e, n in out_exprs])
        # RAISE: guard embedded in every retained column (prune-proof)
        guard = F.assert_true(~bad, F.lit(f"validate: schema recast failed for {name}"))
        return df.select(*[F.when(guard.isNull(), e).alias(n) for e, n in out_exprs])


def _equality_predicate(equals, not_equals) -> Column | None:
    """Legacy OR-of-equality dicts (reference ``filter_rows.py:4-15``):
    keep row if ANY equals-dict fully matches, or ANY not_equals-dict
    fully differs."""
    terms: list[Column] = []
    for d in equals or ():
        conj = reduce(lambda a, b: a & b, [F.col(k).eqNullSafe(F.lit(v)) for k, v in d.items()])
        terms.append(conj)
    for d in not_equals or ():
        conj = reduce(lambda a, b: a & b, [~F.col(k).eqNullSafe(F.lit(v)) for k, v in d.items()])
        terms.append(conj)
    if not terms:
        return None
    return reduce(lambda a, b: a | b, terms)


class filter_rows(Stage):
    """Keep rows matching a condition (reference
    ``filter_rows.py:24-38``). ``condition`` may be a Spark Column, a
    SQL string, or a Python callable over a row-dict (slow path)."""

    name = "filter_rows"

    def __init__(
        self,
        condition: Any = None,
        equals: Any = tuple(),
        not_equals: Any = tuple(),
        resources: Any = None,
    ):
        self.condition = condition
        self.equals = equals
        self.not_equals = not_equals
        self.resources = resources

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        def apply(name, df):
            if self.condition is not None:
                if isinstance(self.condition, Column):
                    return df.filter(self.condition)
                if isinstance(self.condition, str):
                    return df.filter(F.expr(self.condition))
                fn = self.condition
                from .udf import rows_transform

                keep = lambda rows: (r for r in rows if fn(r))  # noqa: E731
                p = TablePackage()
                p.add(name, df)
                rows_transform(keep).process(ctx, p)
                return p[name]
            pred = _equality_predicate(self.equals, self.not_equals)
            return df.filter(pred) if pred is not None else df

        pkg.apply(apply, self.resources)
