"""Flow — the pipeline DSL.

Reimplements the *semantics* of the reference's ``Flow`` chain
(reference ``dataflows/base/flow.py:8-55``) Spark-first:

- a Flow is an ordered list of **stages**; each stage is a function
  ``(ctx, TablePackage) -> TablePackage | None`` (mutating in place and
  returning None is fine).
- building the chain is pure Python; *executing* it only constructs
  Catalyst logical plans. Nothing runs until a terminal action
  (``results`` / ``process`` / a dump stage's write) — the exact analog
  of the reference's lazy generator chain
  (``dataflows/base/datastream_processor.py:60-72``).
- chain preprocessing gives ``checkpoint`` stages the chance to rewrite
  the upstream chain (reference ``flow.py:21-28`` +
  ``processors/checkpoint.py:45-47``).
- bare functions are auto-wrapped by their first parameter name
  (``row`` / ``rows`` / ``package``), mirroring reference
  ``flow.py:38-51``; DataFrames and plain iterables become resources
  (reference ``helpers/iterable_loader.py``).

Unlike the reference (single pipe, multiple resources through it), every
resource is its own DataFrame; multi-resource stages are functions over
the TablePackage.
"""

from __future__ import annotations

import inspect
import itertools
from typing import Any, Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

from .context import Context
from .errors import ProcessorError
from .package import TablePackage

_anon_counter = itertools.count(1)


class Stage:
    """Base class for named pipeline stages.

    Subclasses implement ``process(ctx, pkg)``. ``rewrite_chain`` lets a
    stage replace everything upstream of itself (checkpoint semantics).
    """

    name = "stage"

    def process(self, ctx: Context, pkg: TablePackage) -> TablePackage | None:
        raise NotImplementedError

    def rewrite_chain(self, ctx: Context, upstream: list["Stage"]) -> list["Stage"] | None:
        """Return a replacement for ``upstream + [self]``, or None."""
        return None

    def __call__(self, ctx: Context, pkg: TablePackage) -> TablePackage | None:
        return self.process(ctx, pkg)


class FuncStage(Stage):
    def __init__(self, fn: Callable, name: str | None = None):
        self.fn = fn
        self.name = name or getattr(fn, "__name__", None) or f"func_{next(_anon_counter)}"

    def process(self, ctx: Context, pkg: TablePackage) -> TablePackage | None:
        # support (ctx, pkg), (pkg), and () signatures
        try:
            sig = inspect.signature(self.fn)
            nparams = len(sig.parameters)
        except (TypeError, ValueError):
            nparams = 2
        if nparams >= 2:
            return self.fn(ctx, pkg)
        if nparams == 1:
            return self.fn(pkg)
        self.fn()
        return None


class DataFrameStage(Stage):
    """A literal DataFrame appended as a new resource. Unnamed resources
    get positional names ``res_1, res_2, ...`` in package order, like
    the reference's auto-named resources."""

    def __init__(self, df: DataFrame, name: str | None = None):
        self.df = df
        self.name = name

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        pkg.add(self.name or f"res_{len(pkg) + 1}", self.df)


class IterableStage(Stage):
    """Reference ``iterable_loader``: wrap an in-memory iterable of dicts
    as a resource, inferring schema from a sample (reference
    ``helpers/iterable_loader.py:55-72``; sampling is delegated to
    ``spark.createDataFrame``'s inference)."""

    def __init__(self, iterable: Iterable, name: str | None = None, schema=None):
        self.iterable = iterable
        self.schema = schema
        self.name = name

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        rows = list(self.iterable)
        if self.schema is not None:
            df = ctx.spark.createDataFrame(rows, schema=self.schema)
        else:
            df = ctx.spark.createDataFrame(rows)
        # single partition: in-memory literals keep list order, matching
        # the reference's stream-order semantics for small fixtures
        pkg.add(self.name or f"res_{len(pkg) + 1}", df.coalesce(1))


def _wrap_bare_function(fn: Callable) -> Stage:
    """Dispatch a bare function by its first parameter name, mirroring
    reference ``flow.py:38-51``: ``row`` → per-row mapper (vectorized via
    mapInPandas), ``rows`` → table transform, ``package`` → package
    transform; anything else is treated as a (ctx, pkg) stage function.
    """
    try:
        params = list(inspect.signature(fn).parameters)
    except (TypeError, ValueError):
        params = []
    first = params[0] if params else ""
    if first == "row":
        from ..operators.udf import row_mapper

        return row_mapper(fn)
    if first == "rows":
        from ..operators.udf import rows_transform

        return rows_transform(fn)
    if first == "package":
        return FuncStage(lambda ctx, pkg: fn(pkg), name=getattr(fn, "__name__", "package_fn"))
    return FuncStage(fn)


def _to_stage(link: Any) -> Stage:
    if isinstance(link, Stage):
        return link
    if isinstance(link, Flow):
        return _SubFlowStage(link)
    if isinstance(link, DataFrame):
        return DataFrameStage(link)
    if callable(link):
        return _wrap_bare_function(link)
    if hasattr(link, "__iter__"):
        return IterableStage(link)
    raise TypeError(f"cannot interpret flow link: {link!r}")


class _SubFlowStage(Stage):
    name = "subflow"

    def __init__(self, flow: "Flow"):
        self.flow = flow

    def process(self, ctx: Context, pkg: TablePackage) -> TablePackage:
        return self.flow._run(ctx, pkg)


class Flow:
    """Composable pipeline over named DataFrames.

    Terminal actions (each builds the full Catalyst plan, then acts):

    - ``results(spark)`` → ``(list-of-row-dicts per resource, meta, stats)``
      — reference ``Flow.results`` (``flow.py:12-13``).
    - ``process(spark)`` → execute side effects (writes) without
      collecting — reference ``Flow.process`` (``flow.py:15-16``).
    - ``dataframes(spark)`` → the lazy ``TablePackage`` (no action) —
      reference ``Flow.datastream`` (``flow.py:18-19``).
    """

    def __init__(self, *chain: Any):
        self.chain: list[Any] = list(chain)

    def step(self, *links: Any) -> "Flow":
        self.chain.extend(links)
        return self

    # -- build ----------------------------------------------------------
    def _stages(self, ctx: Context) -> list[Stage]:
        stages = [_to_stage(link) for link in self.chain if link is not None]
        # checkpoint chain-rewrite pass (reference flow.py:21-28)
        i = 0
        while i < len(stages):
            replacement = stages[i].rewrite_chain(ctx, stages[:i])
            if replacement is not None:
                stages = replacement + stages[i + 1 :]
                i = len(replacement)
            else:
                i += 1
        return stages

    def _run(self, ctx: Context, pkg: TablePackage | None = None) -> TablePackage:
        pkg = pkg if pkg is not None else TablePackage()
        for pos, stage in enumerate(self._stages(ctx), start=1):
            try:
                out = stage(ctx, pkg)
            except ProcessorError:
                raise
            except Exception as exc:  # noqa: BLE001 — wrap with position info
                raise ProcessorError(
                    exc, processor_name=stage.name, processor_position=pos
                ) from exc
            if out is not None:
                pkg = out
        return pkg

    # -- terminal actions -------------------------------------------------
    def dataframes(self, spark: SparkSession, **conf: Any) -> TablePackage:
        return self._run(Context(spark, **conf))

    def results(self, spark: SparkSession, **conf: Any):
        ctx = Context(spark, **conf)
        pkg = self._run(ctx)
        try:
            results = [
                [row.asDict(recursive=True) for row in df.collect()]
                for _, df in pkg.items()
            ]
        except Exception as exc:  # noqa: BLE001 — lazy stage errors surface here
            raise ProcessorError(exc, processor_name="<action>", processor_position=len(self.chain)) from exc
        ctx.run_finalizers(pkg)
        return results, {"meta": pkg.meta, "resources": pkg.resource_meta}, pkg.stats

    def process(self, spark: SparkSession, **conf: Any):
        ctx = Context(spark, **conf)
        pkg = self._run(ctx)
        # drain resources that were not consumed by a sink stage
        for name, df in pkg.items():
            if not pkg.resource_meta.get(name, {}).get("_written"):
                n = df.count()
                pkg.stats.setdefault("row_count", {})[name] = n
        ctx.run_finalizers(pkg)
        return {"meta": pkg.meta, "resources": pkg.resource_meta}, pkg.stats
