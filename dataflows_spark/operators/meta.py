"""Package/metadata & flow-control stages.

Parity targets (all small, reference ``dataflows/processors/``):
update_package.py, update_resource.py, update_schema.py,
set_primary_key.py, update_stats.py, printer.py, conditional.py,
finalizer.py, parallelize.py.
"""

from __future__ import annotations

from typing import Any, Callable

from ..core.context import Context
from ..core.flow import Flow, Stage
from ..core.package import TablePackage


class update_package(Stage):
    """Merge metadata into the package descriptor (reference
    ``update_package.py:4-18``)."""

    name = "update_package"

    def __init__(self, **metadata: Any):
        self.metadata = metadata

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        pkg.meta.update(self.metadata)


add_metadata = update_package  # reference alias


class update_resource(Stage):
    """Merge props into resource descriptors; ``name=`` renames
    (reference ``update_resource.py:5-21``)."""

    name = "update_resource"

    def __init__(self, resources: Any, **props: Any):
        self.resources = resources
        self.props = props

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        for rname in pkg.select_names(self.resources):
            new_name = self.props.get("name")
            pkg.resource_meta[rname].update({k: v for k, v in self.props.items() if k != "name"})
            if new_name and new_name != rname:
                pkg.rename(rname, new_name)


class update_schema(Stage):
    """Merge props into the resource schema descriptor (reference
    ``update_schema.py:5-21``). Spark schemas are structural; props like
    ``missingValues``/``primaryKey`` live in resource_meta."""

    name = "update_schema"

    def __init__(self, resources: Any, **props: Any):
        self.resources = resources
        self.props = props

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        for rname in pkg.select_names(self.resources):
            pkg.resource_meta[rname].setdefault("schema_props", {}).update(self.props)
            if "primaryKey" in self.props:
                pkg.resource_meta[rname]["primaryKey"] = self.props["primaryKey"]


class set_primary_key(Stage):
    """Set/clear the primaryKey list (reference
    ``set_primary_key.py:5-24``); feeds deduplicate and keyed sinks."""

    name = "set_primary_key"

    def __init__(self, primary_key: list[str] | None, resources: Any = None):
        self.primary_key = primary_key
        self.resources = resources

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        for rname in pkg.select_names(self.resources):
            pkg.resource_meta[rname]["primaryKey"] = self.primary_key or []


class update_stats(Stage):
    """Inject a dict into the stats chain (reference
    ``update_stats.py:4-7``)."""

    name = "update_stats"

    def __init__(self, stats: dict[str, Any]):
        self.stats = stats

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        pkg.stats.update(self.stats)


class printer(Stage):
    """Show sample rows while passing resources through (reference
    ``printer.py:38-88``): first ``num_rows``, an ellipsis row, the
    final ``last_rows``, cells truncated to ``max_cell_size``, rendered
    with ``tablefmt`` ('plain' | 'simple' | 'grid'). ``header_print``
    receives the resource title line."""

    name = "printer"

    def __init__(
        self,
        num_rows: int = 10,
        last_rows: int | None = None,
        fields: list[str] | None = None,
        resources: Any = None,
        max_cell_size: int = 100,
        tablefmt: str = "simple",
        header_print: Any = None,
        **_: Any,
    ):
        self.num_rows = num_rows
        self.last_rows = last_rows
        self.fields = fields
        self.resources = resources
        self.max_cell_size = max_cell_size
        self.tablefmt = tablefmt
        self.header_print = header_print or (lambda title: print(f"{title}:"))

    def _cell(self, v: Any) -> str:
        s = "" if v is None else str(v)
        if len(s) > self.max_cell_size:
            s = s[: self.max_cell_size - 3] + "..."
        return s

    def _render(self, header: list[str], rows: list[list[str]]) -> str:
        widths = [max(len(h), *(len(r[i]) for r in rows)) if rows else len(h) for i, h in enumerate(header)]

        def line(cells, sep="  "):
            return sep.join(c.ljust(w) for c, w in zip(cells, widths)).rstrip()

        if self.tablefmt == "grid":
            bar = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
            out = [bar, "| " + " | ".join(h.ljust(w) for h, w in zip(header, widths)) + " |", bar]
            for r in rows:
                out.append("| " + " | ".join(c.ljust(w) for c, w in zip(r, widths)) + " |")
            out.append(bar)
            return "\n".join(out)
        out = [line(header)]
        if self.tablefmt == "simple":
            out.append(line(["-" * w for w in widths]))
        out.extend(line(r) for r in rows)
        return "\n".join(out)

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        for rname in pkg.select_names(self.resources):
            df = pkg[rname]
            if self.fields:
                df = df.select(*self.fields)
            header = ["#"] + list(df.columns)
            # fetch head+tail+1 rows in ONE pass: only emit a separate
            # tail (and the ellipsis) when the total actually exceeds
            # num_rows+last_rows — otherwise rows between num_rows and
            # the tail would print twice with a misleading '...' between
            fetch = self.num_rows + (self.last_rows or 0) + 1
            head = df.limit(fetch).collect()
            truncated = len(head) == fetch
            shown = head[: self.num_rows] if truncated else head[: len(head)]
            body = [
                [str(i + 1)] + [self._cell(r[c]) for c in df.columns]
                for i, r in enumerate(shown)
            ]
            if self.last_rows and truncated:
                tail = df.tail(self.last_rows)
                body.append(["..."] * len(header))
                body.extend([""] + [self._cell(r[c]) for c in df.columns] for r in tail)
            elif truncated:
                body = body[: self.num_rows] + [["..."] * len(header)]
            self.header_print(rname)
            print(self._render(header, body))


class conditional(Stage):
    """Splice in a sub-Flow iff ``predicate(pkg)`` holds once upstream
    schemas are known (reference ``conditional.py:4-20``); ``flow`` may
    itself be ``f(pkg) -> Flow``."""

    name = "conditional"

    def __init__(self, predicate: Callable[[TablePackage], bool], flow: Any):
        self.predicate = predicate
        self.flow = flow

    def process(self, ctx: Context, pkg: TablePackage) -> TablePackage | None:
        if self.predicate(pkg):
            fl = self.flow(pkg) if callable(self.flow) and not isinstance(self.flow, Flow) else self.flow
            return fl._run(ctx, pkg)
        return None


class finalizer(Stage):
    """Run a callback after the terminal action completes, optionally
    receiving merged stats (reference ``finalizer.py:6-22``)."""

    name = "finalizer"

    def __init__(self, callback: Callable):
        self.callback = callback

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        ctx.add_finalizer(self.callback)


class parallelize(Stage):
    """Reference ``parallelize.py`` fans rows across worker processes;
    executor parallelism subsumes it. This stage keeps the API:
    repartition to ``num_processors`` (or the default parallelism) and
    optionally apply ``row_func`` (vectorized shim), honoring the
    ``predicate`` fast-path (reference :83-103)."""

    name = "parallelize"

    def __init__(self, row_func: Callable | None = None, num_processors: int | None = None, resources: Any = None, predicate: Callable | None = None):
        self.row_func = row_func
        self.num_processors = num_processors
        self.resources = resources
        self.predicate = predicate

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        n = self.num_processors or ctx.spark.sparkContext.defaultParallelism

        def apply(rname, df):
            df = df.repartition(n)
            if self.row_func is not None:
                from .udf import row_mapper

                fn, pred = self.row_func, self.predicate

                def mapper(row):
                    if pred is None or pred(row):
                        res = fn(row)
                        return res if res is not None else row
                    return row

                p = TablePackage()
                p.add(rname, df)
                row_mapper(mapper).process(ctx, p)
                return p[rname]
            return df

        pkg.apply(apply, self.resources)
