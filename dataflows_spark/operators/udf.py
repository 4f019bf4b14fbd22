"""UDF surface — the compat shim for the reference's bare-function steps.

Reference dispatch (``dataflows/base/flow.py:38-51``): a bare ``def
f(row)`` mutates/returns one row-dict; ``def f(rows)`` is a generator
transform over one resource. Here both are executed as **Arrow-batched**
``mapInPandas`` — never per-row Python over the wire — but per-element
Python still runs inside the batch, so these are the documented slow
path. Prefer the vectorized operators (add_computed_field, find_replace,
set_type, filter_rows) which compile to JVM-side Catalyst expressions.
"""

from __future__ import annotations

from typing import Any, Callable

import pandas as pd

from ..core.context import Context
from ..core.flow import Stage
from ..core.package import TablePackage


def _records(pdf: pd.DataFrame) -> list[dict]:
    return pdf.to_dict("records")


class row_mapper(Stage):
    """Per-row dict mapper, reference row-function semantics: the callable
    may mutate the dict in place or return a replacement dict."""

    def __init__(self, fn: Callable[[dict], dict | None], resources: Any = None, schema=None):
        self.fn = fn
        self.resources = resources
        self.schema = schema
        self.name = f"row:{getattr(fn, '__name__', 'fn')}"

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        fn = self.fn

        def apply(name, df):
            schema = self.schema or df.schema
            cols = [f.name for f in schema.fields]

            def mapper(batches):
                for pdf in batches:
                    out = []
                    for rec in _records(pdf):
                        res = fn(rec)
                        out.append(res if res is not None else rec)
                    opdf = pd.DataFrame(out)
                    yield opdf.reindex(columns=cols)

            return df.mapInPandas(mapper, schema=schema)

        pkg.apply(apply, self.resources)


class rows_transform(Stage):
    """Whole-resource generator transform (may add/drop/multiply rows),
    reference rows-function semantics (``flow.py:44-45``)."""

    def __init__(self, fn: Callable, resources: Any = None, schema=None):
        self.fn = fn
        self.resources = resources
        self.schema = schema
        self.name = f"rows:{getattr(fn, '__name__', 'fn')}"

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        fn = self.fn

        def apply(name, df):
            schema = self.schema or df.schema
            cols = [f.name for f in schema.fields]

            def mapper(batches):
                for pdf in batches:
                    out = list(fn(iter(_records(pdf))))
                    opdf = pd.DataFrame(out) if out else pd.DataFrame(columns=cols)
                    yield opdf.reindex(columns=cols)

            return df.mapInPandas(mapper, schema=schema)

        pkg.apply(apply, self.resources)
