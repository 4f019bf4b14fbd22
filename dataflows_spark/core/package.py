"""TablePackage — the inter-stage IR of the engine.

The reference's ``DataStream`` carries ``(datapackage descriptor,
resource iterators, stats)`` (see reference
``dataflows/base/datastream.py:4-17``). In a Spark-native design the
schema travels *inside* each DataFrame (``df.schema``), so the package
reduces to an **ordered mapping of resource name → DataFrame** plus a
small metadata side-channel (package descriptor, per-resource
properties such as ``primaryKey``) and a mutable stats dict.

Everything is lazy: DataFrames are unexecuted Catalyst plans until a
terminal action (``Flow.results()`` / ``Flow.process()``) runs.
"""

from __future__ import annotations

import copy
from typing import Any, Callable, Iterator

from pyspark.sql import DataFrame


class TablePackage:
    """Ordered named DataFrames + descriptor metadata + stats."""

    def __init__(self) -> None:
        self._resources: dict[str, DataFrame] = {}
        #: package-level descriptor (reference: datapackage.json metadata)
        self.meta: dict[str, Any] = {}
        #: per-resource descriptor props (primaryKey, path, format, ...)
        self.resource_meta: dict[str, dict[str, Any]] = {}
        #: merged stats chain (reference: datastream.py:10-14)
        self.stats: dict[str, Any] = {}

    # -- resource access ------------------------------------------------
    def __contains__(self, name: str) -> bool:
        return name in self._resources

    def __getitem__(self, name: str) -> DataFrame:
        return self._resources[name]

    def __setitem__(self, name: str, df: DataFrame) -> None:
        self._resources[name] = df
        self.resource_meta.setdefault(name, {})

    def __delitem__(self, name: str) -> None:
        del self._resources[name]
        self.resource_meta.pop(name, None)

    def __iter__(self) -> Iterator[str]:
        return iter(self._resources)

    def __len__(self) -> int:
        return len(self._resources)

    @property
    def names(self) -> list[str]:
        return list(self._resources)

    def items(self) -> list[tuple[str, DataFrame]]:
        return list(self._resources.items())

    def first(self) -> DataFrame:
        if not self._resources:
            raise KeyError("package has no resources")
        return next(iter(self._resources.values()))

    def rename(self, old: str, new: str) -> None:
        """Rename a resource preserving package order."""
        if old not in self._resources:
            raise KeyError(old)
        self._resources = {
            (new if k == old else k): v for k, v in self._resources.items()
        }
        self.resource_meta[new] = self.resource_meta.pop(old, {})

    def add(self, name: str, df: DataFrame, **meta: Any) -> None:
        self[name] = df
        if meta:
            self.resource_meta[name].update(meta)

    # -- selection (reference processors' ``resources=`` argument) ------
    def select_names(self, resources: Any) -> list[str]:
        """Resolve a reference-style ``resources=`` spec to names.

        ``None``/-1 → all; str → that one; int → positional; list →
        those; callable → predicate over name.
        """
        names = self.names
        if resources is None or resources == -1:
            return names
        if isinstance(resources, str):
            return [resources] if resources in names else []
        if isinstance(resources, int):
            return [names[resources]]
        if callable(resources):
            return [n for n in names if resources(n)]
        out = []
        for r in resources:
            out.extend(self.select_names(r))
        return out

    def apply(
        self,
        fn: Callable[[str, DataFrame], DataFrame],
        resources: Any = None,
    ) -> None:
        """Apply ``fn`` to each selected resource in place."""
        for name in self.select_names(resources):
            self._resources[name] = fn(name, self._resources[name])

    def copy(self) -> "TablePackage":
        new = TablePackage()
        new._resources = dict(self._resources)
        new.meta = copy.deepcopy(self.meta)
        new.resource_meta = copy.deepcopy(self.resource_meta)
        new.stats = dict(self.stats)
        return new
