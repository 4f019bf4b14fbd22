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
- dump_to_sql (``to_sql.py:103-140``): rewrite/append via Spark's
  parallel JDBC writer; update = staged bulk write + one set-based
  ``MERGE INTO`` on the server (tested against embedded Derby). The
  file-backed analog is ``dataflows_spark.streaming.sink.KeyedMergeSink``.
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


def _md5_file(path: str) -> str:
    import hashlib

    h = hashlib.md5()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


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
        add_filehash_to_path: bool = False,
        file_formatters: dict[str, Any] | None = None,
    ):
        self.out_path = out_path
        self.format = format
        self.resources = resources
        self.partition_by = partition_by
        self.mode = mode
        self.options = options or {}
        # reference dumper_base.py:67-75 / file_dumper.py: content-hash
        # the dump and nest the output under it (cache-busting layout)
        self.add_filehash_to_path = add_filehash_to_path
        #: reference file_dumper.py:37 ``file_formatters``: format name →
        #: ``fn(df, target_path, stage) -> None`` writer override; the
        #: callable owns the whole write for that format
        self.file_formatters = file_formatters or {}

    @staticmethod
    def _dir_stats(path: str) -> tuple[int, str]:
        """(total bytes, stable content hash) of a written resource dir:
        md5 over the sorted per-part md5s, so the hash is independent of
        walk order (parquet part files are themselves deterministic for a
        deterministic plan + partitioning)."""
        part_hashes = []
        total = 0
        if os.path.isfile(path):  # a custom formatter may write a single file
            return os.path.getsize(path), _md5_file(path)
        for root, _dirs, files in os.walk(path):
            for f in sorted(files):
                if f.startswith((".", "_")):
                    continue
                full = os.path.join(root, f)
                total += os.path.getsize(full)
                part_hashes.append(_md5_file(full))
        import hashlib

        agg = hashlib.md5(",".join(sorted(part_hashes)).encode()).hexdigest()
        return total, agg

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        from pyspark.sql import Observation

        os.makedirs(self.out_path, exist_ok=True)
        counters: dict[str, int] = {}
        byte_counters: dict[str, int] = {}
        hash_counters: dict[str, str] = {}
        for rname in pkg.select_names(self.resources):
            df = pkg[rname]
            target = os.path.join(self.out_path, rname)
            if self.format in self.file_formatters:
                # the custom writer owns the write and may never run a
                # Spark action on the DataFrame we hand it — an
                # Observation would block forever waiting for one, so
                # the row counter is a plain count() here (an extra
                # action, on the user-owned path only)
                self.file_formatters[self.format](df, target, self)
                counters[rname] = df.count()
            else:
                obs = Observation(f"dump_{rname}")
                observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
                writer = observed.write.format(self.format).mode(self.mode)
                if self.format == "csv":
                    writer = writer.option("header", "true")
                for k, v in self.options.items():
                    writer = writer.option(k, v)
                if self.partition_by:
                    writer = writer.partitionBy(*self.partition_by)
                writer.save(target)
                counters[rname] = obs.get.get("rows", 0)
            pkg.resource_meta[rname]["_written"] = True
            pkg.resource_meta[rname]["path"] = target
            pkg.resource_meta[rname]["format"] = self.format
            byte_counters[rname], hash_counters[rname] = self._dir_stats(target)
        pkg.stats.setdefault("count_of_rows", {}).update(counters)
        pkg.stats.setdefault("bytes", {}).update(byte_counters)
        pkg.stats.setdefault("hash", {}).update(hash_counters)
        final_path = self.out_path
        if self.add_filehash_to_path:
            import hashlib

            pkg_hash = hashlib.md5(",".join(sorted(hash_counters.values())).encode()).hexdigest()
            final_path = os.path.join(self.out_path, pkg_hash)
            os.makedirs(final_path, exist_ok=True)
            # move ONLY the resources this dump just wrote — out_path may
            # hold unrelated entries or a previous dump's hash dir; a
            # re-dump with an unchanged hash replaces in place (idempotent)
            for rname in pkg.select_names(self.resources):
                src = os.path.join(self.out_path, rname)
                dst = os.path.join(final_path, rname)
                if os.path.exists(dst):
                    shutil.rmtree(dst)
                os.rename(src, dst)
                pkg.resource_meta[rname]["path"] = dst
            pkg.stats.setdefault("dump", {})["hash"] = pkg_hash
        # the manifest is written AFTER any hash-rename so its resource
        # paths are the final on-disk locations (load(datapackage.json)
        # follows them)
        manifest = {
            "meta": pkg.meta,
            "resources": pkg.select_names(self.resources),
            "resource_meta": {
                k: {kk: vv for kk, vv in v.items() if not kk.startswith("_")}
                for k, v in pkg.resource_meta.items()
            },
        }
        with open(os.path.join(final_path, "datapackage.json"), "w") as fh:
            json.dump(manifest, fh, indent=2, default=str)
        pkg.stats.setdefault("dump", {})["path"] = final_path


class dump_to_zip(Stage):
    """Package the dump as a single zip archive (reference
    ``processors/dumpers/to_zip.py``): a ``dump_to_path`` into a temp
    dir, zipped with the datapackage.json manifest at the root.
    Driver-side by construction — a zip is a distribution artifact, not
    a scale-path sink (use dump_to_path/parquet for data)."""

    name = "dump_to_zip"

    def __init__(self, out_file: str, format: str = "csv", resources: Any = None, **kw: Any):
        self.out_file = out_file
        self.format = format
        self.resources = resources
        self.kw = kw

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        import tempfile
        import zipfile

        with tempfile.TemporaryDirectory() as tmp:
            inner = dump_to_path(tmp, format=self.format, resources=self.resources, **self.kw)
            inner.process(ctx, pkg)
            with zipfile.ZipFile(self.out_file, "w", zipfile.ZIP_DEFLATED) as zf:
                for root, _dirs, files in os.walk(tmp):
                    for f in sorted(files):
                        full = os.path.join(root, f)
                        zf.write(full, os.path.relpath(full, tmp))
        pkg.stats.setdefault("dump", {})["zip"] = self.out_file


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
    ``update_keys``).

    ``update`` is a two-step idempotent upsert that scales with the
    batch, not the target table: (1) the batch (deduped on the keys) is
    bulk-written to a staging table through the normal parallel JDBC
    path, (2) one set-based ``MERGE INTO target USING staging`` runs on
    the server. This is the distributed re-expression of the reference's
    per-row upsert loop (``to_sql.py:103-140``) — same row outcome, no
    row-at-a-time round-trips. Exercised end-to-end against Derby
    (embedded in Spark's classpath); the file-backed analog is
    ``streaming.sink.KeyedMergeSink``.
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
                "for file-backed keyed upserts use streaming.sink.KeyedMergeSink"
            )
        for table_name, spec in self.tables.items():
            rname = spec.get("resource-name", table_name)
            ref_mode = spec.get("mode", "rewrite")
            if ref_mode == "update":
                keys = spec.get("update_keys") or pkg.resource_meta.get(rname, {}).get("primaryKey")
                if not keys:
                    raise ValueError("dump_to_sql update mode needs update_keys or a primaryKey")
                self._upsert(ctx, pkg[rname], url, table_name, list(keys))
            else:
                mode = {"rewrite": "overwrite", "append": "append"}[ref_mode]
                self._write(pkg[rname], url, table_name, mode)
            pkg.resource_meta[rname]["_written"] = True

    def _write(self, df, url: str, table: str, mode: str) -> None:
        w = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
        for k, v in self.options.items():
            w = w.option(k, v)
        w.save()

    @staticmethod
    def _table_exists(conn, table: str) -> bool:
        """Probe the catalog with the server's actual identifier folding:
        the name as written, then upper/lower per the driver's
        storesUpperCaseIdentifiers/storesLowerCaseIdentifiers flags (with
        both folds as a fallback when the driver can't say). An
        upper-only probe finds Derby/Oracle tables but silently misses
        them on lower-folding servers like PostgreSQL — which would turn
        every 'update' run into an append."""
        meta = conn.getMetaData()
        candidates = [table]
        try:
            if meta.storesUpperCaseIdentifiers():
                candidates.append(table.upper())
            if meta.storesLowerCaseIdentifiers():
                candidates.append(table.lower())
            if len(candidates) == 1:  # case-sensitive/mixed catalogs
                candidates += [table.upper(), table.lower()]
        except Exception:
            candidates += [table.upper(), table.lower()]
        for cand in dict.fromkeys(candidates):
            rs = meta.getTables(None, None, cand, None)
            found = rs.next()
            rs.close()
            if found:
                return True
        return False

    def _upsert(self, ctx: Context, df, url: str, table: str, keys: list[str]) -> None:
        jvm = ctx.spark._jvm
        staging = f"{table}__staging"
        # late rows for the same key within one batch: last write wins is
        # undefined server-side — dedup before the merge
        batch = df.dropDuplicates(keys)
        conn = jvm.java.sql.DriverManager.getConnection(url)
        try:
            target_exists = self._table_exists(conn, table)
        finally:
            conn.close()
        if not target_exists:
            # first load: a plain parallel write IS the upsert
            self._write(batch, url, table, "append")
            return
        self._write(batch, url, staging, "overwrite")
        # Spark's JDBC writer quotes column identifiers verbatim but leaves
        # the table name to the server's case folding — mirror that here
        cols = batch.columns
        on = " AND ".join(f't."{c}" = s."{c}"' for c in keys)
        sets = ", ".join(f'"{c}" = s."{c}"' for c in cols if c not in keys)
        ins_cols = ", ".join(f'"{c}"' for c in cols)
        ins_vals = ", ".join(f's."{c}"' for c in cols)
        merge = (
            f"MERGE INTO {table} t USING {staging} s ON {on} "
            + (f"WHEN MATCHED THEN UPDATE SET {sets} " if sets else "")
            + f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
        )
        conn = jvm.java.sql.DriverManager.getConnection(url)
        try:
            st = conn.createStatement()
            st.execute(merge)
            st.execute(f"DROP TABLE {staging}")
            st.close()
        finally:
            conn.close()
