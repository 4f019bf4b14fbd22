"""Streaming stages for the Flow DSL — the composable streaming
pipeline of the north rule: the same Flow chain and the same operator
stages (filter_rows, add_field, find_replace, set_type, ...) run over
an unbounded stream; only the source and sink stages differ.

``Flow(load_stream(...), filter_rows(...), window_agg(...),
dump_stream(...))`` builds a StreamingQuery wired to an exactly-once
sink; ``Flow.process`` starts it.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from ..core.context import Context
from ..core.flow import Stage
from ..core.package import TablePackage
from .listener import LineageListener
from .sink import ExactlyOnceParquetSink, KeyedMergeSink
from .windows import session_window_agg, sliding_window_agg, tumbling_window_agg


class load_stream(Stage):
    """Streaming source: file-based (parquet/json/csv dir), ``rate``,
    or an Iceberg/catalog table via ``table://`` when available.
    The streaming analog of ``load`` (reference ``processors/load.py``).
    """

    name = "load_stream"

    def __init__(
        self,
        source: str,
        name: str | None = None,
        format: str = "parquet",
        schema: Any = None,
        watermark: tuple[str, str] | None = None,
        max_files_per_trigger: int | None = None,
        **options: Any,
    ):
        self.source = source
        self.res_name = name or "stream"
        self.format = format
        self.schema = schema
        self.watermark = watermark
        self.max_files_per_trigger = max_files_per_trigger
        self.options = options

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        if self.source.startswith("table://"):
            df = ctx.spark.readStream.table(self.source[8:])
        elif self.format == "rate":
            reader = ctx.spark.readStream.format("rate")
            for k, v in self.options.items():
                reader = reader.option(k, v)
            df = reader.load()
        else:
            reader = ctx.spark.readStream.format(self.format)
            if self.schema is not None:
                reader = reader.schema(self.schema)
            if self.max_files_per_trigger:
                reader = reader.option("maxFilesPerTrigger", str(self.max_files_per_trigger))
            for k, v in self.options.items():
                reader = reader.option(k, v)
            df = reader.load(self.source)
        if self.watermark:
            df = df.withWatermark(*self.watermark)
        pkg.add(self.res_name, df, streaming=True)


class watermark(Stage):
    """Attach/replace the event-time watermark on a resource."""

    name = "watermark"

    def __init__(self, ts_col: str, delay: str, resources: Any = None):
        self.ts_col = ts_col
        self.delay = delay
        self.resources = resources

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        pkg.apply(lambda n, df: df.withWatermark(self.ts_col, self.delay), self.resources)


class window_agg(Stage):
    """Windowed join_with_self: tumbling (default), sliding
    (``slide=``) or session (``gap=``) windows over the reference
    aggregator table (SURVEY.md §2.10)."""

    name = "window_agg"

    def __init__(
        self,
        ts_col: str,
        keys: list[str],
        fields: dict[str, Any],
        duration: str | None = None,
        slide: str | None = None,
        gap: str | None = None,
        watermark: str | None = None,
        resources: Any = None,
    ):
        self.ts_col = ts_col
        self.keys = keys
        self.fields = fields
        self.duration = duration
        self.slide = slide
        self.gap = gap
        self.watermark = watermark
        self.resources = resources

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        def apply(name, df):
            if self.gap:
                return session_window_agg(df, self.ts_col, self.gap, self.keys, self.fields, self.watermark)
            if self.slide:
                return sliding_window_agg(df, self.ts_col, self.duration, self.slide, self.keys, self.fields, self.watermark)
            return tumbling_window_agg(df, self.ts_col, self.duration, self.keys, self.fields, self.watermark)

        pkg.apply(apply, self.resources)


class stream_join(Stage):
    """Stateful stream-stream join stage (the streaming ``join``
    processor): target ⋈ source on key within a time bound."""

    name = "stream_join"

    def __init__(
        self,
        source_name: str,
        target_name: str,
        key: str,
        left_ts: str = "event_time",
        right_ts: str = "event_time",
        watermark: str = "10 minutes",
        time_bound: str = "5 minutes",
        how: str = "inner",
        source_delete: bool = True,
    ):
        self.source_name = source_name
        self.target_name = target_name
        self.key = key
        self.left_ts = left_ts
        self.right_ts = right_ts
        self.watermark = watermark
        self.time_bound = time_bound
        self.how = how
        self.source_delete = source_delete

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        from .join import stream_stream_join

        joined = stream_stream_join(
            pkg[self.target_name],
            pkg[self.source_name],
            self.key,
            self.left_ts,
            self.right_ts,
            watermark=self.watermark,
            time_bound=self.time_bound,
            how=self.how,
        )
        pkg[self.target_name] = joined
        if self.source_delete:
            del pkg[self.source_name]


class stream_deduplicate(Stage):
    """Streaming exactly-once row dedup: ``dropDuplicatesWithinWatermark``
    on the primary key (reference ``deduplicate`` by PK —
    ``processors/deduplicate.py:6-17`` — under unbounded input)."""

    name = "stream_deduplicate"

    def __init__(self, keys: list[str] | None = None, within_watermark: bool = True, resources: Any = None):
        self.keys = keys
        self.within_watermark = within_watermark
        self.resources = resources

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        def apply(name, df):
            keys = self.keys or pkg.resource_meta.get(name, {}).get("primaryKey")
            if not keys:
                return df
            if self.within_watermark and df.isStreaming:
                return df.dropDuplicatesWithinWatermark(keys)
            return df.dropDuplicates(keys)

        pkg.apply(apply, self.resources)


class dump_stream(Stage):
    """Streaming sink stage — the streaming ``dump_to_path``:

    - ``mode='append'`` → :class:`ExactlyOnceParquetSink` (batch-id
      commit markers)
    - ``mode='merge'`` → :class:`KeyedMergeSink` (upsert on ``keys`` —
      the Iceberg MERGE INTO / dump_to_sql-update analog)

    OUTPUT-MODE SEMANTICS: the default ``output_mode='update'`` re-emits
    refined aggregate rows on later micro-batches; the append sink keeps
    each emission in its own ``batch_id=`` dir (an append log). Pass
    ``keys=`` so ``sink.read()`` resolves to the latest version per key,
    or use ``output_mode='append'`` (+ watermark) for emit-once-final
    windows, or ``mode='merge'`` to upsert in place.

    ``Flow.process`` drives the query; with ``process_all=True`` (test
    mode) the query drains available input synchronously and stops.
    """

    name = "dump_stream"

    def __init__(
        self,
        path: str | None = None,
        checkpoint_dir: str | None = None,
        mode: str = "append",
        keys: list[str] | None = None,
        resources: Any = None,
        trigger: dict | None = None,
        process_all: bool = False,
        output_mode: str = "update",
        collect_lineage: bool = True,
        iceberg_table: str | None = None,
    ):
        if checkpoint_dir is None:
            raise ValueError("dump_stream requires checkpoint_dir")
        if iceberg_table is not None and mode != "merge":
            raise ValueError("iceberg_table= requires mode='merge'")
        if iceberg_table is None and path is None:
            raise ValueError("dump_stream requires path= (or iceberg_table= with mode='merge')")
        if iceberg_table is not None and path is not None:
            raise ValueError("dump_stream takes exactly one of path= or iceberg_table=")
        self.path = path
        self.checkpoint_dir = checkpoint_dir
        self.mode = mode
        self.keys = keys
        self.resources = resources
        self.trigger = trigger
        self.process_all = process_all
        self.output_mode = output_mode
        self.collect_lineage = collect_lineage
        #: target a real Iceberg catalog table (MERGE INTO per batch)
        #: instead of the parquet SnapshotTable fallback — gated on the
        #: runtime jar, see KeyedMergeSink
        self.iceberg_table = iceberg_table
        self.sink = None
        self.query = None

    def process(self, ctx: Context, pkg: TablePackage) -> None:
        names = pkg.select_names(self.resources)
        name = names[0]
        df = pkg[name]
        if self.mode == "merge":
            if not self.keys:
                keys = pkg.resource_meta.get(name, {}).get("primaryKey")
            else:
                keys = self.keys
            self.sink = KeyedMergeSink(self.path, keys=keys, iceberg_table=self.iceberg_table)
        else:
            self.sink = ExactlyOnceParquetSink(self.path, dedup_keys=self.keys)
        writer = (
            df.writeStream.outputMode(self.output_mode)
            .foreachBatch(self.sink)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if self.trigger:
            writer = writer.trigger(**self.trigger)
        self.query = writer.start()
        pkg.resource_meta[name]["_written"] = True
        pkg.resource_meta[name]["query_id"] = str(self.query.id)
        if self.process_all:
            self.query.processAllAvailable()
            if self.collect_lineage:
                # recentProgress is attached to the query — no listener-bus
                # race; same fields as LineageListener captures
                import json as _json

                progress = [_json.loads(p.json) for p in self.query.recentProgress]
                pkg.stats["lineage"] = _lineage_stats(progress)
            self.query.stop()
        else:
            pkg.stats["query"] = self.query


def _lineage_stats(progress: list[dict]) -> dict:
    total_rows = sum(int(p.get("numInputRows") or 0) for p in progress)
    dropped = sum(
        int(s.get("numRowsDroppedByWatermark") or 0)
        for p in progress
        for s in (p.get("stateOperators") or [])
    )
    state_rows = max(
        (int(s.get("numRowsTotal") or 0) for p in progress for s in (p.get("stateOperators") or [])),
        default=0,
    )
    # RocksDB provider metrics from the final progress event (cumulative
    # view of the state backend: sst file sizes, commit latency, ...)
    rocksdb = {}
    for p in progress:
        for s in p.get("stateOperators") or []:
            for k, v in (s.get("customMetrics") or {}).items():
                if k.startswith("rocksdb"):
                    rocksdb[k] = v
    return {
        "batches": len(progress),
        "total_input_rows": total_rows,
        "rows_dropped_by_watermark": dropped,
        "state_rows_total": state_rows,
        "state_store": rocksdb,
        "per_batch": [
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "sources": [
                    {
                        "description": s.get("description"),
                        "startOffset": s.get("startOffset"),
                        "endOffset": s.get("endOffset"),
                        "numInputRows": s.get("numInputRows"),
                    }
                    for s in (p.get("sources") or [])
                ],
                "stateOperators": p.get("stateOperators"),
            }
            for p in progress
        ],
    }
