"""Windowed aggregation helpers — the streaming re-expression of
``join_with_self`` scoped per time bucket (SURVEY.md §2.10).

Each helper works on BOTH batch and streaming DataFrames (Spark's
``window``/``session_window`` functions are engine-agnostic), so the
same pipeline code runs in the batch tests and the streaming tier.

SIZING NOTE (state partitions): in a streaming query the aggregation's
shuffle partition count (``spark.sql.shuffle.partitions``, frozen into
the checkpoint at first run) is also the number of state-store
instances committing every micro-batch. Size it to the STATE
CARDINALITY (distinct window × key groups), not the executor count —
the expensive per-row work upstream (decode UDFs, filters) gets its
parallelism from the source partitions, while each surplus state
partition adds a per-batch commit (measured: 32 state partitions for a
~3.4k-key agg cost 10.9 s of summed commit time per batch vs 0.76 s at
8, inverting throughput at high core counts — BENCH/BASELINE.md
round-4 section). ``build_session(shuffle_partitions=...)`` sets it.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.join import expand_fields, fix_fields

# windowed versions of the reference aggregator table (join.py:59-123);
# the order-sensitive ones (first/last/array/counters) use event time as
# the ordering column — the only meaningful stream order
_WINDOW_AGGS = {
    "sum": F.sum,
    "avg": F.avg,
    "median": F.median,
    "max": F.max,
    "min": F.min,
    "count": lambda c: F.count(F.lit(1)),
    # ignoreNulls: the reference's aggregators skip None (join.py indexer),
    # as does the batch path's max_by-over-non-null-ord
    "any": lambda c: F.any_value(c, True),
    "set": lambda c: F.array_sort(F.collect_set(c)),
}


def _windowed_agg_expr(agg: str, name: str, out: str, ts_col: str) -> Column:
    c = F.col(name)
    if agg in _WINDOW_AGGS:
        return _WINDOW_AGGS[agg](c).alias(out)
    nn_ts = F.when(c.isNotNull(), F.col(ts_col))
    if agg == "first":
        return F.min_by(c, nn_ts).alias(out)
    if agg in ("last",):
        return F.max_by(c, nn_ts).alias(out)
    if agg == "array":
        return F.transform(
            F.array_sort(F.collect_list(F.when(c.isNotNull(), F.struct(F.col(ts_col).alias("o"), c.alias("v"))))),
            lambda x: x["v"],
        ).alias(out)
    raise ValueError(f"unsupported windowed aggregator: {agg}")


def _apply(df: DataFrame, window_col: Column, keys: list[str], fields: dict[str, Any], ts_col: str, watermark: str | None) -> DataFrame:
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    fields = expand_fields(fix_fields(fields), df.columns)
    main = {f: s for f, s in fields.items() if s["aggregate"] != "counters"}
    counters = {f: s for f, s in fields.items() if s["aggregate"] == "counters"}
    if counters and df.isStreaming:
        # two-phase counters = chained stateful aggregations — unsupported
        # on a stream; the stateful re-expression is
        # streaming.stateful.windowed_counters_stream (explicit state +
        # event-time eviction)
        raise NotImplementedError(
            "counters in STREAMING windows: use "
            "dataflows_spark.streaming.stateful.windowed_counters_stream "
            "(tumbling) or batch/foreachBatch"
        )
    exprs = [_windowed_agg_expr(s["aggregate"], s["name"], f, ts_col) for f, s in main.items()]
    grouped = df.groupBy(window_col.alias("window"), *[F.col(k) for k in keys])
    out = grouped.agg(*exprs) if exprs else grouped.agg(F.count(F.lit(1)).alias("__n__")).drop("__n__")
    for f, s in counters.items():
        # two-phase per-(window, keys, value) counts → count-desc list
        # (reference counters semantics, join.py:117-122)
        c = F.col(s["name"])
        per_val = (
            df.groupBy(window_col.alias("window"), *[F.col(k) for k in keys], c.cast("string").alias("__val__"))
            .agg(F.count(F.lit(1)).alias("__cnt__"))
        )
        cdf = per_val.groupBy("window", *keys).agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct((-F.col("__cnt__")).alias("nc"), F.col("__val__").alias("value"), F.col("__cnt__").alias("count")))
                ),
                lambda x: F.struct(x["value"].alias("value"), x["count"].alias("count")),
            ).alias(f)
        )
        ck = ["__w__"] + [f"__k{i}__" for i in range(len(keys))]
        cdf = cdf.toDF(*ck, f)
        from functools import reduce

        cond = reduce(
            lambda a, b: a & b,
            [out["window"].eqNullSafe(cdf["__w__"])]
            + [out[k].eqNullSafe(cdf[c2]) for k, c2 in zip(keys, ck[1:])],
        )
        out = out.join(cdf, on=cond, how="left").drop(*ck)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        *[f for f in fields],
    )


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    fields: dict[str, Any],
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling window: ``groupBy(window(ts, duration), *keys)``."""
    return _apply(df, F.window(F.col(ts_col), duration), keys, fields, ts_col, watermark)


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    fields: dict[str, Any],
    watermark: str | None = None,
) -> DataFrame:
    """Sliding window: each row lands in duration/slide windows."""
    return _apply(df, F.window(F.col(ts_col), duration, slide), keys, fields, ts_col, watermark)


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    fields: dict[str, Any],
    watermark: str | None = None,
) -> DataFrame:
    """Session window: rows within ``gap`` of each other merge into one
    session per key (pure addition over the reference — SURVEY.md §2.10)."""
    return _apply(df, F.session_window(F.col(ts_col), gap), keys, fields, ts_col, watermark)
