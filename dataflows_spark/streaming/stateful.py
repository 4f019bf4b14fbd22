"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2.10: the extension point for operators Spark's built-ins
can't express).

``latest_revision_coalescer``: per clip_id, accumulate transcript
revisions across micro-batches and emit ONE row — the highest-rev
transcript — when the group goes quiet (processing-time timeout).
This is the stateful-streaming re-expression of the reference ``join``
processor's ``last`` aggregator (``join.py:94-97``) for an unbounded
revision stream: state is explicit, bounded, and timeout-evicted.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "clip_id string, transcript string, rev int, n_revisions int"
STATE_SCHEMA = "transcript string, rev int, n int"


def _coalesce_revisions(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (clip_id,) = key
    if state.hasTimedOut:
        transcript, rev, n = state.get
        state.remove()
        yield pd.DataFrame(
            [{"clip_id": clip_id, "transcript": transcript, "rev": rev, "n_revisions": n}]
        )
        return
    best_t, best_rev, n = state.get if state.exists else (None, -1, 0)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            top = pdf.loc[pdf["rev"].idxmax()]
            if int(top["rev"]) > best_rev:
                best_rev = int(top["rev"])
                best_t = top["transcript_v2"]
    state.update((best_t, best_rev, n))
    state.setTimeoutDuration(2000)  # quiet for 2 s (processing time) → emit
    yield pd.DataFrame(columns=["clip_id", "transcript", "rev", "n_revisions"])


def latest_revision_coalescer(revisions: DataFrame) -> DataFrame:
    """Streaming input: (clip_id, transcript_v2, rev, event_time) →
    one (clip_id, transcript, rev, n_revisions) row per clip after its
    revision stream goes quiet."""
    return revisions.groupBy("clip_id").applyInPandasWithState(
        _coalesce_revisions,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def _counters_fn_factory(value_col: str, key_cols: list[str]):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterable[pd.DataFrame]:
        *ks, wstart, wend = key
        out_cols = [*key_cols, "window_start", "window_end", "counters"]
        if state.hasTimedOut:
            vals, cnts = state.get
            state.remove()
            pairs = sorted(zip(vals, cnts), key=lambda x: (-x[1], x[0]))
            rendered = ",".join(f"{v}:{c}" for v, c in pairs)
            yield pd.DataFrame([dict(zip(out_cols, [*ks, wstart, wend, rendered]))])
            return
        d: dict[str, int] = dict(zip(*state.get)) if state.exists else {}
        for pdf in pdfs:
            for v, c in pdf[value_col].dropna().astype(str).value_counts().items():
                d[v] = d.get(v, 0) + int(c)
        state.update((list(d.keys()), [int(d[k]) for k in d]))
        # evict (and emit final counters) once the event-time watermark
        # passes the window end — the streaming analog of the batch
        # two-phase counters' final aggregation. Window bounds arrive as
        # naive UTC datetimes (session TZ is pinned UTC) → epoch via timegm
        import calendar

        state.setTimeoutTimestamp(calendar.timegm(wend.timetuple()) * 1000)
        yield pd.DataFrame(columns=out_cols)

    return fn


def _session_counters_fn_factory(value_col: str, key_cols: list[str], ts_col: str, gap_s: int):
    import json

    out_cols = [*key_cols, "session_start", "session_end", "counters"]

    def _emit(ks, sessions):
        rows = []
        for start, end, counts_json in sessions:
            pairs = sorted(json.loads(counts_json).items(), key=lambda x: (-x[1], x[0]))
            rows.append(
                dict(
                    zip(
                        out_cols,
                        [
                            *ks,
                            pd.Timestamp(start, unit="s"),
                            # Spark session_window semantics: end = last event + gap
                            pd.Timestamp(end + gap_s, unit="s"),
                            ",".join(f"{v}:{c}" for v, c in pairs),
                        ],
                    )
                )
            )
        return pd.DataFrame(rows, columns=out_cols)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterable[pd.DataFrame]:
        ks = list(key)
        sessions = (
            [(int(s), int(e), c) for s, e, c in zip(*state.get)] if state.exists else []
        )
        events: list[tuple[int, str]] = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                sub = pdf[[ts_col, value_col]].dropna()
                ts_s = (sub[ts_col].astype("int64") // 1_000_000_000).tolist()
                events.extend(zip(ts_s, sub[value_col].astype(str).tolist()))
        if events:
            # interval merge with gap: every event is a unit session
            units = sessions + [(t, t, json.dumps({v: 1})) for t, v in events]
            units.sort(key=lambda x: x[0])
            merged: list[tuple[int, int, dict]] = []
            for s, e, cj in units:
                c = json.loads(cj)
                if merged and s <= merged[-1][1] + gap_s:
                    ps, pe, pc = merged[-1]
                    for v, n in c.items():
                        pc[v] = pc.get(v, 0) + n
                    merged[-1] = (ps, max(pe, e), pc)
                else:
                    merged.append((s, e, c))
            sessions = [(s, e, json.dumps(c)) for s, e, c in merged]
        wm_s = state.getCurrentWatermarkMs() // 1000
        closed = [x for x in sessions if x[1] + gap_s <= wm_s]
        live = [x for x in sessions if x[1] + gap_s > wm_s]
        if live:
            state.update((
                [s for s, _, _ in live],
                [e for _, e, _ in live],
                [c for _, _, c in live],
            ))
            # wake when the earliest live session COULD close (watermark
            # must move past end+gap); clamp above the current watermark
            earliest = min(e for _, e, _ in live) + gap_s
            state.setTimeoutTimestamp(max(earliest * 1000, state.getCurrentWatermarkMs() + 1))
        else:
            state.remove()
        yield _emit(ks, closed)

    return fn


def session_counters_stream(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    value_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """SESSION-window streaming counters: Spark has no session windows
    for arbitrary custom aggregates, so sessions live in explicit state
    per key — open sessions merge on arrival (interval merge with
    ``gap``), close and emit once the event-time watermark passes
    ``last_event + gap`` (Spark ``session_window`` end semantics). State
    per key = open sessions × distinct values, watermark-evicted."""
    from pyspark.sql import functions as F  # noqa: F401 — parity with siblings

    gap_s = int(pd.Timedelta(gap).total_seconds())
    src = df.withWatermark(ts_col, watermark)
    ftypes = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    key_ddl = ", ".join(f"`{k}` {ftypes[k]}" for k in keys)
    out_schema = f"{key_ddl}, session_start timestamp, session_end timestamp, counters string"
    return src.groupBy(*keys).applyInPandasWithState(
        _session_counters_fn_factory(value_col, keys, ts_col, gap_s),
        outputStructType=out_schema,
        stateStructType="starts array<long>, ends array<long>, counts array<string>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def windowed_counters_stream(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    value_col: str,
    watermark: str = "10 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Streaming ``counters`` aggregator (reference join.py:117-122
    semantics) over tumbling windows — the two-phase batch shape can't
    run on a stream (chained stateful aggregations), so the per-window
    value→count map lives in EXPLICIT bounded state
    (``applyInPandasWithState``): updated per micro-batch, emitted once
    as a count-desc/value-asc string when the watermark passes the
    window end, then evicted. State size = distinct values per live
    window, not rows. With ``slide`` (must divide ``duration``) each row
    is exploded into its duration/slide overlapping windows first —
    sliding-window counters with the same per-window state core."""
    from pyspark.sql import functions as F

    src = df.withWatermark(ts_col, watermark)
    if slide is None:
        w = F.window(F.col(ts_col), duration)
        src = src.withColumn("__wstart", w.start).withColumn("__wend", w.end)
    else:
        dur_s = int(pd.Timedelta(duration).total_seconds())
        sl_s = int(pd.Timedelta(slide).total_seconds())
        if dur_s % sl_s:
            raise ValueError("slide must divide duration")
        n = dur_s // sl_s
        base = F.floor(F.unix_timestamp(F.col(ts_col)) / sl_s) * sl_s
        starts = F.transform(
            F.sequence(F.lit(0), F.lit(n - 1)), lambda i: base - i.cast("bigint") * sl_s
        )
        src = (
            src.withColumn("__wstart_s", F.explode(starts))
            .withColumn("__wstart", F.timestamp_seconds(F.col("__wstart_s")))
            .withColumn("__wend", F.timestamp_seconds(F.col("__wstart_s") + dur_s))
            .drop("__wstart_s")
        )
    ftypes = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    key_ddl = ", ".join(f"`{k}` {ftypes[k]}" for k in keys)
    out_schema = f"{key_ddl}, window_start timestamp, window_end timestamp, counters string"
    return src.groupBy(*keys, "__wstart", "__wend").applyInPandasWithState(
        _counters_fn_factory(value_col, keys),
        outputStructType=out_schema,
        stateStructType="vals array<string>, cnts array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
