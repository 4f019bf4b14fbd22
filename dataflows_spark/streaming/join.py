"""Stateful stream-stream join — the streaming re-expression of the
reference's ``join`` processor (``dataflows/processors/join.py:380``):
clips ⋈ transcript revisions by ``clip_id`` within a time bound, with
watermarks on both sides so join state is evictable (SURVEY.md §2.10,
§7.4 item 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "10 minutes",
    time_bound: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two (streaming) DataFrames on ``key`` where the right-side
    event falls within ``[left_ts, left_ts + time_bound]``.

    Both sides get watermarks; the time-range condition bounds the state
    the symmetric hash join must keep (without it, outer-join state
    would grow forever). Right-side ``key``/timestamp columns are
    suffixed ``_r`` to avoid collisions.
    """
    lw = left.withWatermark(left_ts, watermark)
    # suffix every right-side column with _r — collision-free by construction
    rw = right.withWatermark(right_ts, watermark).select(
        *[F.col(c).alias(f"{c}_r") for c in right.columns]
    )
    rkey, rts = f"{key}_r", f"{right_ts}_r"
    cond = (
        (F.col(key) == F.col(rkey))
        & (F.col(rts) >= F.col(left_ts))
        & (F.col(rts) <= F.col(left_ts) + F.expr(f"INTERVAL {time_bound}"))
    )
    return lw.join(rw, on=cond, how=how)
