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
