"""Per-partition lineage + metrics — the streaming analog of the
reference's stats chain (``dataflows/base/datastream.py:10-14``,
``dumpers/dumper_base.py:67-75``): a ``StreamingQueryListener`` that
accumulates, per micro-batch, source start/end offsets, input row
counts, processing rates and state-store metrics into a stats dict.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql.streaming import StreamingQueryListener


class LineageListener(StreamingQueryListener):
    def __init__(self) -> None:
        self.progress: list[dict[str, Any]] = []
        self.terminated: list[dict[str, Any]] = []

    # -- listener hooks ---------------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        self.progress.append(
            {
                "id": p.get("id"),
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "inputRowsPerSecond": p.get("inputRowsPerSecond"),
                "processedRowsPerSecond": p.get("processedRowsPerSecond"),
                "sources": [
                    {
                        "description": s.get("description"),
                        "startOffset": s.get("startOffset"),
                        "endOffset": s.get("endOffset"),
                        "numInputRows": s.get("numInputRows"),
                    }
                    for s in p.get("sources", [])
                ],
                "stateOperators": [
                    {
                        "operatorName": s.get("operatorName"),
                        "numRowsTotal": s.get("numRowsTotal"),
                        "numRowsUpdated": s.get("numRowsUpdated"),
                        "numRowsDroppedByWatermark": s.get("numRowsDroppedByWatermark"),
                        "stateMemoryUsedBytes": s.get("memoryUsedBytes"),
                        # RocksDB provider metrics (sst sizes, commit
                        # latencies, bytes copied) — empty dict under the
                        # default HDFS-backed provider
                        "stateStoreMetrics": {
                            k: v
                            for k, v in (s.get("customMetrics") or {}).items()
                            if k.startswith("rocksdb")
                        },
                    }
                    for s in p.get("stateOperators", [])
                ],
                "eventTime": p.get("eventTime", {}),
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.terminated.append({"id": str(event.id), "exception": event.exception})

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # -- stats-chain view ---------------------------------------------------
    def stats(self) -> dict[str, Any]:
        total_rows = sum(p.get("numInputRows") or 0 for p in self.progress)
        dropped = sum(
            s.get("numRowsDroppedByWatermark") or 0
            for p in self.progress
            for s in p.get("stateOperators", [])
        )
        return {
            "batches": len(self.progress),
            "total_input_rows": total_rows,
            "rows_dropped_by_watermark": dropped,
            "per_batch": self.progress,
        }
