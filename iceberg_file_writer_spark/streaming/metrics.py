"""Streaming progress metrics: the observability surface of late-data
handling [extension — not in reference].

A watermarked pipeline silently drops rows older than the watermark;
at 100 TB "silently" is unacceptable — the drop counts are the signal
that an upstream feed is delivering late and state-bound results are
incomplete. Structured Streaming already meters this per state operator
(numRowsDroppedByWatermark); this module folds the per-operator metrics
of a query's progress events into one accounting dict a pipeline can
alert on.

Reference scope note: the reference's ingest loop (/root/reference/
main.go) has no event-time semantics, so late-data accounting has no
counterpart there; this extends the streaming surface the way its
block-flush counters extend the write path. [extension]
"""

from __future__ import annotations

from typing import Any

from pyspark.sql.streaming import StreamingQuery


def state_metrics_summary(query: StreamingQuery) -> dict[str, Any]:
    """Fold all progress events of `query` into one late-data accounting.

    Returns totals across every micro-batch and state operator:
      rows_dropped_by_watermark — late input discarded before state
      rows_in_state             — state rows at the last progress
      batches                   — progress events seen
      last_watermark            — the final event-time watermark (ISO str)
    recentProgress is bounded (spark.sql.streaming.numRecentProgressUpdates,
    default 100); for long-running queries attach a StreamingQueryListener
    and accumulate the same fields per progress event instead — the field
    names below are identical there.
    """
    dropped = 0
    rows_in_state = 0
    batches = 0
    last_wm = None
    for p in query.recentProgress:
        # Classic sessions yield plain dicts; Spark Connect yields
        # StreamingQueryProgress objects — normalize via their json form.
        if not isinstance(p, dict):
            import json

            p = json.loads(p.json() if callable(getattr(p, "json", None)) else p.json)
        batches += 1
        for op in p.get("stateOperators", []):
            dropped += op.get("numRowsDroppedByWatermark", 0) or 0
        ops = p.get("stateOperators", [])
        if ops:
            rows_in_state = sum(op.get("numRowsTotal", 0) or 0 for op in ops)
        wm = (p.get("eventTime") or {}).get("watermark")
        if wm:
            last_wm = wm
    return {
        "rows_dropped_by_watermark": dropped,
        "rows_in_state": rows_in_state,
        "batches": batches,
        "last_watermark": last_wm,
    }
