"""Inline pipeline telemetry: named observed metrics riding the SAME action
as the query (``Dataset.observe``) — row counts, null counts, value sums
computed by accumulators inside the existing scan, with NO second pass over
the data.  At 100 TB this is the only affordable way to get per-batch
data-quality counters: a separate ``df.agg(...)`` pass would re-read the
input; an observation is free.

Two consumption modes, both exercised by tests/test_observability.py:

* batch — ``pyspark.sql.Observation`` blocks until the action that carries
  it finishes, then exposes the metric row (``obs.get``);
* streaming — every micro-batch's metrics surface on
  ``StreamingQueryProgress.observedMetrics`` and via
  ``StreamingQueryListener.onQueryProgress`` (the hook an ops dashboard
  subscribes to); :class:`MetricsRecorder` is that listener, recording one
  dict per (query, batch).

No reference parity claim: the reference (app.py) logs per-chunk prints —
this module is the engine-grade replacement for those prints.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def quality_metrics(*cols: str) -> list[Column]:
    """The standard data-quality metric set for a frame: total rows plus a
    null count per named column — all computable as observation aggregates
    (observe allows count/sum/min/max-style aggregates; no distinct, no
    windows)."""
    out: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        out.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
        )
    return out


def observed(df: DataFrame, name: str, *metrics: Column):
    """Attach named observed metrics to ``df``.

    Batch frames return ``(df, Observation)`` — run any action on ``df``,
    then read ``observation.get``.  Streaming frames return ``(df, None)``
    (an Observation cannot attach to a stream); the metrics appear on every
    micro-batch's ``StreamingQueryProgress.observedMetrics[name]``."""
    if df.isStreaming:
        return df.observe(name, *metrics), None
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


class MetricsRecorder(StreamingQueryListener):
    """StreamingQueryListener capturing observed metrics per micro-batch:
    ``recorder.metrics`` is a list of (query_name, batch_id, {metric: value})
    tuples.  Register with ``spark.streams.addListener(recorder)``; the ops
    deployment ships these rows to its telemetry sink instead."""

    def __init__(self) -> None:
        self.metrics: list[tuple[str, int, dict[str, Any]]] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        for name, row in (p.observedMetrics or {}).items():
            self.metrics.append((name, p.batchId, row.asDict()))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
