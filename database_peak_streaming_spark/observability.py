"""Observability surface: in-plan metrics (``df.observe``) and
streaming progress capture.

The reference printed ad-hoc counters from its ingest loop
(database_peak_streaming.py:31-45 window prints); the engine-native
form is (a) ``Observation`` metrics evaluated INSIDE the plan — zero
extra scans, exact, available the moment an action finishes — and
(b) ``StreamingQueryProgress`` / ``StreamingQueryListener`` for
per-micro-batch rates and state-store telemetry (rows dropped by the
watermark, state rows, input rate), which is what a production
deployment alerts on.

Both are pure engine features — no extra jobs, no UDFs; at 100 TB the
observe() metrics ride the existing whole-stage-codegen pass.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_scan_audit(df: DataFrame, value_col: str) -> tuple[DataFrame, Observation]:
    """Attach an in-plan audit to a DataFrame: row count, null count
    and exact decimal sum of ``value_col`` are computed WHILE the main
    query runs (one pass, no second scan).  Returns (df, observation);
    read ``observation.get`` after any action on the returned df.

    This is the "reconciliation counters" pattern: a nightly job
    asserts the observed totals against the source's manifest without
    re-reading anything."""
    obs = Observation("scan_audit")
    audited = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(value_col).isNull().cast("long")).alias("n_nulls"),
        F.sum(F.col(value_col).cast("decimal(28,6)")).alias("sum_value"),
    )
    return audited, obs


class ProgressCapture:
    """Collect ``StreamingQueryProgress`` dicts from a running query —
    the poll-based form usable under AvailableNow drives (a
    StreamingQueryListener works identically for long-running
    deployments; this helper avoids listener-bus races in short
    tests).  Use ``snapshots(query)`` after the query terminates."""

    @staticmethod
    def snapshots(query: Any) -> list[dict]:
        return [p.asDict() if hasattr(p, "asDict") else p for p in query.recentProgress]

    @staticmethod
    def total_dropped_by_watermark(progress: list[dict]) -> int:
        total = 0
        for p in progress:
            ops = p.get("stateOperators") or []
            for op in ops:
                total += int(op.get("numRowsDroppedByWatermark") or 0)
        return total

    @staticmethod
    def total_input_rows(progress: list[dict]) -> int:
        return sum(int(p.get("numInputRows") or 0) for p in progress)
