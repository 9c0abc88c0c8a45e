"""Two-tier storage with downsampling and retention — the reference's
st_*/lt_* SQLite layout (database_peak_streaming.py:52-69) re-designed
for a distributed store (SURVEY.md §4 physical designs 1-2).

Layout: date-partitioned parquet per tier.

* ``st`` (short-term): full-rate window aggregates, retained
  ``st_length`` seconds (1 week prod, README.md:23).
* ``lt`` (long-term): per-minute resample (the *intent* of the 1/600
  stride at database_peak_streaming.py:52-56 per README.md:15), retained
  forever.

Retention is a **partition drop**: because both tiers partition by
``date``, deleting expired data is a filesystem metadata operation — no
scan, no rewrite, no tombstones — where the reference issued a row-level
SQL DELETE plus a fragile companion-table alignment (P5).  At 100 TB
this is the difference between an O(1) directory removal and a full
rewrite of the week's data.
"""

from __future__ import annotations

import datetime as dt
import shutil
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Production envelope (README.md:15-23); tests override.
ST_LENGTH_S = 604_800
LT_BUCKET = "1 minute"


@dataclass
class TieredStore:
    """st/lt parquet tiers under ``root`` with date partitioning."""

    spark: SparkSession
    root: str
    st_length_s: int = ST_LENGTH_S
    lt_bucket: str = LT_BUCKET

    @property
    def st_path(self) -> str:
        return str(Path(self.root) / "st")

    @property
    def lt_path(self) -> str:
        return str(Path(self.root) / "lt")

    # -- epoch sink (A3/S7): one transactionally-written epoch per call --

    def write_epoch(self, batch_df: DataFrame, epoch_id: int | None = None) -> None:
        """Append one micro-batch epoch of window aggregates to the st
        tier and fold its minute-resample into the lt tier.  The input
        must carry a ``window_start`` timestamp column; ``date`` is
        derived for partitioning.

        Exactly-once on retry: ``foreachBatch`` is at-least-once — after
        a crash the same epoch_id can be re-delivered.  A per-epoch
        commit marker (written AFTER both tier writes) makes re-delivery
        a no-op, so checkpoint recovery never double-appends.  (The
        reference's analogue was the SQLite transaction around
        ``executemany``, database_peak_streaming.py:60-63 — correct
        single-node, meaningless across restarts since its buffers died
        with the process.)
        """
        if epoch_id is not None:
            marker = Path(self.root) / "_epochs" / f"{epoch_id}.committed"
            if marker.exists():
                return
        with_date = batch_df.withColumn("date", F.to_date("window_start"))
        # One output file per (date, epoch): without this the window-agg
        # shuffle's partitioning leaks into the sink as hundreds of tiny
        # files per epoch — the classic streaming small-file problem.  At
        # cluster scale, repartition to ceil(epoch_bytes / target_file_size)
        # instead of 1.
        with_date.repartition("date").write.mode("append").partitionBy(
            "date"
        ).parquet(self.st_path)
        self._append_lt(with_date)
        if epoch_id is not None:
            marker = Path(self.root) / "_epochs" / f"{epoch_id}.committed"
            marker.parent.mkdir(parents=True, exist_ok=True)
            marker.touch()

    def _append_lt(self, batch_df: DataFrame) -> None:
        """Per-minute downsample of the epoch (A4, semantic form): keep
        the first window per minute bucket, keyed by any grouping columns
        present.  First = min(window_start) — explicit order, not
        insertion order.

        Idempotent across epochs: minute buckets already present in the
        lt tier are anti-joined away, so a bucket is written exactly once
        no matter how many epochs contribute windows to it.  (Append-mode
        windows arrive in watermark order, so the first epoch touching a
        bucket carries the bucket's earliest window.)
        """
        keys = [c for c in batch_df.columns if c in ("channel", "peak_idx", "event_type")]
        minute = F.window("window_start", self.lt_bucket)
        agg = (
            batch_df.groupBy(minute.alias("w"), *keys)
            .agg(
                F.min("window_start").alias("window_start"),
                *[
                    # value AT the earliest window — min_by, not first():
                    # first() is pick-any under distributed evaluation.
                    F.min_by(c, "window_start").alias(c)
                    for c in batch_df.columns
                    if c not in ("window_start", "date", "channel", "peak_idx", "event_type")
                ],
            )
            .withColumn("minute_start", F.col("w.start"))
            .drop("w")
            .withColumn("date", F.to_date("window_start"))
        )
        if Path(self.lt_path).exists():
            existing = self.spark.read.parquet(self.lt_path).select(
                "minute_start", *keys
            )
            agg = agg.join(existing, on=["minute_start", *keys], how="left_anti")
        agg.write.mode("append").partitionBy("date").parquet(self.lt_path)

    # -- retention (A5): metadata-only partition drop --

    def apply_retention(self, now: dt.datetime) -> list[str]:
        """Drop st date-partitions entirely older than ``st_length_s``.
        Returns dropped partition names.  Filesystem metadata op — the
        scalable analogue of the reference's TTL DELETE
        (database_peak_streaming.py:65-69); the lt tier is never
        touched (retained forever, per the reference design)."""
        cutoff = (now - dt.timedelta(seconds=self.st_length_s)).date()
        dropped = []
        st = Path(self.st_path)
        if not st.exists():
            return dropped
        for part in sorted(st.glob("date=*")):
            date_str = part.name.split("=", 1)[1]
            try:
                part_date = dt.date.fromisoformat(date_str)
            except ValueError:
                continue
            if part_date < cutoff:
                shutil.rmtree(part)
                dropped.append(part.name)
        return dropped

    # -- maintenance: small-file compaction --

    def compact_st(self, target_files_per_date: int = 1) -> dict[str, int]:
        """Rewrite each st date-partition to ``target_files_per_date``
        files (atomic via temp-dir swap).  Streaming sinks accrete one+
        file per epoch; at an hourly epoch cadence that is ~8.8k files
        per partition per year — enough to make scan planning, not IO,
        the bottleneck.  Run out-of-band (the reference had no analogue:
        SQLite pages self-compact, distributed object stores do not).

        Returns {partition: files_before} for partitions rewritten.
        At cluster scale, size target_files to partition_bytes /
        128 MiB instead of a constant.
        """
        import tempfile

        st = Path(self.st_path)
        done: dict[str, int] = {}
        if not st.exists():
            return done
        for part in sorted(st.glob("date=*")):
            files = list(part.glob("*.parquet"))
            if len(files) <= target_files_per_date:
                continue
            df = self.spark.read.parquet(str(part))
            tmp = Path(tempfile.mkdtemp(dir=st, prefix="_compact_"))
            df.coalesce(target_files_per_date).write.mode("overwrite").parquet(
                str(tmp / "data")
            )
            for f in files:
                f.unlink()
            for f in (tmp / "data").glob("*.parquet"):
                f.rename(part / f.name)
            shutil.rmtree(tmp)
            done[part.name] = len(files)
        return done

    # -- reads (S10) --

    def read_st(self) -> DataFrame:
        return self.spark.read.parquet(self.st_path)

    def read_lt(self) -> DataFrame:
        return self.spark.read.parquet(self.lt_path)

    def compat_views(self, num_of_ports: int, num_of_peaks: int) -> None:
        """Recreate the reference's split st_data/st_peak table pair as
        deterministic views over the conformed tier (SURVEY.md §7:
        id-pairing redesign).  id = dense row_number over window_start —
        explicit ordering replaces SQLite autoincrement lockstep."""
        from pyspark.sql import Window

        st = self.read_st()
        w = Window.orderBy("window_start")
        ordered = st.withColumn("id", F.row_number().over(w))
        ordered.select(
            "id",
            F.unix_timestamp("window_start").cast("double").alias("timestamp"),
            *[f"port{i}" for i in range(1, num_of_ports + 1) if f"port{i}" in st.columns],
        ).createOrReplaceTempView("st_data")
        ordered.select(
            "id",
            *[f"peak{i}" for i in range(1, num_of_peaks + 1) if f"peak{i}" in st.columns],
        ).createOrReplaceTempView("st_peak")
