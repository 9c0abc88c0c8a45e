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
        a crash the same epoch_id can be re-delivered.  Three layers make
        the retry a no-op end to end:

        * commit marker (written LAST): a fully-committed epoch returns
          immediately on re-delivery;
        * idempotent st publish: the epoch is staged into a private
          ``_epochs/stage_<id>`` dir and published by renaming files into
          the date partitions under epoch-tagged names
          (``epoch-<id>-*.parquet``).  A retry first unlinks any files
          bearing this epoch's tag — so a crash ANYWHERE between staging
          and marker (including mid-publish) re-delivers into a clean
          slate instead of double-appending;
        * idempotent lt fold: minute buckets already in the lt tier are
          anti-joined away (:meth:`_append_lt`).

        (The reference's analogue was the SQLite transaction around
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
        sized = with_date.repartition("date")
        if epoch_id is None:
            # ad-hoc batch append: no retry semantics requested
            sized.write.mode("append").partitionBy("date").parquet(self.st_path)
        else:
            self._publish_st_epoch(sized, epoch_id)
        self._append_lt(with_date)
        if epoch_id is not None:
            marker = Path(self.root) / "_epochs" / f"{epoch_id}.committed"
            marker.parent.mkdir(parents=True, exist_ok=True)
            marker.touch()

    def _publish_st_epoch(self, sized: DataFrame, epoch_id: int) -> None:
        """Stage-then-rename st append, idempotent under re-delivery: any
        partial output of a previous attempt (identified by the epoch tag
        in the filename) is removed before publishing, and each staged
        file moves into its partition with an atomic per-file rename.
        On an object store, swap the rename for a conditional put keyed
        by the same epoch-tagged name — the tag, not the rename, is what
        carries the idempotence."""
        st = Path(self.st_path)
        if st.exists():
            for stale in st.glob(f"date=*/epoch-{epoch_id}-*.parquet"):
                stale.unlink()
        stage = Path(self.root) / "_epochs" / f"stage_{epoch_id}"
        if stage.exists():
            shutil.rmtree(stage)
        sized.write.mode("overwrite").partitionBy("date").parquet(str(stage))
        for i, f in enumerate(sorted(stage.glob("date=*/*.parquet"))):
            dest_dir = st / f.parent.name
            dest_dir.mkdir(parents=True, exist_ok=True)
            f.rename(dest_dir / f"epoch-{epoch_id}-{i}.parquet")
        shutil.rmtree(stage)

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
        keys = [c for c in batch_df.columns if c in ("channel", "peak_idx", "point_idx", "sensor_idx", "event_type")]
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
                    if c not in ("window_start", "date", "channel", "peak_idx", "point_idx", "sensor_idx", "event_type")
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

    def compact_st(
        self,
        target_files_per_date: int | None = None,
        target_file_bytes: int = 128 << 20,
    ) -> dict[str, int]:
        """Rewrite each st date-partition down to its target file count
        via a crash-safe directory swap.  With ``target_files_per_date``
        unset, the target is sized per partition from its actual bytes —
        ``ceil(partition_bytes / target_file_bytes)`` with a 128 MiB
        default file size — so a year of hourly epochs compacts to
        scan-efficient files whether the partition holds 10 MB or 10 TB;
        pass an explicit count to pin it (tests do).  Streaming sinks
        accrete one+ file per epoch; at an hourly epoch cadence that is
        ~8.8k files per partition per year — enough to make scan
        planning, not IO, the bottleneck.  Run out-of-band (the
        reference had no analogue: SQLite pages self-compact,
        distributed object stores do not).

        Swap protocol per partition (old data is never unlinked before
        the replacement is fully in place):

        1. write compacted files to ``_compact_tmp_<part>``;
        2. rename the live partition to ``_compact_trash_<part>``;
        3. rename the tmp dir to the live partition name;
        4. delete the trash dir.

        A crash leaves either the original partition intact (before 2)
        or a recoverable trash/tmp pair; :meth:`_recover_compaction`
        (run first on every call) rolls the swap forward or back.  Spark
        ignores ``_``-prefixed directories, so readers never see
        doubled data; between steps 2-3 a concurrent reader can miss the
        partition, so run compaction against a quiesced sink or behind a
        table-format commit (Delta/Iceberg) when readers are live.

        Returns {partition: files_before} for partitions rewritten.
        """
        import math

        st = Path(self.st_path)
        done: dict[str, int] = {}
        if not st.exists():
            return done
        self._recover_compaction()
        for part in sorted(st.glob("date=*")):
            files = list(part.glob("*.parquet"))
            if target_files_per_date is None:
                part_bytes = sum(f.stat().st_size for f in files)
                target = max(1, math.ceil(part_bytes / target_file_bytes))
            else:
                target = target_files_per_date
            if len(files) <= target:
                continue
            df = self.spark.read.parquet(str(part))
            tmp = st / f"_compact_tmp_{part.name}"
            trash = st / f"_compact_trash_{part.name}"
            if tmp.exists():
                shutil.rmtree(tmp)
            df.coalesce(target).write.mode("overwrite").parquet(str(tmp))
            part.rename(trash)
            tmp.rename(part)
            shutil.rmtree(trash)
            done[part.name] = len(files)
        return done

    def _recover_compaction(self) -> None:
        """Roll an interrupted ``compact_st`` swap forward or back: a
        trash dir whose live partition is missing is restored (crash
        between swap steps 2-3); any other ``_compact_*`` leftover is
        incomplete work and is discarded (the live partition still holds
        the data)."""
        st = Path(self.st_path)
        for trash in st.glob("_compact_trash_*"):
            live = st / trash.name.removeprefix("_compact_trash_")
            if not live.exists():
                trash.rename(live)
            else:
                shutil.rmtree(trash)
        for tmp in st.glob("_compact_tmp_*"):
            shutil.rmtree(tmp)

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
