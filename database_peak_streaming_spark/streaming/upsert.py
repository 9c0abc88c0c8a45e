"""Keyed upsert store: incremental view maintenance with snapshot
isolation and time travel on plain parquet (SURVEY.md §2B scan/sink +
streaming rows; the streaming twin of operators/storage.merge_upsert_scd1).

A ``foreachBatch`` sink that MERGEs each micro-batch into a keyed state
table the copy-on-write way — what "MERGE INTO + streaming" means
without a table format:

* every committed epoch is a complete immutable snapshot directory
  (``v_<epoch>/``) — copy-on-write, so readers never observe a
  half-merged table;
* a ``_latest`` pointer file names the committed snapshot and is
  published LAST via atomic rename — the pointer flip IS the commit
  (single-file snapshot isolation, the same trick table formats play
  with their log tip);
* re-delivery of an epoch <= the committed pointer is a no-op, and a
  crash anywhere before the pointer flip leaves the previous snapshot
  intact — the retry re-merges from it (exactly-once state under
  ``foreachBatch``'s at-least-once contract);
* retained snapshots ARE time travel: ``read_version(v)`` reads any
  snapshot still on disk; ``prune(keep)`` bounds storage.

Scale: each merge is one full-outer join keyed on the state key — at
100 TB you partition the snapshot by key-hash bucket so an epoch
rewrites only the buckets its batch touches (the tiering module's
date-partition pattern, applied to hash buckets); the pointer-flip
commit is unchanged.  On an object store the rename becomes a
conditional put of the pointer object.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class KeyedUpsertStore:
    """Per-key latest state, maintained incrementally by mergeable
    aggregates: ``n_events`` sums, ``last_ts``/``last_value`` take the
    later timestamp's value, column-wise."""

    def __init__(self, spark: SparkSession, root: str, key_col: str = "user_id"):
        self.spark = spark
        self.root = root
        self.key = key_col
        Path(root).mkdir(parents=True, exist_ok=True)

    # -- commit protocol --------------------------------------------------

    @property
    def _pointer(self) -> Path:
        return Path(self.root) / "_latest"

    def committed_version(self) -> int | None:
        try:
            return int(self._pointer.read_text())
        except (FileNotFoundError, ValueError):
            return None

    def _snapshot_path(self, version: int) -> str:
        return os.path.join(self.root, f"v_{version}")

    def _commit(self, version: int) -> None:
        tmp = self._pointer.with_suffix(".tmp")
        tmp.write_text(str(version))
        tmp.rename(self._pointer)  # atomic: the flip is the commit

    # -- merge ------------------------------------------------------------

    @staticmethod
    def summarize_batch(batch_df: DataFrame, key: str) -> DataFrame:
        """Collapse a raw-event micro-batch to one mergeable row per key."""
        return batch_df.groupBy(key).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max_by("value", "ts").alias("last_value"),
            F.max("ts").alias("last_ts"),
        )

    def upsert_epoch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """MERGE one micro-batch into the state table, exactly once.

        Re-delivered epochs (epoch_id <= committed pointer) return
        immediately; a partially-written snapshot from a crashed attempt
        is overwritten before the pointer ever names it."""
        committed = self.committed_version()
        if committed is not None and epoch_id <= committed:
            return
        delta = self.summarize_batch(batch_df, self.key)
        if committed is None:
            merged = delta
        else:
            cur = self.spark.read.parquet(self._snapshot_path(committed))
            c, d = cur.alias("c"), delta.alias("d")
            newer = F.col("d.last_ts") >= F.col("c.last_ts")
            merged = c.join(d, self.key, "full_outer").select(
                F.col(self.key),
                (
                    F.coalesce(F.col("c.n_events"), F.lit(0))
                    + F.coalesce(F.col("d.n_events"), F.lit(0))
                ).alias("n_events"),
                F.when(
                    F.col("c.last_ts").isNull() | newer, F.col("d.last_value")
                )
                .otherwise(F.col("c.last_value"))
                .alias("last_value"),
                F.greatest(F.col("c.last_ts"), F.col("d.last_ts")).alias(
                    "last_ts"
                ),
            )
        snap = self._snapshot_path(epoch_id)
        shutil.rmtree(snap, ignore_errors=True)  # clear a crashed attempt
        merged.write.mode("overwrite").parquet(snap)
        self._commit(epoch_id)

    def foreach_batch(self):
        """The writeStream.foreachBatch callable."""

        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            self.upsert_epoch(batch_df, epoch_id)

        return fn

    # -- reads ------------------------------------------------------------

    def read_latest(self) -> DataFrame:
        v = self.committed_version()
        if v is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        return self.read_version(v)

    def read_version(self, version: int) -> DataFrame:
        """Time travel: read any retained snapshot."""
        path = self._snapshot_path(version)
        if not os.path.isdir(path):
            raise FileNotFoundError(f"snapshot v_{version} not retained")
        return self.spark.read.parquet(path)

    def versions(self) -> list[int]:
        return sorted(
            int(p.name[2:])
            for p in Path(self.root).glob("v_*")
            if p.name[2:].isdigit()
        )

    def prune(self, keep: int = 3) -> list[int]:
        """Drop all but the newest ``keep`` snapshots (never the
        committed one).  Returns the dropped versions."""
        committed = self.committed_version()
        candidates = [v for v in self.versions() if v != committed]
        drop = candidates[: max(0, len(candidates) - (keep - 1))]
        for v in drop:
            shutil.rmtree(self._snapshot_path(v), ignore_errors=True)
        return drop
