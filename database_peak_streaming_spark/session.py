"""SparkSession bootstrap with scale-oriented defaults.

The session config is the first "physical design" decision of the engine
(SURVEY.md §4): we rely on Catalyst + AQE for plan quality, so the job of
this module is to switch the right engine features on and size the few
knobs that matter at both test scale (local[32]) and the 100 TB design
point (1000 executors):

* AQE on (runtime coalescing of shuffle partitions, skew-join splitting,
  dynamic join-strategy downgrade to broadcast) — this is what makes one
  static ``spark.sql.shuffle.partitions`` setting survive a 1000x data
  scale-up: we set a generous upper bound and let AQE coalesce down.
* Arrow on for every pandas interchange (pandas UDFs, toPandas) — the
  reference's zero-copy ``np.frombuffer`` decode path maps to Arrow
  batches here.
* Session timezone pinned to UTC so event-time semantics are
  reproducible and oracle-comparable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Upper bound for shuffle parallelism. AQE coalesces small shuffles below
# this at runtime, so the value only needs to be "enough tasks to spread
# the largest shuffle" — on a real cluster set ~2-3x total cores via
# SPARK_GRAFT_SHUFFLE_PARTITIONS; locally 64 keeps task overhead low.
_DEFAULT_SHUFFLE_PARTITIONS = 64


def get_spark(app_name: str = "database-peak-streaming-spark") -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism so the bench driver
    can pin core count.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle = os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", str(_DEFAULT_SHUFFLE_PARTITIONS)
    )
    # (Round 12 probed raising
    # spark.sql.adaptive.coalescePartitions.initialPartitionNum to 64
    # session-wide so GB-scale exchanges fan out past a low shuffle
    # width: the full headline bench regressed 63.3 -> 71.6 s — median
    # per-query 1.12x — because the floor-bound tail pays for the extra
    # pre-coalesce tasks.  Compute-heavy/byte-light exchanges instead
    # get targeted explicit repartitions at their sites.)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # --- determinism / correctness ---
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet ns timestamps (events.ts) land as us; exact because the
        # fixtures carry no sub-us precision (verified in tests).
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        # --- adaptive execution: the scale story ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle)
        # --- IO sizing: 128 MiB splits keep scan tasks uniform at any SF ---
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # --- python interchange: always Arrow ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Broadcast threshold: dims (region/nation/supplier/part) stay
        # broadcastable well past sf100; fact-fact joins shuffle.
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
