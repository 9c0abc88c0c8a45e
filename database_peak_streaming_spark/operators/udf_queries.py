"""Driver-contract queries exercising the UDF surface and the binary
decode path (SURVEY.md §2B UDF row, §2A S4).

``udf_zscore_by_segment`` runs the Arrow-batched ``applyInPandas`` kernel
and is verified against a pure-SQL window-function oracle — the
vectorized-Python path must agree bit-for-bit (to 1e-6) with the
JVM path.  ``binary_peaks_decode`` decodes deterministic reference-format
frames and is verified against a literal VALUES oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_peak_streaming_spark.sources.batch import load_table


def udf_zscore_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment z-score of customer balances via grouped-map
    applyInPandas (numpy kernel), rounded for cross-engine compare."""
    from database_peak_streaming_spark.functions.udfs import zscore_by_group

    c = load_table(spark, "customer", sf_dir)
    out = zscore_by_group(c, "c_mktsegment", "c_acctbal")
    return (
        out.select(
            "c_custkey", "c_mktsegment", F.round("zscore", 6).alias("zscore")
        )
        .orderBy("c_custkey")
    )


def udf_pandas_log1p(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF vs the built-in it mirrors (both returned — the
    oracle checks the UDF column against DuckDB's ln1p equivalent)."""
    from database_peak_streaming_spark.functions.udfs import log1p_vec

    o = load_table(spark, "orders", sf_dir)
    return (
        o.select(
            "o_orderkey",
            F.round(log1p_vec("o_totalprice"), 6).alias("log1p_udf"),
            F.round(F.log1p("o_totalprice"), 6).alias("log1p_builtin"),
        )
        .orderBy("o_orderkey")
    )


def udf_iter_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series pandas UDF (SCALAR_ITER) — the batch-inference
    shape: per-worker state initializes once, Arrow batches stream
    through it (see functions/udfs.model_score_iter).  Returned beside
    the identical JVM closed form so the oracle pins Python-worker ==
    codegen arithmetic to rounding precision — completing the UDF
    matrix (scalar / grouped / cogrouped / UDTF / mapInArrow /
    mapInPandas / SCALAR_ITER)."""
    from database_peak_streaming_spark.functions.udfs import (
        _MODEL_A,
        _MODEL_B,
        model_score_iter,
    )

    o = load_table(spark, "orders", sf_dir)
    builtin = F.lit(1.0) / (
        F.lit(1.0)
        + F.exp(
            -(F.lit(_MODEL_A) * F.log1p("o_totalprice") + F.lit(_MODEL_B))
        )
    )
    return (
        o.select(
            "o_orderkey",
            F.round(model_score_iter("o_totalprice"), 6).alias("score_udf"),
            F.round(builtin, 6).alias("score_builtin"),
        )
        .orderBy("o_orderkey")
    )


def udf_arrow_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-NATIVE iterator UDF (``mapInArrow``): per-document token
    count computed entirely with ``pyarrow.compute`` kernels — no
    pandas objects anywhere, the zero-copy fast path that completes
    the Python-function matrix (row UDF, vectorized pandas scalar,
    grouped/cogrouped applyInPandas, UDTF, mapInPandas, and now the
    RecordBatch-level Arrow form).  Splitting and list-length run in
    Arrow's C++ kernels; Python only orchestrates batches, so the
    per-row cost matches the JVM expression this mirrors (the oracle
    recomputes the same counts declaratively)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")

    def count_tokens(batches):
        for batch in batches:
            toks = pc.split_pattern(batch.column(1), " ")
            # list_value_length counts ALL split pieces — the same
            # whitespace-split the oracle's string_split performs
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pc.list_value_length(toks).cast(pa.int64())],
                names=["doc_id", "n_tokens"],
            )

    return (
        d.mapInArrow(count_tokens, schema="doc_id long, n_tokens long")
        .orderBy("doc_id")
    )


_FRAME_COUNTS = [2, 0, 3, 1, 0, 0, 0, 0]
_FRAME_WLS = [1500.1, 1500.2, 1510.1, 1510.2, 1510.3, 1520.5]
_N_SCANS = 4


def binary_peaks_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-format binary frames (hyperion.py:432-453 layout)
    synthesized deterministically, decoded via the mapInPandas kernel."""
    from database_peak_streaming_spark.sources.binary import (
        decode_peaks_frames,
        encode_peaks_frame,
    )

    frames = [
        (
            s,
            encode_peaks_frame(
                serial_number=7,
                timestamp_int=1_700_000_000 + s,
                timestamp_frac=0,
                counts=_FRAME_COUNTS,
                wavelengths=[w + s for w in _FRAME_WLS],
            ),
        )
        for s in range(_N_SCANS)
    ]
    df = spark.createDataFrame(frames, "scan long, frame binary")
    return (
        decode_peaks_frames(df, num_channels=8)
        .select(
            "serial_number",
            "ts",
            "channel",
            "peak_idx",
            F.round("wavelength", 4).alias("wavelength"),
        )
        .orderBy("ts", "channel", "peak_idx")
    )


def _binary_oracle_values() -> str:
    rows = []
    for s in range(_N_SCANS):
        epoch = 1_700_000_000 + s
        i = 0
        for ch, n in enumerate(_FRAME_COUNTS, start=1):
            for pk in range(n):
                wl = round(_FRAME_WLS[i] + s, 4)
                rows.append(
                    f"(7, MAKE_TIMESTAMP({epoch}::BIGINT * 1000000), {ch}, {pk}, {wl})"
                )
                i += 1
    return ",\n            ".join(rows)


def udf_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped ``applyInPandas``: purchases and clicks cogrouped per
    user, merged with ``pandas.merge_asof`` inside the Arrow batch — the
    imperative-kernel form of ``join_asof_purchase_click`` (same
    semantics, same SQL oracle), covering the cogroup API the UDF
    surface otherwise lacks.

    Both sides shuffle once on the cogroup key and each user's slices
    arrive sorted to one Python worker — the distributed contract is the
    same as the declarative as-of (one shuffle, per-key locality), with
    the per-key merge in pandas instead of a window.  Prefer the
    declarative form in production (JVM-side, no Python hop); this is
    the pattern to reach for when the per-key logic outgrows SQL."""
    import pandas as pd

    ev = load_table(spark, "events", sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )

    def merge(p: pd.DataFrame, c: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values("ts")
        if c.empty:
            out = p.copy()
            out["last_click_ts"] = pd.NaT
            return out[["event_id", "user_id", "ts", "last_click_ts"]]
        c = c.sort_values("click_ts")
        out = pd.merge_asof(
            p,
            c[["click_ts"]].assign(last_click_ts=c["click_ts"]),
            left_on="ts",
            right_on="click_ts",
            direction="backward",
        )
        return out[["event_id", "user_id", "ts", "last_click_ts"]]

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            merge,
            "event_id long, user_id long, ts timestamp, last_click_ts timestamp",
        )
        # Materialized before the global sort (round 12, guide §2.4):
        # the range exchange's boundary sampling re-executes an
        # unmaterialized child, and here the child is the whole
        # cogrouped Python pass — it ran twice.  Rows are four narrow
        # columns (purchase count volume).
        .localCheckpoint()
        .orderBy("event_id")
    )


def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function) — the one UDF family the
    row/pandas/grouped/cogrouped queries don't cover: one input row
    expands to N output rows INSIDE the SQL FROM clause via LATERAL,
    the idiomatic shape for tokenizers/parsers that emit variable-count
    records per document.

    The splitting rule is deliberately trivial ('. ' boundaries, space-
    trimmed, empties dropped) so a pure-SQL DuckDB oracle can mirror it
    exactly — the query verifies the UDTF *mechanism* (row expansion,
    LATERAL correlation, per-partition iterator lifecycle), not NLP.
    Results aggregate per language so the output is compact.  Scale:
    UDTFs stream Arrow batches through one Python worker per core like
    any pandas UDF; state is one document at a time."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, sentence: string")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            pos = 0
            for part in text.split(". "):
                part = part.strip(" ")
                if part:
                    yield pos, part
                    pos += 1

    spark.udtf.register("dps_sentence_split", SentenceSplit)
    d = load_table(spark, "documents", sf_dir)
    d.createOrReplaceTempView("dps_udtf_docs")
    return spark.sql(
        """
        SELECT lang,
               COUNT(*) AS n_sentences,
               COUNT(DISTINCT doc_id) AS n_docs,
               ROUND(AVG(LENGTH(s.sentence)), 6) AS avg_sentence_len,
               MAX(s.pos) AS max_pos
        FROM dps_udtf_docs,
             LATERAL dps_sentence_split(text) AS s
        GROUP BY lang
        ORDER BY lang
        """
    )


#: trim fraction for the grouped-Arrow trimmed mean (10% each tail)
TRIM_FRAC = 0.1


def udf_arrow_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED Arrow-native UDF (``GroupedData.applyInArrow``, Spark 4):
    per event type, the 10%-trimmed mean of value — the robust location
    estimate that needs whole-group ordering, computed entirely with
    ``pyarrow.compute`` kernels on the group's Arrow table (no pandas
    conversion).  Completes the Arrow half of the Python-function
    matrix: ``mapInArrow`` (streaming batches, udf_arrow_token_count)
    and now the grouped form, mirroring how applyInPandas pairs with
    mapInPandas.

    Determinism contract: the trim ranks on (value, event_id) — a
    TOTAL order — and drops exactly floor(n * 0.1) rows per tail, so
    the surviving multiset is identical in both engines; the mean
    itself is a float sum (pyarrow sums in array order, DuckDB in scan
    order), so the output is rounded to 6dp like every float-sum
    boundary here.

    Scale: one shuffle on the group key; per-group memory is the
    group's Arrow buffer (the applyInPandas contract) — groups are the
    parallelism unit, fine for type-cardinality keys, and the trim is
    O(n log n) in C++ per group."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ev = load_table(spark, "events", sf_dir).select(
        "event_type", "event_id", "value"
    )

    def trimmed(table: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            table,
            sort_keys=[("value", "ascending"), ("event_id", "ascending")],
        )
        n = table.num_rows
        k = int(n * TRIM_FRAC)
        kept = table.take(idx.slice(k, n - 2 * k))
        return pa.table(
            {
                "event_type": [table.column("event_type")[0].as_py()],
                "n_events": pa.array([n], pa.int64()),
                "n_trimmed": pa.array([2 * k], pa.int64()),
                "trimmed_mean": pa.array(
                    [
                        round(
                            pc.mean(kept.column("value")).as_py() or 0.0, 6
                        )
                    ],
                    pa.float64(),
                ),
            }
        )

    return (
        ev.groupBy("event_type")
        .applyInArrow(
            trimmed,
            schema=(
                "event_type string, n_events long, n_trimmed long, "
                "trimmed_mean double"
            ),
        )
        .orderBy("event_type")
    )


def udf_arrow_optimized_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-OPTIMIZED Python UDF (``F.udf(..., useArrow=True)``,
    Spark 3.5+) — the remaining cell of the Python UDF matrix: the
    row-at-a-time ``def f(x) -> y`` AUTHORING model with Arrow batch
    TRANSFER, for logic that resists vectorization (branchy per-row
    code) but shouldn't pay pickle serialization.  Still slower than a
    true pandas UDF (the Python-level per-row call remains), which is
    why the vectorized twin stays the hot-path recommendation — this
    row exists because real codebases have per-row functions that get
    this decorator as the cheap first migration step.

    The identical JVM closed form is returned beside it so the oracle
    pins Python-row == codegen to the 6dp grid."""
    import math

    @F.udf("double", useArrow=True)
    def sigmoid_arrow(x: float) -> float:
        return 1.0 / (1.0 + math.exp(-x / 100000.0))

    o = load_table(spark, "orders", sf_dir)
    return (
        o.select(
            "o_orderkey",
            F.round(sigmoid_arrow("o_totalprice"), 6).alias("sigmoid_udf"),
            F.round(
                1.0 / (1.0 + F.exp(-F.col("o_totalprice") / 100000.0)), 6
            ).alias("sigmoid_builtin"),
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


QUERIES = {
    "udf_arrow_group_stats": udf_arrow_group_stats,
    "udf_arrow_optimized_scalar": udf_arrow_optimized_scalar,
    "udf_zscore_by_segment": udf_zscore_by_segment,
    "udf_arrow_token_count": udf_arrow_token_count,
    "udf_pandas_log1p": udf_pandas_log1p,
    "udf_iter_model_score": udf_iter_model_score,
    "binary_peaks_decode": binary_peaks_decode,
    "udf_cogroup_asof": udf_cogroup_asof,
    "udtf_sentence_split": udtf_sentence_split,
}

ORACLE_SQL = {
    "udf_arrow_token_count": """
        SELECT doc_id,
               CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
        ORDER BY doc_id
    """,
    "udtf_sentence_split": """
        WITH raw AS (
            SELECT doc_id, lang,
                   unnest(string_split(text, '. ')) AS part,
                   generate_subscripts(string_split(text, '. '), 1) AS i
            FROM documents),
        kept AS (
            SELECT doc_id, lang, trim(part, ' ') AS sentence,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) - 1
                       AS pos
            FROM raw WHERE trim(part, ' ') <> '')
        SELECT lang,
               COUNT(*) AS n_sentences,
               COUNT(DISTINCT doc_id) AS n_docs,
               ROUND(AVG(LENGTH(sentence)), 6) AS avg_sentence_len,
               CAST(MAX(pos) AS INT) AS max_pos
        FROM kept
        GROUP BY lang
        ORDER BY lang
    """,
    "udf_cogroup_asof": """
        SELECT p.event_id, p.user_id, p.ts, MAX(c.click_ts) AS last_click_ts
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT user_id AS c_user_id, ts AS click_ts FROM events
                   WHERE event_type = 'click') c
          ON p.user_id = c.c_user_id AND c.click_ts <= p.ts
        GROUP BY p.event_id, p.user_id, p.ts
        ORDER BY p.event_id
    """,
    "udf_zscore_by_segment": """
        SELECT c_custkey, c_mktsegment,
               ROUND((c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_mktsegment))
                     / STDDEV_SAMP(c_acctbal) OVER (PARTITION BY c_mktsegment),
                     6) AS zscore
        FROM customer ORDER BY c_custkey
    """,
    "udf_pandas_log1p": """
        SELECT o_orderkey,
               ROUND(LN(1 + o_totalprice), 6) AS log1p_udf,
               ROUND(LN(1 + o_totalprice), 6) AS log1p_builtin
        FROM orders ORDER BY o_orderkey
    """,
    "udf_iter_model_score": """
        SELECT o_orderkey,
               ROUND(1.0 / (1.0 + EXP(-(0.35 * LN(1 + o_totalprice)
                                        + (-2.0)))), 6) AS score_udf,
               ROUND(1.0 / (1.0 + EXP(-(0.35 * LN(1 + o_totalprice)
                                        + (-2.0)))), 6) AS score_builtin
        FROM orders ORDER BY o_orderkey
    """,
    "binary_peaks_decode": f"""
        SELECT * FROM (VALUES
            {_binary_oracle_values()}
        ) AS t(serial_number, ts, channel, peak_idx, wavelength)
        ORDER BY ts, channel, peak_idx
    """,
}

ORACLE_SQL["udf_arrow_group_stats"] = """
    WITH ranked AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events)
    SELECT event_type,
           CAST(ANY_VALUE(n) AS BIGINT) AS n_events,
           CAST(2 * FLOOR(ANY_VALUE(n) * 0.1) AS BIGINT) AS n_trimmed,
           ROUND(AVG(CASE WHEN rn > FLOOR(n * 0.1)
                           AND rn <= n - FLOOR(n * 0.1)
                          THEN value END), 6) AS trimmed_mean
    FROM ranked
    GROUP BY event_type
    ORDER BY event_type
"""

ORACLE_SQL["udf_arrow_optimized_scalar"] = """
    SELECT o_orderkey,
           ROUND(1.0 / (1.0 + EXP(-o_totalprice / 100000.0)), 6)
               AS sigmoid_udf,
           ROUND(1.0 / (1.0 + EXP(-o_totalprice / 100000.0)), 6)
               AS sigmoid_builtin
    FROM orders ORDER BY o_orderkey LIMIT 500
"""
