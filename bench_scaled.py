"""Scaled bench point: build a 10x copy of the sf0.1 fixtures (~sf1) and
run the headline comparable set on Spark AND its DuckDB oracles at both
scales, so the per-query ratio is measured where data volume — not
Spark's fixed ~0.5 s per-query floor — dominates.  This is the
crossover evidence bench.py's single-scale run cannot show (VERDICT.md
round 1: "add an sf1 bench point ... show the crossover").

Scaling preserves join integrity and per-block density:

* fact/dim copies get key offsets (orderkey/custkey/partkey/suppkey/
  event_id/user_id/doc_id/vec_id shifted by copy * ceil(max+1)), so
  every join key resolves exactly once and selectivities are unchanged;
* bounded dims (region, nation) are NOT duplicated — they are bounded
  in the real schema too;
* documents/embeddings copies get a per-copy ``source``/``label``
  suffix: dedup blocks multiply in COUNT but keep their size, so the
  near-dup pair volume scales linearly (as a sharded corpus would),
  not quadratically (as naive row duplication would).

Writes parquet under .bench_scaled/ (gitignored) once and reuses it.
Output: one JSON line {sf0.1: {...}, scaled: {...}, scale_factor}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))
OUT = Path(__file__).parent / ".bench_scaled"

#: (table, [key columns to offset], [block columns to suffix])
SCALED_TABLES = {
    "customer": (["c_custkey"], []),
    "orders": (["o_orderkey", "o_custkey"], []),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], []),
    "part": (["p_partkey"], []),
    "supplier": (["s_suppkey"], []),
    "events": (["event_id", "user_id"], []),
    "documents": (["doc_id"], ["source"]),
    "embeddings": (["vec_id"], ["label"]),
}
BOUNDED_TABLES = ["region", "nation"]

#: comparable headline subset — one per plan family, all oracled
QUERY_SET = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q18_large_volume_customers",
    "join_asof_purchase_click",
    "win_topk_per_group",
    "window_session_30m",
    "dedup_exact_hash",
    "dedup_ngram_jaccard",
    "text_quality_score",
    "cosine_topk_bruteforce",
    "curate_corpus_pipeline",
]


def build_scaled(spark) -> None:
    from pyspark.sql import functions as F

    from database_peak_streaming_spark.sources.batch import load_table

    OUT.mkdir(exist_ok=True)
    for t in BOUNDED_TABLES:
        dst = OUT / f"{t}.parquet"
        if not dst.exists():
            shutil.copy(Path(BASE) / f"{t}.parquet", dst)
    for t, (keys, blocks) in SCALED_TABLES.items():
        dst = OUT / f"{t}.parquet"
        if dst.exists():
            continue
        df = load_table(spark, t, BASE)
        offsets = {k: df.agg(F.max(k)).first()[0] + 1 for k in keys}
        copies = []
        for i in range(COPIES):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * offsets[k]))
            for b in blocks:
                c = c.withColumn(b, F.concat(F.col(b), F.lit(f"_c{i}")))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        # one staging write; partition count follows the union
        out.write.mode("overwrite").parquet(str(dst))


def time_set(spark, sf_dir: str) -> dict:
    from database_peak_streaming_spark.harness.diff import oracle_connection
    from database_peak_streaming_spark.registry import ORACLE_SQL, QUERIES

    spark_t: dict[str, float] = {}
    for name in QUERY_SET:
        fn = QUERIES[name]
        fn(spark, sf_dir).count()  # warm (footers, codegen)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            best = min(best, time.perf_counter() - t0)
        spark_t[name] = round(best, 3)
    duck_t: dict[str, float] = {}
    con = oracle_connection(sf_dir)
    for name in QUERY_SET:
        sql = ORACLE_SQL[name]
        t0 = time.perf_counter()
        con.sql(sql).fetchall()
        duck_t[name] = round(time.perf_counter() - t0, 3)
    ratios = {n: round(spark_t[n] / max(duck_t[n], 1e-4), 2) for n in QUERY_SET}
    return {
        "spark": spark_t,
        "duckdb": duck_t,
        "ratio": ratios,
        "spark_total": round(sum(spark_t.values()), 2),
        "duckdb_total": round(sum(duck_t.values()), 2),
        "ratio_total": round(sum(spark_t.values()) / sum(duck_t.values()), 2),
    }


def main() -> None:
    from database_peak_streaming_spark import get_spark

    spark = get_spark("dps-bench-scaled")
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled(spark)
    out = {
        "metric": "scaled_crossover",
        "copies": COPIES,
        "base": time_set(spark, BASE),
        "scaled": time_set(spark, str(OUT)),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
