"""Round-12 optimization profiler: time a subset of registry queries
with the bench's session/protocol (min-of-N fresh plans, warmed JVM),
print per-query walls + the box floor probe, and optionally dump
``explain('formatted')`` to plans/r12/.

Usage:
    python tools/prof_r12.py q1_pricing_summary curate_corpus_pipeline
    python tools/prof_r12.py --plans before q1_pricing_summary
    python tools/prof_r12.py --runs 5 --noop bootstrap_ci_mean

--noop times ``df.write.format('noop')`` instead of toPandas (guide
section 1.4) to isolate compute from the Arrow collect.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--plans", default=None, help="suffix: dump plans/r12/<q>_<suffix>.txt")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "16")
    os.environ.setdefault("SPARK_GRAFT_SCAN_FANOUT", "1")

    from database_peak_streaming_spark import get_spark
    from database_peak_streaming_spark.registry import QUERIES
    from database_peak_streaming_spark.sources.batch import load_table

    spark = get_spark("dps-prof-r12")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up (bench.py protocol)
    QUERIES["q1_pricing_summary"](spark, args.sf_dir).toPandas()
    from pyspark.sql import functions as _F

    from database_peak_streaming_spark.functions.udfs import log1p_vec

    spark.range(1000).repartition(32).select(
        log1p_vec(_F.col("id").cast("double"))
    ).count()

    def floor_probe() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            load_table(spark, "region", args.sf_dir).select("r_name").toPandas()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    out = {"floor_pre": floor_probe(), "queries": {}}
    for name in args.names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"prof:{name}")
        best = float("inf")
        walls = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.toPandas()
            wall = time.perf_counter() - t0
            walls.append(round(wall, 3))
            best = min(best, wall)
        out["queries"][name] = {"best": round(best, 4), "walls": walls}
        if args.plans:
            plan = fn(spark, args.sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "plans", "r12", f"{name}_{args.plans}.txt",
            )
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(None)
    out["floor_post"] = floor_probe()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
