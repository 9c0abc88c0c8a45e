"""Round-12 full-registry timing sweep: one timed noop-sink wall per
registered query (after a shared warmup), sorted by wall, to surface
heavy queries OUTSIDE the headline set that no bench ever timed.

Not a bench (single run, shared session, no fresh-plan protocol) — a
triage tool to rank where optimization time should go next.

Usage:
    python tools/sweep_r12.py                 # all registry names
    python tools/sweep_r12.py --min-sec 1.0   # only print walls >= 1s
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
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--min-sec", type=float, default=0.0)
    ap.add_argument("--out", default=".bench_logs/sweep_r12.json")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "16")
    os.environ.setdefault("SPARK_GRAFT_SCAN_FANOUT", "1")

    from database_peak_streaming_spark import get_spark
    from database_peak_streaming_spark.registry import QUERIES

    spark = get_spark("dps-sweep-r12")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM / parquet footers once.
    QUERIES["q1_pricing_summary"](spark, args.sf_dir).toPandas()

    walls: dict[str, float] = {}
    errs: dict[str, str] = {}
    for name, fn in QUERIES.items():
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        t0 = time.monotonic()
        try:
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            walls[name] = round(time.monotonic() - t0, 3)
        except Exception as e:  # noqa: BLE001 — triage tool, record and move on
            errs[name] = f"{type(e).__name__}: {e}"[:300]
        print(f"{walls.get(name, -1):8.3f}  {name}", flush=True)
    spark.sparkContext.setJobDescription(None)

    with open(args.out, "w") as f:
        json.dump({"sf_dir": args.sf_dir, "walls": walls, "errs": errs}, f, indent=1, sort_keys=True)

    print("\n=== slowest ===")
    for name, w in sorted(walls.items(), key=lambda kv: -kv[1]):
        if w < args.min_sec:
            break
        print(f"{w:8.3f}  {name}")
    if errs:
        print("\n=== errors ===")
        for name, e in errs.items():
            print(name, e)


if __name__ == "__main__":
    main()
