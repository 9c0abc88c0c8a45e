"""Round-12 equivalence gate: diff the named queries against the DuckDB
oracle at sf0.001 AND sf0.01 (the driver's correctness tiers).

Usage: python tools/verify_r12.py q1_pricing_summary curate_corpus_pipeline
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: verify_r12.py <query> [...]", file=sys.stderr)
        sys.exit(2)
    from database_peak_streaming_spark import get_spark
    from database_peak_streaming_spark.harness.diff import run_suite

    spark = get_spark("dps-verify-r12")
    spark.sparkContext.setLogLevel("ERROR")
    fails = 0
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for r in run_suite(spark, sf_dir, only=names):
            print(sf_dir, r.describe())
            fails += 0 if r.ok else 1
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
