"""Capture .explain("formatted") for queries, optionally the AB_REF (pre-
optimization, default HEAD) version of the operator module, into plans/r13/.

Usage:
    python tools/plan_r13.py after  <query> [...]
    python tools/plan_r13.py before <operators/file.py> <query> [...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def explain_str(df) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


def main() -> None:
    kind = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "16")
    os.environ.setdefault("SPARK_GRAFT_SCAN_FANOUT", "1")
    from database_peak_streaming_spark import get_spark

    spark = get_spark("dps-plan-r13")
    spark.sparkContext.setLogLevel("ERROR")
    if kind == "before":
        rel, names = sys.argv[2], sys.argv[3:]
        sys.path.insert(0, os.path.join(REPO, "tools"))
        from ab_r12 import load_old

        mod = load_old(rel)
        fns = {n: getattr(mod, n) for n in names}
    else:
        names = sys.argv[2:]
        from database_peak_streaming_spark.registry import QUERIES

        fns = {n: QUERIES[n] for n in names}
    os.makedirs(os.path.join(REPO, "plans", "r13"), exist_ok=True)
    for n, fn in fns.items():
        out = os.path.join(REPO, "plans", "r13", f"{n}_{kind}.txt")
        with open(out, "w") as f:
            f.write(explain_str(fn(spark, sf_dir)))
        print("wrote", out)


if __name__ == "__main__":
    main()
