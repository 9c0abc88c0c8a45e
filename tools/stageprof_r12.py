"""Per-stage profile of one registry query: run it once (noop sink) and
print every completed stage's executor run time / CPU time / shuffle
bytes / rows, so the dominant stage is visible without the UI.

Usage: python tools/stageprof_r12.py dedup_minhash_lsh_md5
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "16")
    os.environ.setdefault("SPARK_GRAFT_SCAN_FANOUT", "1")

    from database_peak_streaming_spark import get_spark
    from database_peak_streaming_spark.registry import QUERIES

    spark = get_spark("dps-stageprof")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q1_pricing_summary"](spark, sf_dir).toPandas()  # warm

    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0

    jvm = spark.sparkContext._jvm
    gw = spark.sparkContext._gateway
    store = spark.sparkContext._jsc.sc().statusStore()
    quantiles = gw.new_array(jvm.double, 0)
    empty = jvm.java.util.ArrayList()
    it = store.stageList(
        empty, False, False, quantiles, jvm.java.util.ArrayList()
    ).iterator()
    rows = []
    while it.hasNext():
        s = it.next()
        rows.append(
            (
                s.executorRunTime() / 1000.0,
                s.executorCpuTime() / 1e9,
                s.numCompleteTasks(),
                s.shuffleReadBytes(),
                s.shuffleWriteBytes(),
                s.inputBytes(),
                s.outputBytes(),
                s.stageId(),
                str(s.name())[:110],
            )
        )
    rows.sort(reverse=True)
    print(f"query wall: {wall:.2f}s   stages: {len(rows)}")
    print(f"{'run_s':>8} {'cpu_s':>8} {'tasks':>5} {'shufR':>10} {'shufW':>10} {'input':>10} {'sid':>5}  name")
    for run, cpu, tasks, sr, sw, inp, out, sid, nm in rows[:25]:
        print(f"{run:8.1f} {cpu:8.1f} {tasks:5d} {sr:10d} {sw:10d} {inp:10d} {sid:5d}  {nm}")


if __name__ == "__main__":
    main()
