"""Paired A/B timing for round-12 optimizations on a noisy box.

Loads the OLD version of an operator module from ``git show HEAD:<path>``
under a throwaway module name, the NEW version from the working tree, and
runs the named queries interleaved (old, new, old, new, ...).  Because
host-neighbor contention arrives in waves much longer than one run,
PAIRED ratios (new/old within one iteration) are robust where absolute
walls are garbage.  Reports per-pair walls, per-pair ratios, min walls,
and the median ratio.

Usage:
    python tools/ab_r12.py operators/sampling.py bootstrap_ci_mean [more names]
"""

from __future__ import annotations

import importlib.util
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
PKG = "database_peak_streaming_spark"


def load_old(rel: str):
    ref = os.environ.get("AB_REF", "HEAD")
    src = subprocess.run(
        ["git", "-C", REPO, "show", f"{ref}:{PKG}/{rel}"],
        check=True,
        capture_output=True,
        text=True,
    ).stdout
    name = "_old_" + rel.replace("/", "_").removesuffix(".py")
    path = f"/tmp/{name}.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    rel = sys.argv[1]
    names = sys.argv[2:]
    pairs = int(os.environ.get("AB_PAIRS", "5"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "16")
    os.environ.setdefault("SPARK_GRAFT_SCAN_FANOUT", "1")

    import importlib

    new_mod = importlib.import_module(
        PKG + "." + rel.replace("/", ".").removesuffix(".py")
    )
    old_mod = load_old(rel)

    from database_peak_streaming_spark import get_spark

    spark = get_spark("dps-ab-r12")
    spark.sparkContext.setLogLevel("ERROR")

    status = spark.sparkContext._jsc.sc().statusStore()

    def cpu_ms() -> float:
        """Total executor CPU nanoseconds across all completed stages —
        co-tenant steal time does not count, so this is the noise-robust
        comparator on a loud box (wall stays the tie-breaker)."""
        total = 0
        jvm = spark.sparkContext._jvm
        gw = spark.sparkContext._gateway
        empty = jvm.java.util.ArrayList()
        quantiles = gw.new_array(jvm.double, 0)
        it = status.stageList(
            empty, False, False, quantiles, jvm.java.util.ArrayList()
        ).iterator()
        while it.hasNext():
            s = it.next()
            total += s.executorCpuTime()
        return total / 1e6
    from database_peak_streaming_spark.registry import QUERIES

    QUERIES["q1_pricing_summary"](spark, sf_dir).toPandas()  # warm

    out = {}
    for name in names:
        old_fn = getattr(old_mod, name)
        new_fn = getattr(new_mod, name)
        # warm both plans once (codegen cache, scan cache)
        old_fn(spark, sf_dir).toPandas()
        new_fn(spark, sf_dir).toPandas()
        rows = []
        cpu_old: list[float] = []
        cpu_new: list[float] = []
        for _ in range(pairs):
            c0 = cpu_ms()
            t0 = time.perf_counter()
            old_fn(spark, sf_dir).toPandas()
            t_old = time.perf_counter() - t0
            c1 = cpu_ms()
            t0 = time.perf_counter()
            new_fn(spark, sf_dir).toPandas()
            t_new = time.perf_counter() - t0
            c2 = cpu_ms()
            cpu_old.append(c1 - c0)
            cpu_new.append(c2 - c1)
            rows.append((round(t_old, 3), round(t_new, 3), round(t_new / t_old, 3)))
        out[name] = {
            "pairs": rows,
            "min_old": min(r[0] for r in rows),
            "min_new": min(r[1] for r in rows),
            "median_ratio": round(statistics.median(r[2] for r in rows), 3),
            "cpu_old_ms": round(statistics.median(cpu_old), 1),
            "cpu_new_ms": round(statistics.median(cpu_new), 1),
            "cpu_ratio": round(
                statistics.median(cpu_new) / max(statistics.median(cpu_old), 1e-9), 3
            ),
        }
        print(name, json.dumps(out[name]), flush=True)


if __name__ == "__main__":
    main()
