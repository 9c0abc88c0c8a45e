"""Registry-order contract: external drivers oracle-check a bounded
prefix of the registry (the first 50 names in iteration order).  The
prefix ROTATES per round (round 3 VERDICT: make each round's checked
set disjoint from the last so the union converges on the full
registry), so the coverage contract is on the UNION of the windows
already driver-verified plus the current prefix.

The historical windows are derived from the committed
``CORRECTNESS_r0*.json`` artifacts — what the driver ACTUALLY checked —
not from a hand-maintained copy that could drift (round-4 ADVICE).
"""

from __future__ import annotations

import json
import pathlib

from database_peak_streaming_spark import registry

CHECK_WINDOW = 50

_ROOT = pathlib.Path(__file__).resolve().parents[1]

#: Queries whose output is seeded by an engine-specific hash
#: (xxhash64 minhash signatures / random-permutation band ids) and so
#: cannot be value-hash-compared with a DuckDB recompute.  Each is
#: rows-gated by the driver AND hash-gated through its paired
#: ``check_*`` invariant query (operators/checks.py), which IS fully
#: oracled and driver-green.
ROWS_ONLY_WITH_CHECK_GATE = {
    "dedup_minhash_lsh": "check_dedup_minhash_lsh",
    "dedup_minhash_keepers": "check_dedup_minhash_keepers",
    "dedup_clusters_cc_lsh": "check_dedup_clusters_cc_lsh",
    "curate_corpus_pipeline_lsh": "check_curate_corpus_pipeline_lsh",
}


def _driver_checked_union() -> set[str]:
    """Every query name the round driver has hash/rows-checked, from the
    committed per-round artifacts."""
    union: set[str] = set()
    for f in sorted(_ROOT.glob("CORRECTNESS_r0*.json")):
        union |= set(json.load(open(f)).keys())
    return union


def test_priority_is_the_registry_prefix():
    assert list(registry.QUERIES)[: len(registry._PRIORITY)] == registry._PRIORITY
    assert len(registry._PRIORITY) == CHECK_WINDOW


def test_priority_names_unique():
    assert len(set(registry._PRIORITY)) == len(registry._PRIORITY)


def test_window_completes_driver_coverage():
    """Round-5 contract: the current prefix must contain EVERY query the
    driver had never checked as of round 4 — the window's 50 slots are
    consumed by those 47 names + 3 plan-changed re-checks, so queries
    ADDED after the window filled overflow into the pinned
    ``ROTATION_POOL_NEXT_ROUND`` (each local-gated until round 6).  Any
    other overflow is a coverage regression."""
    union = _driver_checked_union()
    window = set(list(registry.QUERIES)[:CHECK_WINDOW])
    never = {n for n in registry._ALL_QUERIES if n not in union}
    missing = never - window
    assert missing == set(registry.ROTATION_POOL_NEXT_ROUND), (
        "never-driver-checked queries outside the window must be exactly "
        f"the pinned next-round rotation pool; unexpected: "
        f"{sorted(missing ^ set(registry.ROTATION_POOL_NEXT_ROUND))}"
    )
    assert union | window | set(registry.ROTATION_POOL_NEXT_ROUND) >= set(
        registry._ALL_QUERIES
    )


def test_every_category_represented_in_checked_union():
    """Union-coverage: every module has a representative in SOME
    driver-verified window, the current prefix, or the pinned next-round
    rotation pool (operators/chunking.py exists only in the pool until
    the round-6 window picks it up)."""
    union = (
        _driver_checked_union()
        | set(list(registry.QUERIES)[:CHECK_WINDOW])
        | set(registry.ROTATION_POOL_NEXT_ROUND)
    )
    for mod in registry._MODULES:
        names = set(mod.QUERIES)
        assert names & union, (
            f"{mod.__name__} has no representative in any driver-checked "
            f"correctness window"
        )


def test_previously_checked_names_still_registered():
    """Rotation must not silently drop previously-verified queries."""
    missing = [n for n in _driver_checked_union() if n not in registry.QUERIES]
    assert not missing, f"driver-verified queries vanished: {missing}"


def test_check_window_is_oracled_or_check_gated():
    """Every slot in the bounded check window must carry a SQL oracle,
    except the documented hash-seeded ops — each of those must have its
    paired ``check_*`` invariant query registered, oracled, and already
    driver-green (CORRECTNESS_r04)."""
    r04 = json.load(open(_ROOT / "CORRECTNESS_r04.json"))
    for name in list(registry.QUERIES)[:CHECK_WINDOW]:
        if name in registry.ORACLE_SQL:
            continue
        gate = ROWS_ONLY_WITH_CHECK_GATE.get(name)
        assert gate is not None, f"{name} has no oracle and no check gate"
        assert gate in registry.ORACLE_SQL, f"{gate} lost its oracle"
        assert r04.get(gate, {}).get("hash_match"), (
            f"{name}'s gate {gate} is not driver-green"
        )


def test_registry_complete():
    """Every registered query is reachable and every oracle maps to a
    registered query (guards against dict-merge regressions)."""
    assert len(registry.QUERIES) == len(registry._ALL_QUERIES)
    assert set(registry.ORACLE_SQL) <= set(registry.QUERIES)
