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

#: Queries deliberately REMOVED from the driver-facing registry in
#: round 6 (round-5 VERDICT "What's wrong" #3): their minhash
#: permutations are seeded by Spark's xxhash64, so no portable SQL
#: oracle can exist and a driver slot can only report ``err:
#: no_oracle``.  Each survives as a library function with pytest
#: recall/invariant coverage plus a driver-green ``check_*`` gate or
#: md5-portable twin; they appear in CORRECTNESS_r05.json keys, which
#: is why the union math below must exclude them.
REMOVED_FROM_DRIVER_SURFACE = {
    "dedup_minhash_lsh",
    "dedup_minhash_keepers",
    "dedup_clusters_cc_lsh",
    "curate_corpus_pipeline_lsh",
}


def _driver_checked_union() -> set[str]:
    """Every query name the round driver has hash/rows-checked, from the
    committed per-round artifacts."""
    union: set[str] = set()
    for f in sorted(_ROOT.glob("CORRECTNESS_r*.json")):
        union |= set(json.load(open(f)).keys())
    return union


def test_priority_is_the_registry_prefix():
    assert list(registry.QUERIES)[: len(registry._PRIORITY)] == registry._PRIORITY
    assert len(registry._PRIORITY) == CHECK_WINDOW


def test_priority_names_unique():
    assert len(set(registry._PRIORITY)) == len(registry._PRIORITY)


def test_window_completes_driver_coverage():
    """Round-6 contract: every registered query the driver has never
    hash-checked must sit either in the current 50-slot prefix or in
    the pinned ``ROTATION_POOL_NEXT_ROUND`` (9 low-risk spillover
    rollups + round-6 additions).  Any other overflow is a coverage
    regression."""
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
    rotation pool."""
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
    """Rotation must not silently drop previously-verified queries —
    only the four documented no-oracle removals may vanish."""
    missing = [
        n
        for n in _driver_checked_union()
        if n not in registry.QUERIES and n not in REMOVED_FROM_DRIVER_SURFACE
    ]
    assert not missing, f"driver-verified queries vanished: {missing}"


def test_removed_names_stay_removed_but_alive():
    """The no-oracle removals must NOT re-enter the driver surface (a
    re-registration re-creates guaranteed ``err`` rows) and must still
    exist as library functions."""
    from database_peak_streaming_spark.operators import curation, dedup

    assert not REMOVED_FROM_DRIVER_SURFACE & set(registry._ALL_QUERIES)
    for name in REMOVED_FROM_DRIVER_SURFACE:
        mod = curation if name.startswith("curate") else dedup
        assert callable(getattr(mod, name))


def test_every_registered_query_has_an_oracle():
    """Round-6 contract (VERDICT task 2): zero ``err: no_oracle`` rows
    possible by construction — EVERY name in queries() carries an
    oracle_sql() entry, not just the bounded window."""
    missing = [n for n in registry.QUERIES if n not in registry.ORACLE_SQL]
    assert not missing, f"registered queries without an oracle: {missing}"


def test_registry_complete():
    """Every registered query is reachable and every oracle maps to a
    registered query (guards against dict-merge regressions)."""
    assert len(registry.QUERIES) == len(registry._ALL_QUERIES)
    assert set(registry.ORACLE_SQL) <= set(registry.QUERIES)
