"""Registry-order contract: external drivers oracle-check a bounded
prefix of the registry (the first 50 names in iteration order), so the
prefix must span every operator category and every prefix query must
carry a SQL oracle — otherwise whole categories ship with only the
local gate (the round-1 failure mode: 65/115 queries never saw the hard
correctness signal).
"""

from __future__ import annotations

from database_peak_streaming_spark import registry

CHECK_WINDOW = 50


def test_priority_is_the_registry_prefix():
    assert list(registry.QUERIES)[: len(registry._PRIORITY)] == registry._PRIORITY
    assert len(registry._PRIORITY) == CHECK_WINDOW


def test_priority_names_unique():
    assert len(set(registry._PRIORITY)) == len(registry._PRIORITY)


def test_every_category_represented_in_check_window():
    window = set(list(registry.QUERIES)[:CHECK_WINDOW])
    for mod in registry._MODULES:
        names = set(mod.QUERIES)
        assert names & window, (
            f"{mod.__name__} has no representative in the driver's "
            f"first-{CHECK_WINDOW} correctness window"
        )


def test_check_window_is_fully_oracled():
    """Every slot in the bounded check window must carry a SQL oracle —
    a rows-only check would waste the slot."""
    for name in list(registry.QUERIES)[:CHECK_WINDOW]:
        assert name in registry.ORACLE_SQL, f"{name} has no oracle"


def test_registry_complete():
    """Every registered query is reachable and every oracle maps to a
    registered query (guards against dict-merge regressions)."""
    assert len(registry.QUERIES) == len(registry._ALL_QUERIES)
    assert set(registry.ORACLE_SQL) <= set(registry.QUERIES)
