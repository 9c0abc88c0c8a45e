"""Import smoke — named to collect FIRST (pytest collects files
alphabetically) and deliberately Spark-free, so a half-finished refactor
that import-kills the package fails here in seconds, locally, instead of
in the driver's CORRECTNESS run.  (Round 3 shipped exactly that failure:
a dangling name in operators/dedup.py took out the whole registry; see
VERDICT.md r3.)  No fixtures: even if every other file dies at
collection, this one still executes.
"""

import importlib
import pkgutil


def test_registry_imports_and_is_complete():
    registry = importlib.import_module("database_peak_streaming_spark.registry")
    assert len(registry.QUERIES) >= 126
    # every oracle key must have a query behind it
    assert set(registry.ORACLE_SQL) <= set(registry.QUERIES)


def test_entry_module_contract():
    e = importlib.import_module("__spark_entry__")
    qs = e.queries()
    assert len(qs) >= 126
    assert all(callable(fn) for fn in qs.values())
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(oracles) >= 120


def test_every_submodule_imports():
    """Walk the whole package: any module that raises at import (the
    round-3 failure class) fails here without a SparkSession."""
    pkg = importlib.import_module("database_peak_streaming_spark")
    for mod in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        importlib.import_module(mod.name)
