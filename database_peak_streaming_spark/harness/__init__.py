"""Differential-correctness harness: Spark vs DuckDB oracle (SURVEY.md §5)."""
