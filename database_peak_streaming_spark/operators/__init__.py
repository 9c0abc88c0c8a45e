"""Batch relational operator surface (SURVEY.md §2B).

Every module exposes ``QUERIES`` (name -> callable(spark, sf_dir) ->
DataFrame) and ``ORACLE_SQL`` (name -> equivalent ANSI SQL for the DuckDB
oracle).  Column names are aliased identically on both sides; aggregate
doubles are summed through ``decimal`` so results are order-independent
and bit-identical across engines (float addition is not associative —
a distributed sum must not depend on partitioning).
"""
