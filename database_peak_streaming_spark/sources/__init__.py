"""Sources & sinks: batch readers, streaming replay sources, binary decode.

Reference parity (SURVEY.md §2A S1-S12): the reference's only sources are
a TCP binary instrument stream and SQLite tables; its sinks are SQLite
batched INSERTs and a drafted CSV export.  Here the at-rest format is
Parquet (columnar, splittable, predicate-pushdown-able), streams replay
through Structured Streaming, and the binary wire format decodes through
vectorized Arrow kernels.
"""
