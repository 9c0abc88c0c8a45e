"""Structured Streaming surface: replay sources, the reference-parity
peaks pipeline (window means -> tiered store -> retention), and streaming
breadth ops (dedup, stream-static join, session windows).

The reference's pipeline (SURVEY.md §3.1) was asyncio + numpy + SQLite;
here the same semantics are one declarative streaming plan:

    source -> withWatermark -> window agg -> foreachBatch epoch sink
                                             (st append | lt resample |
                                              retention partition-drop)
"""
