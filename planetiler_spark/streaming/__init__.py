"""Structured Streaming operators.

The reference engine is strictly batch (SURVEY §2.10 — no watermarks/windows/
stateful operators exist in Planetiler; `--append` and checkpoint/resume are
its only incremental features, both covered by operators/checkpoint.py).
This package adds the streaming surface a production ingest would need:
file-source micro-batching, watermarked event-time windows, and streaming
tile-count maintenance.
"""
