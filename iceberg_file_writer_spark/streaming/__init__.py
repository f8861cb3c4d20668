"""Structured Streaming analytics [extension — not in reference].

The reference's only streaming behavior is wall-clock micro-batch flushing
(reference main.go:75-76), reproduced in ingest/streaming.py. This package
adds the event-time streaming surface a query engine is expected to have:
watermarked tumbling/sliding windows, session windows, and custom stateful
processing — the streaming duals of the batch queries in queries/events.py
(which the DuckDB oracle verifies; streaming results are checked against
those batch duals in tests).
"""
