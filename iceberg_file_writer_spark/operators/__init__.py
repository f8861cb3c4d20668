"""Extension operators [extension — not in reference].

The reference (`timfpark/iceberg-file-writer`) carries records opaquely —
its only per-record computation is Avro decode + partition routing
(reference main.go:61-90). These modules add the LLM-data-pipeline operator
surface on top: deduplication, similarity search, text analysis, and
multimodal binary columns — all expressed as JVM-side column expressions
(no Python row loop in any hot path) so they run inside whole-stage codegen
at 100 TB scale.
"""
