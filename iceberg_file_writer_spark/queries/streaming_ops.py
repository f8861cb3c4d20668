"""Streaming + multimodal operators exposed as driver-checkable queries.

The streaming entries run a real Structured Streaming query to completion
over the sf_dir events table (file source → memory sink →
processAllAvailable) and return the finalized result — genuinely
non-SQL-expressible custom stateful operators, so they carry no oracle
(the driver records the weaker rows-only check; their batch duals in
queries/events.py ARE oracle-checked, and tests/test_streaming.py
cross-checks stream-vs-batch equivalence).

The multimodal content-address entry is pure column algebra (sha256 over
binary payloads) and is oracle-checked exactly.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from iceberg_file_writer_spark.queries import register
from iceberg_file_writer_spark.tables import load_tables


def _run_stream(spark: SparkSession, sf_dir: str, transform, name: str) -> DataFrame:
    """Drive a streaming transformation of `events` to completion."""
    ev = load_tables(spark, sf_dir)["events"]
    src = tempfile.mkdtemp(prefix=f"stream-src-{name}-")
    ev.write.mode("overwrite").parquet(src)
    sink = f"{name}_{uuid.uuid4().hex[:8]}"
    q = (
        transform(spark.readStream.schema(ev.schema).parquet(src))
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(sink)


@register(
    "streaming_windowed_stats",
    oracle=None,
    description="Structured Streaming: watermarked tumbling-window aggregation run to completion (rows-only; batch dual events_hourly_stats is oracle-checked)",
)
def streaming_windowed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_file_writer_spark.streaming.windows import windowed_event_stats

    return _run_stream(spark, sf_dir, windowed_event_stats, "winstats")


@register(
    "streaming_session_windows",
    oracle=None,
    description="Structured Streaming: native session_window stateful sessionization (rows-only; batch dual user_sessions is oracle-checked)",
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_file_writer_spark.streaming.windows import session_windows

    return _run_stream(spark, sf_dir, session_windows, "sesswin")


@register(
    "streaming_stateful_totals",
    oracle=None,
    description="Structured Streaming: applyInPandasWithState per-user running totals (rows-only; custom stateful operator)",
)
def streaming_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_file_writer_spark.streaming.windows import user_running_totals

    return _run_stream(spark, sf_dir, user_running_totals, "totals")


@register(
    "streaming_dedup_events",
    oracle=None,
    description="Structured Streaming: watermark-bounded exact dedup (dropDuplicatesWithinWatermark; rows-only)",
)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_file_writer_spark.streaming.windows import streaming_dedup

    return _run_stream(spark, sf_dir, streaming_dedup, "dedupstream")


@register(
    "multimodal_content_address",
    oracle="""
SELECT doc_id AS media_id,
       sha256(text)           AS content_sha256,
       length(text)::BIGINT   AS n_bytes,
       'text'                 AS media_type
FROM documents
""",
    description="Multimodal: content-address binary payloads (sha256 digest + size)",
)
def multimodal_content_address(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_file_writer_spark.operators.multimodal import (
        content_address,
        documents_as_media,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    return content_address(documents_as_media(docs))


@register(
    "multimodal_feature_extract",
    oracle=None,
    description="Multimodal: mapInPandas decode/feature pipeline over binary payloads (rows-only; deterministic fake decoder, see operators/multimodal.py)",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_file_writer_spark.operators.multimodal import (
        decode_and_featurize,
        documents_as_media,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    return decode_and_featurize(documents_as_media(docs))
