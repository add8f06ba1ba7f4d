"""Streaming analogs of the batch aggregation queries.

- :func:`stream_events_window`: watermarked tumbling-window aggregation
  over an events stream (late rows beyond the watermark are dropped);
  the batch twin is ``__spark_entry__.q_events_window`` and the test
  drives a file stream to completion and compares against it.
- :func:`stream_incidence_degrees`: incremental vertex-degree
  maintenance over an append-only incidence stream — the streaming
  ingest path for keeping a frozen hypergraph's degree stats fresh
  between batch LP runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# watermarks require TIMESTAMP (with local timezone); the parquet column
# is TIMESTAMP_NTZ but reads fine under this schema — pin the session to
# UTC (session.py does) so wall-clock values match the batch twin
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

INCIDENCE_SCHEMA = "edge_id long, vertex_id long"


def stream_events_window(
    spark: SparkSession,
    path: str,
    watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """readStream(parquet) -> watermark -> tumbling window agg.
    Returns the streaming DataFrame; caller attaches the sink."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            F.col("n_events").cast("long"),
            "sum_value",
        )
    )


def stream_incidence_degrees(spark: SparkSession, path: str) -> DataFrame:
    """Running (vertex_id, degree) over an append-only incidence stream
    (complete-mode aggregation; at scale this would be foreachBatch
    MERGE into the degree table)."""
    inc = spark.readStream.schema(INCIDENCE_SCHEMA).parquet(path)
    return inc.groupBy("vertex_id").agg(F.count("*").alias("degree"))


def run_to_completion(stream_df: DataFrame, query_name: str, output_mode: str) -> DataFrame:
    """Drive a file-backed stream synchronously to completion into a
    memory sink; returns the sink contents as a batch DataFrame."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")
