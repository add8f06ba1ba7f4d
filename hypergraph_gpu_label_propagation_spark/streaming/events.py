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
    (complete-mode aggregation; the durable scale path is
    :func:`run_degrees_merge`)."""
    inc = spark.readStream.schema(INCIDENCE_SCHEMA).parquet(path)
    return inc.groupBy("vertex_id").agg(F.count("*").alias("degree"))


def stream_events_sessions(
    spark: SparkSession,
    path: str,
    gap: str = "4 hours",
    watermark: str = "1 day",
) -> DataFrame:
    """Per-user event sessionization with ``session_window`` (gap-based
    merging windows; events within ``gap`` of the running session end
    extend it).  The same plan runs batch (q_events_sessions contract
    query, DuckDB islands-SQL oracle) and streaming (append mode emits a
    session once the watermark passes its end).  Timestamps truncate to
    seconds in the output so wall-clock strings compare across engines
    regardless of sub-second formatting."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    return sessionize(events.withWatermark("ts", watermark), gap)


def sessionize(events: DataFrame, gap: str = "4 hours") -> DataFrame:
    """The shared batch/streaming sessionization plan."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("user_id").cast("long"),
            F.date_trunc("second", F.col("w.start")).cast("string").alias("session_start"),
            F.date_trunc("second", F.col("w.end")).cast("string").alias("session_end"),
            F.col("n_events").cast("long"),
            "sum_value",
        )
    )


def run_degrees_merge(spark: SparkSession, stream_path: str, state_dir: str) -> DataFrame:
    """Durable incremental degree maintenance — the foreachBatch MERGE
    pattern: each micro-batch's per-vertex delta is merged into a parquet
    state table via write-to-temp + directory swap, with the last merged
    batch id recorded for idempotent replay (a restarted query
    re-delivering a batch must not double-count).

    Crash safety: the batch-id marker lives INSIDE the state snapshot
    (``current/_merged_batch``), written into the temp dir BEFORE the
    swap, so the state table and its replay watermark always move as one
    unit — there is no window where the new state is visible without its
    marker (the double-count hazard of a side-channel marker file).  The
    two-rename swap itself is not atomic; :func:`_recover_state` closes
    that window by restoring ``current.old`` whenever a crash between
    the renames left ``current`` missing (the batch then simply replays
    against the restored pre-batch state — idempotent by the marker).

    At cluster scale the swap becomes a MERGE INTO on an Iceberg/Delta
    table; the batch-id guard is exactly Structured Streaming's
    transactional-sink contract (batchId + idempotent commit).
    Returns the final state as a batch DataFrame.
    """
    import os

    os.makedirs(state_dir, exist_ok=True)
    cur_path = os.path.join(state_dir, "current")
    _recover_state(state_dir)  # heal any half-finished swap from a prior run

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        import shutil

        _recover_state(state_dir)
        marker = os.path.join(cur_path, "_merged_batch")
        if os.path.exists(marker):
            with open(marker) as f:
                if batch_id <= int(f.read().strip()):
                    return  # replayed batch — already merged
        delta = batch_df.groupBy("vertex_id").agg(F.count("*").alias("degree"))
        if os.path.exists(cur_path):
            cur = spark.read.parquet(cur_path)
            merged = (
                cur.unionByName(delta)
                .groupBy("vertex_id")
                .agg(F.sum("degree").cast("long").alias("degree"))
            )
        else:
            merged = delta.select("vertex_id", F.col("degree").cast("long"))
        tmp = os.path.join(state_dir, f"tmp-{batch_id}")
        merged.write.mode("overwrite").parquet(tmp)  # materializes BEFORE the swap
        # marker rides the snapshot: written into tmp BEFORE the swap so
        # state + watermark become visible together
        with open(os.path.join(tmp, "_merged_batch"), "w") as f:
            f.write(str(batch_id))
        old = cur_path + ".old"
        if os.path.exists(cur_path):
            os.rename(cur_path, old)
        os.rename(tmp, cur_path)
        shutil.rmtree(old, ignore_errors=True)

    inc = (
        spark.readStream.schema(INCIDENCE_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one micro-batch per arriving file
        .parquet(stream_path)
    )
    q = (
        inc.writeStream.foreachBatch(merge)
        .option("checkpointLocation", os.path.join(state_dir, "_checkpoint"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(cur_path)


def atomic_swap_write(df: DataFrame, path: str) -> None:
    """Materialize ``df`` into directory ``path`` via write-to-temp +
    two-rename swap (the :func:`run_degrees_merge` protocol, factored
    out for any parquet state dir — incremental LP/CC state uses it).

    Readers never observe a half-written ``path``: a crash before the
    first rename leaves the previous snapshot intact; a crash between
    the renames is healed by :func:`recover_swap` (the ``.old`` dir IS
    the complete previous snapshot).  Because the write lands in
    ``path + ".tmp"``, ``df`` may safely READ from ``path`` itself —
    no self-overwrite hazard, no defensive localCheckpoint needed."""
    import os
    import shutil

    recover_swap(path)
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    df.write.mode("overwrite").parquet(tmp)
    old = path + ".old"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def recover_swap(path: str) -> None:
    """Heal a half-finished :func:`atomic_swap_write` (same windows as
    :func:`_recover_state`): restore ``.old`` if the swap died between
    renames, drop it if the swap completed, drop any stale ``.tmp``."""
    import os
    import shutil

    old = path + ".old"
    if os.path.exists(old):
        if os.path.exists(path):
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(old, path)
    shutil.rmtree(path + ".tmp", ignore_errors=True)


def _recover_state(state_dir: str) -> None:
    """Heal a half-finished state swap (see :func:`run_degrees_merge`).

    Crash windows of the two-rename swap and their recovery:
    - between ``rename(current -> current.old)`` and
      ``rename(tmp -> current)``: ``current`` missing, ``current.old``
      holds the complete pre-batch snapshot (incl. its marker) ->
      restore it; the interrupted batch replays idempotently;
    - between ``rename(tmp -> current)`` and ``rmtree(current.old)``:
      both present; the swap completed -> drop the stale ``.old``;
    - stale ``tmp-*`` dirs are always safe to drop (either incomplete,
      or complete-but-unswapped, in which case the batch replays and
      rewrites them).
    """
    import os
    import shutil

    cur_path = os.path.join(state_dir, "current")
    old = cur_path + ".old"
    if os.path.exists(old):
        if os.path.exists(cur_path):
            shutil.rmtree(old, ignore_errors=True)  # swap finished; stale .old
        else:
            os.rename(old, cur_path)  # crash mid-swap; restore pre-batch state
    for d in os.listdir(state_dir) if os.path.isdir(state_dir) else []:
        if d.startswith("tmp-"):
            shutil.rmtree(os.path.join(state_dir, d), ignore_errors=True)


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


USER_STATS_STATE_SCHEMA = "n BIGINT, total DOUBLE, mx DOUBLE"
USER_STATS_OUTPUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, sum_value DOUBLE, max_value DOUBLE"
)


def _user_stats_fn(key, pdf_iter, state):
    """applyInPandasWithState update function: running per-user
    (count, sum, max) over the event stream.  Pure incremental merge —
    each micro-batch folds into the persisted state tuple and emits the
    updated row, so the FINAL emitted row per user equals the batch
    aggregate over the whole stream (the oracle-checkable invariant)."""
    import pandas as pd

    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [total],
            "max_value": [mx],
        }
    )


def stream_user_stats(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Custom STATEFUL streaming operator via ``applyInPandasWithState``
    (the Arrow-batched arbitrary-state API): per-user running
    (count, sum, max) emitted in update mode each micro-batch.

    At 100 TB the state store is RocksDB-backed and partitioned by
    user_id; here the in-memory HDFS-backed store exercises the same
    plumbing.  The final emitted row per user equals the batch
    aggregate, which is what the contract query checks against DuckDB.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(path)
    return events.groupBy("user_id").applyInPandasWithState(
        _user_stats_fn,
        outputStructType=USER_STATS_OUTPUT_SCHEMA,
        stateStructType=USER_STATS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
