"""Structured Streaming: watermarked window agg vs its batch twin, and
incremental degree maintenance vs the batch degrees."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from hypergraph_gpu_label_propagation_spark.streaming.events import (
    run_to_completion,
    stream_events_window,
    stream_incidence_degrees,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_dir(tmp_path):
    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{SF}/events.parquet", d / "part-0.parquet")
    return str(d)


def test_stream_window_matches_batch_except_open_window(spark, events_dir):
    out = run_to_completion(
        stream_events_window(spark, events_dir), "t_ev_win", "append"
    )
    batch = entrymod.q_events_window(spark, SF)
    srows = {tuple(r) for r in out.collect()}
    brows = {tuple(r) for r in batch.collect()}
    # append mode emits only watermark-finalized windows: the single
    # missing row must be the latest window (never finalized)
    assert srows < brows
    missing = brows - srows
    assert len(missing) == 1
    assert max(r[0] for r in brows) == next(iter(missing))[0]


def test_stream_incidence_degrees(spark, tmp_path):
    d = tmp_path / "inc_stream"
    d.mkdir()
    inc = entrymod._incidence(spark, SF)
    inc.coalesce(1).write.mode("overwrite").parquet(str(d))
    out = run_to_completion(
        stream_incidence_degrees(spark, str(d)), "t_inc_deg", "complete"
    )
    got = {(r["vertex_id"], r["degree"]) for r in out.collect()}
    want = {
        (r["vertex_id"], r["degree"])
        for r in inc.groupBy("vertex_id").agg(F.count("*").alias("degree")).collect()
    }
    assert got == want


def test_stream_sessions_matches_batch_except_open_sessions(spark, events_dir):
    """Append-mode session_window emits exactly the sessions whose end the
    watermark has passed; the withheld remainder must be the tail
    sessions (end within the final watermark horizon)."""
    from hypergraph_gpu_label_propagation_spark.streaming.events import (
        stream_events_sessions,
    )

    out = run_to_completion(
        stream_events_sessions(spark, events_dir, gap="4 hours", watermark="1 day"),
        "t_ev_sess",
        "append",
    )
    batch = entrymod.q_events_sessions(spark, SF)
    srows = {tuple(r) for r in out.collect()}
    brows = {tuple(r) for r in batch.collect()}
    assert srows < brows
    # every withheld session ends within 1 day of the max event ts
    max_end = max(r[2] for r in brows)
    for r in brows - srows:
        assert r[2] >= max(r[2] for r in srows), (
            f"withheld session {r} is older than an emitted one"
        )
    assert len(brows - srows) < len(brows) * 0.2  # most sessions finalized


def test_degrees_merge_incremental_and_idempotent(spark, tmp_path):
    """foreachBatch MERGE state: two files arriving as separate
    micro-batches produce exactly the batch ground truth, and a re-run
    over the same checkpoint (replayed batches) doesn't double-count."""
    from hypergraph_gpu_label_propagation_spark.streaming.events import (
        run_degrees_merge,
    )

    inc = entrymod._incidence(spark, SF)
    a, b = inc.filter("edge_id % 2 = 0"), inc.filter("edge_id % 2 = 1")
    d = tmp_path / "inc_files"
    d.mkdir()
    a.coalesce(1).write.mode("overwrite").parquet(str(d / "f0.parquet"))
    b.coalesce(1).write.mode("overwrite").parquet(str(d / "f1.parquet"))
    # flatten: the file source wants files in one dir
    import glob
    import shutil as sh

    sdir = tmp_path / "stream_in"
    sdir.mkdir()
    for i, f in enumerate(sorted(glob.glob(str(d / "*" / "part-*.parquet")))):
        sh.copy(f, sdir / f"file{i}.parquet")

    state = str(tmp_path / "state")
    got = run_degrees_merge(spark, str(sdir), state)
    want = inc.groupBy("vertex_id").agg(F.count("*").alias("degree"))
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}

    # replay: same checkpoint, no new files -> state unchanged
    again = run_degrees_merge(spark, str(sdir), state)
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in want.collect()}


def test_degrees_merge_crash_recovery(spark, tmp_path):
    """Half-finished swap states heal: (a) crash between the two renames
    (current missing, .old present) restores the pre-batch snapshot and
    replays the batch without double-counting; (b) crash after the swap
    but before .old cleanup just drops the stale .old."""
    import os
    import shutil as sh

    from hypergraph_gpu_label_propagation_spark.streaming.events import (
        _recover_state,
        run_degrees_merge,
    )

    inc = entrymod._incidence(spark, SF)
    sdir = tmp_path / "stream_in"
    sdir.mkdir()
    inc.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "one.parquet"))
    import glob

    for i, f in enumerate(sorted(glob.glob(str(tmp_path / "one.parquet" / "part-*.parquet")))):
        sh.copy(f, sdir / f"file{i}.parquet")
    state = str(tmp_path / "state")
    got = run_degrees_merge(spark, str(sdir), state)
    want = {tuple(r) for r in inc.groupBy("vertex_id").agg(F.count("*").alias("degree")).collect()}
    assert {tuple(r) for r in got.collect()} == want
    cur = os.path.join(state, "current")

    # (a) mid-swap crash: current gone, .old holds the snapshot
    os.rename(cur, cur + ".old")
    (tmp_path / "state" / "tmp-99").mkdir()  # stale temp dir too
    _recover_state(state)
    assert os.path.exists(cur) and not os.path.exists(cur + ".old")
    assert not os.path.exists(os.path.join(state, "tmp-99"))
    assert {tuple(r) for r in spark.read.parquet(cur).collect()} == want
    # marker survived inside the snapshot -> replay is still idempotent
    again = run_degrees_merge(spark, str(sdir), state)
    assert {tuple(r) for r in again.collect()} == want

    # (b) post-swap crash: both present -> stale .old dropped
    sh.copytree(cur, cur + ".old")
    _recover_state(state)
    assert os.path.exists(cur) and not os.path.exists(cur + ".old")
    assert {tuple(r) for r in spark.read.parquet(cur).collect()} == want


def test_user_stats_stateful_accumulates_across_batches(spark, tmp_path):
    """applyInPandasWithState: two micro-batches (maxFilesPerTrigger=1)
    must fold into ONE persisted state per user — a user present in both
    halves emits two rows with strictly increasing n_events, and the
    final row equals the batch aggregate over the full stream."""
    import glob
    import shutil as sh

    from hypergraph_gpu_label_propagation_spark.streaming.events import (
        run_to_completion,
        stream_user_stats,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    a, b = ev.filter("event_id % 2 = 0"), ev.filter("event_id % 2 = 1")
    sdir = tmp_path / "ev_stream"
    sdir.mkdir()
    for i, half in enumerate((a, b)):
        half.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"h{i}.parquet"))
        src = glob.glob(str(tmp_path / f"h{i}.parquet" / "part-*.parquet"))[0]
        sh.copy(src, sdir / f"file{i}.parquet")

    out = run_to_completion(
        stream_user_stats(spark, str(sdir), max_files_per_trigger=1),
        "t_user_stats", "update",
    )
    rows = out.collect()
    spark.catalog.dropTempView("t_user_stats")
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r)
    want = {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.max("value").alias("m"),
        )
        .collect()
    }
    multi = 0
    for uid, emitted in per_user.items():
        emitted.sort(key=lambda r: r["n_events"])
        ns = [r["n_events"] for r in emitted]
        assert ns == sorted(set(ns)), "n_events must be strictly increasing"
        if len(emitted) > 1:
            multi += 1
        final = emitted[-1]
        w = want[uid]
        assert final["n_events"] == w["n"]
        assert abs(final["sum_value"] - w["s"]) < 1e-9
        assert final["max_value"] == w["m"]
    assert multi > 0, "at least one user must span both micro-batches"
