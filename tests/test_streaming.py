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
