"""CLI surface tests (reference argparse.cpp + main.cpp flow), focused
on the r06 `--bucketed` auto/on/off wiring (r05 verdict #5): the
durable dual-bucketed layout must be a drop-in for the in-session
freeze — identical LP results — and the auto rule must follow the
measured crossover in sources/bucketed.py::should_bucket."""

import json

import pytest

from hypergraph_gpu_label_propagation_spark import cli
from hypergraph_gpu_label_propagation_spark.sources.bucketed import (
    BUCKETED_CROSSOVER_ROW_SUPERSTEPS,
    should_bucket,
)


def test_should_bucket_crossover():
    # measured break-even: ~600k rows x ~8 supersteps ~= 5M
    assert not should_bucket(0)
    assert not should_bucket(600_000, 8)  # 4.8M: just under
    assert should_bucket(700_000, 8)
    assert should_bucket(BUCKETED_CROSSOVER_ROW_SUPERSTEPS, 1)
    # one superstep over a small graph never amortizes the write
    assert not should_bucket(10_000, 1)


def _run_cli(spark, tmp_path, tag, *extra):
    out = tmp_path / f"metrics_{tag}.json"
    rc = cli.main([
        "-v", "300", "-e", "600", "--planted", "--seed", "7",
        "--label-classes", "4", "--algo", "lp",
        "--metrics-json", str(out), *extra,
    ])
    assert rc == 0
    return json.loads(out.read_text())


@pytest.mark.usefixtures("spark")
def test_bucketed_on_matches_off(spark, tmp_path):
    """--bucketed on must produce the exact LP outcome of the
    in-session freeze (same generator seed -> same graph -> same
    deterministic LP), while actually creating the bucketed tables."""
    off = _run_cli(spark, tmp_path, "off", "--bucketed", "off")
    on = _run_cli(spark, tmp_path, "on", "--bucketed", "on")
    assert on["iterations"] == off["iterations"]
    assert on["changes_per_iter"] == off["changes_per_iter"]
    assert on["label_histogram"] == off["label_histogram"]
    tables = {t.name for t in spark.catalog.listTables()}
    assert {"cli_bucketed_by_vertex", "cli_bucketed_by_edge"} <= tables


@pytest.mark.usefixtures("spark")
def test_bucketed_auto_skips_small_graph(spark, tmp_path, monkeypatch):
    """auto on a 300-vertex graph stays on the in-session freeze (below
    the crossover); forcing the threshold to 0 makes auto take the
    bucketed path — i.e. the decision really flows through
    should_bucket."""
    for t in ("cli_bucketed_by_vertex", "cli_bucketed_by_edge"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    _run_cli(spark, tmp_path, "auto_small", "--bucketed", "auto")
    tables = {t.name for t in spark.catalog.listTables()}
    assert "cli_bucketed_by_vertex" not in tables

    monkeypatch.setattr(
        "hypergraph_gpu_label_propagation_spark.sources.bucketed."
        "BUCKETED_CROSSOVER_ROW_SUPERSTEPS",
        0,
    )
    _run_cli(spark, tmp_path, "auto_forced", "--bucketed", "auto")
    tables = {t.name for t in spark.catalog.listTables()}
    assert "cli_bucketed_by_vertex" in tables
