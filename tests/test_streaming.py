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


def test_incremental_lp_warm_start(spark, tmp_path):
    """Incremental LP over a growing incidence stream: each micro-batch
    re-converges warm-started from the previous fixed point.  Contract:
    (a) the final labels are a FIXED POINT of LP on the full graph
    (zero changes under one more superstep), (b) the warm-started
    batches need fewer supersteps than the first (cold) batch."""
    import pyspark.sql.functions as F

    from hypergraph_gpu_label_propagation_spark.model import Hypergraph
    from hypergraph_gpu_label_propagation_spark.streaming.lp_stream import (
        fixed_point_violations,
        run_incremental_lp,
    )

    stream_dir = tmp_path / "inc_stream"
    stream_dir.mkdir()
    # batch 1: a 60-vertex hypergraph; batch 2: 8 new edges touching a
    # handful of vertices + 5 brand-new vertices
    b1 = [(e, (v * 7 + e) % 60) for e in range(30) for v in range(4)]
    b2 = [(100 + e, 55 + (e + v) % 10) for e in range(8) for v in range(3)]
    spark.createDataFrame(sorted(set(b1)), "edge_id long, vertex_id long").coalesce(
        1
    ).write.parquet(str(stream_dir / "b1"))

    state = str(tmp_path / "lp_state")
    r1 = run_incremental_lp(spark, str(stream_dir) + "/*", state)
    assert r1.num_batches == 1
    cold_supersteps = r1.supersteps_per_batch[0]

    spark.createDataFrame(sorted(set(b2)), "edge_id long, vertex_id long").coalesce(
        1
    ).write.parquet(str(stream_dir / "b2"))
    r2 = run_incremental_lp(spark, str(stream_dir) + "/*", state)
    assert r2.num_batches == 1  # only the new file is a new micro-batch
    warm_supersteps = r2.supersteps_per_batch[0]
    assert warm_supersteps <= cold_supersteps

    # final labels are a fixed point of the FULL graph
    full = spark.createDataFrame(
        sorted(set(b1) | set(b2)), "edge_id long, vertex_id long"
    )
    hg = Hypergraph.freeze(spark, full)
    labels = r2.labels
    assert labels.count() == hg.num_vertices
    assert fixed_point_violations(hg, labels) == 0
    hg.unpersist()


def test_incremental_cc_equals_cold_run(spark, tmp_path):
    """Incremental CC warm-starts from the previous minima; because the
    min-propagation fixed point is unique, the result must EQUAL the
    cold full-graph run exactly — and the warm batch must converge in
    fewer supersteps."""
    from hypergraph_gpu_label_propagation_spark.model import Hypergraph
    from hypergraph_gpu_label_propagation_spark.operators.components import (
        connected_components,
    )
    from hypergraph_gpu_label_propagation_spark.streaming.lp_stream import (
        run_incremental_cc,
    )

    stream_dir = tmp_path / "cc_stream"
    stream_dir.mkdir()
    # batch 1: two chains of 3-member edges (two components + isolates)
    b1 = [(e, 2 * e + d) for e in range(10) for d in (0, 1, 2)]
    b1 += [(100 + e, 40 + 2 * e + d) for e in range(8) for d in (0, 1, 2)]
    # batch 2: one bridging edge merges the two components
    b2 = [(500, 5), (500, 45)]
    spark.createDataFrame(sorted(set(b1)), "edge_id long, vertex_id long").coalesce(
        1
    ).write.parquet(str(stream_dir / "b1"))
    state = str(tmp_path / "cc_state")
    run_incremental_cc(spark, str(stream_dir) + "/*", state)

    spark.createDataFrame(b2, "edge_id long, vertex_id long").coalesce(
        1
    ).write.parquet(str(stream_dir / "b2"))
    r2 = run_incremental_cc(spark, str(stream_dir) + "/*", state)
    warm_iters = r2.supersteps_per_batch[0]

    full = spark.createDataFrame(
        sorted(set(b1) | set(b2)), "edge_id long, vertex_id long"
    )
    hg = Hypergraph.freeze(spark, full)
    cold_res = connected_components(hg)
    # warm init is pointwise <= the cold init and min-propagation is
    # monotone, so the warm run needs no more supersteps than a COLD run
    # on the same full graph (batch-1's iteration count is a different
    # graph and not comparable)
    assert warm_iters <= cold_res.iterations
    cold = sorted(map(tuple, cold_res.components.collect()))
    warm = sorted(map(tuple, r2.labels.collect()))
    assert warm == cold
    hg.unpersist()


def test_incremental_state_atomic_swap_and_corruption_guard(spark, tmp_path):
    """ADVICE r04 (medium): state dirs are maintained with the
    write-to-temp + two-rename swap, so (a) a crash between the renames
    is healed from the ``.old`` snapshot, and (b) a state dir that
    exists WITHOUT a _SUCCESS marker is refused instead of silently
    treated as empty (which would rebuild the graph from only the new
    rows and still pass the fixed-point certificate on a truncated
    graph)."""
    import os
    import shutil

    import pytest

    from hypergraph_gpu_label_propagation_spark.streaming.events import (
        atomic_swap_write,
        recover_swap,
    )
    from hypergraph_gpu_label_propagation_spark.streaming.lp_stream import (
        _read_state,
        run_incremental_cc,
    )

    # (a) swap + crash-window recovery
    target = str(tmp_path / "state")
    df1 = spark.range(5).select(F.col("id").alias("x"))
    atomic_swap_write(df1, target)
    assert spark.read.parquet(target).count() == 5
    df2 = spark.range(9).select(F.col("id").alias("x"))
    atomic_swap_write(df2, target)
    assert spark.read.parquet(target).count() == 9
    # simulate a crash between rename(current -> .old) and
    # rename(tmp -> current): only .old remains
    os.rename(target, target + ".old")
    recover_swap(target)
    assert spark.read.parquet(target).count() == 9

    # (b) foreign/corrupt state dir (no _SUCCESS) -> hard error
    bad = str(tmp_path / "bad_state")
    os.makedirs(os.path.join(bad, "incidence"))
    with open(os.path.join(bad, "incidence", "part-junk.parquet"), "wb") as f:
        f.write(b"junk")
    with pytest.raises(ValueError, match="_SUCCESS"):
        _read_state(spark, os.path.join(bad, "incidence"))
    stream_dir = tmp_path / "guard_stream"
    stream_dir.mkdir()
    spark.createDataFrame(
        [(1, 1), (1, 2)], "edge_id long, vertex_id long"
    ).coalesce(1).write.parquet(str(stream_dir / "b1"))
    with pytest.raises(Exception, match="_SUCCESS"):
        run_incremental_cc(spark, str(stream_dir) + "/*", bad)
    shutil.rmtree(bad)


def test_incremental_pagerank_allclose_cold_run(spark, tmp_path):
    """Incremental PageRank warm-starts from the previous ranks; the
    PageRank map contracts in L1 to a UNIQUE fixed point, so the warm
    result must match a cold run of the grown graph within the
    tol-driven error bound (north rule: allclose 1e-6) — and converge
    in fewer iterations than the cold run."""
    import numpy as np

    from hypergraph_gpu_label_propagation_spark.model import Hypergraph
    from hypergraph_gpu_label_propagation_spark.operators.pagerank import (
        hypergraph_pagerank,
    )
    from hypergraph_gpu_label_propagation_spark.streaming.lp_stream import (
        run_incremental_pagerank,
    )

    stream_dir = tmp_path / "pr_stream"
    stream_dir.mkdir()
    # batch 1: a 300-vertex chain of 3-member edges + a hub edge — big
    # enough that batch 2 is a SMALL relative perturbation (on a toy
    # graph the fixed point itself moves by a large L1 fraction and the
    # warm head start is spent on slow eigenmodes; see the operator
    # docstring)
    b1 = [(e, 2 * e + d) for e in range(150) for d in (0, 1, 2)]
    b1 += [(900, v) for v in (0, 60, 120, 180)]
    # batch 2: one bridging edge + one edge with brand-new vertices
    b2 = [(5000, 7), (5000, 161), (5001, 900), (5001, 901), (5001, 7)]
    spark.createDataFrame(sorted(set(b1)), "edge_id long, vertex_id long").coalesce(
        1
    ).write.parquet(str(stream_dir / "b1"))
    state = str(tmp_path / "pr_state")
    run_incremental_pagerank(spark, str(stream_dir) + "/*", state, tol=1e-9)

    spark.createDataFrame(b2, "edge_id long, vertex_id long").coalesce(
        1
    ).write.parquet(str(stream_dir / "b2"))
    r2 = run_incremental_pagerank(spark, str(stream_dir) + "/*", state, tol=1e-9)
    assert r2.num_batches == 1  # stream checkpoint: only b2 re-delivered

    full = spark.createDataFrame(
        sorted(set(b1) | set(b2)), "edge_id long, vertex_id long"
    )
    hg = Hypergraph.freeze(spark, full)
    cold_res = hypergraph_pagerank(hg, tol=1e-9)
    # THE contract: unique fixed point -> warm lands on the cold ranks
    cold = {r["vertex_id"]: r["rank"] for r in cold_res.ranks.collect()}
    warm = {r["vertex_id"]: r["rank"] for r in r2.labels.collect()}
    assert set(cold) == set(warm)
    ids = sorted(cold)
    assert np.allclose(
        [warm[i] for i in ids], [cold[i] for i in ids], atol=1e-6, rtol=0
    )
    # both are probability vectors
    assert abs(sum(warm.values()) - 1.0) < 1e-9
    hg.unpersist()


def test_pagerank_warm_start_head_start_and_uniqueness(spark):
    """The guaranteed part of a PageRank warm start: the initial L1
    delta equals the perturbation's size (orders below a cold start's),
    and the destination is the same unique fixed point.  Iteration
    count is deliberately NOT asserted — the perturbation error lives
    disproportionately in slow eigenmodes, so warm can take as many
    tail iterations as cold (see operator docstring)."""
    import numpy as np

    from hypergraph_gpu_label_propagation_spark.model import Hypergraph
    from hypergraph_gpu_label_propagation_spark.operators.pagerank import (
        hypergraph_pagerank,
    )

    b1 = [(e, 2 * e + d) for e in range(150) for d in (0, 1, 2)]
    b1 += [(900, v) for v in (0, 60, 120, 180)]
    old = spark.createDataFrame(sorted(set(b1)), "edge_id long, vertex_id long")
    full = spark.createDataFrame(
        sorted(set(b1) | {(5000, 7), (5000, 161)}),
        "edge_id long, vertex_id long",
    )
    hg_old = Hypergraph.freeze(spark, old)
    r_old = hypergraph_pagerank(hg_old, tol=1e-9)
    hg = Hypergraph.freeze(spark, full)
    cold = hypergraph_pagerank(hg, tol=1e-9)
    warm = hypergraph_pagerank(hg, tol=1e-9, initial_ranks=r_old.ranks)
    # head start: initial delta is the perturbation's size, far below
    # the cold uniform start's distance-to-fixed-point
    assert warm.deltas[0] < cold.deltas[0] / 10
    c = {r["vertex_id"]: r["rank"] for r in cold.ranks.collect()}
    w = {r["vertex_id"]: r["rank"] for r in warm.ranks.collect()}
    ids = sorted(c)
    assert np.allclose([w[i] for i in ids], [c[i] for i in ids], atol=1e-6, rtol=0)
    hg_old.unpersist()
    hg.unpersist()


def test_stream_dedup_matches_arrival_ordered_batch_twin(spark, tmp_path):
    """r07: streaming dedup against the durable band index.  Two
    deliveries; every (later, earlier) doc pair whose signature
    estimator clears the threshold must be emitted EXACTLY ONCE, in
    the later doc's batch — cross-delivery pairs via the index,
    within-batch pairs via self-collision.  The oracle is the batch
    twin under the SAME estimator over arrival-ordered pairs."""
    from hypergraph_gpu_label_propagation_spark.streaming.dedup_stream import (
        banded_signatures,
        est_jaccard,
        run_stream_dedup,
    )

    base = "the quick brown fox jumps over the lazy dog near the old river bank"
    near = "the quick brown fox jumps over the lazy dog near the old river bend"
    d1 = [(0, base), (1, base), (2, near),
          (3, "completely different words about spark shuffles and partitions")]
    d2 = [(4, base), (5, "yet another unrelated document with fresh tokens")]

    stream_dir = tmp_path / "docs_stream"
    stream_dir.mkdir()
    state = str(tmp_path / "dedup_state")
    spark.createDataFrame(d1, "doc_id long, text string").coalesce(1).write.parquet(
        str(stream_dir / "b1")
    )
    r1 = run_stream_dedup(spark, str(stream_dir) + "/*", state, threshold=0.5)
    spark.createDataFrame(d2, "doc_id long, text string").coalesce(1).write.parquet(
        str(stream_dir / "b2")
    )
    r2 = run_stream_dedup(spark, str(stream_dir) + "/*", state, threshold=0.5)

    got = {
        (r["new_id"], r["dup_of"]): r["est_jaccard"]
        for r in r2.links.collect()
    }
    assert len(got) == len(r2.links.collect())  # exactly-once per pair

    # batch twin: all arrival-ordered band collisions under the same
    # estimator (arrival order == doc_id order in this fixture)
    all_docs = spark.createDataFrame(d1 + d2, "doc_id long, text string")
    bands = banded_signatures(all_docs, "doc_id", "text")
    a = bands.select(F.col("doc_id").alias("new_id"), "band", "bucket",
                     F.col("sig").alias("new_sig"))
    b = bands.select(F.col("doc_id").alias("dup_of"), "band", "bucket",
                     F.col("sig").alias("old_sig"))
    twin = {
        (r["new_id"], r["dup_of"]): r["est_jaccard"]
        for r in (
            a.join(b, ["band", "bucket"])
            .filter(F.col("new_id") > F.col("dup_of"))
            .select("new_id", "dup_of", "new_sig", "old_sig")
            .distinct()
            .withColumn("est_jaccard",
                        est_jaccard(F.col("new_sig"), F.col("old_sig"), 8))
            .filter(F.col("est_jaccard") >= 0.5)
            .collect()
        )
    }
    assert got == twin
    # the fixture actually exercises both link sources: (1,0) is
    # within-batch, (4,0) is cross-delivery through the index
    assert (1, 0) in got and (4, 0) in got
    assert got[(1, 0)] == 1.0 and got[(4, 0)] == 1.0
    # batch-1's links arrived in batch 1, not re-emitted in batch 2
    assert r1.links.count() + r2.links_per_batch[-1] == len(got)


def test_read_deliveries_swap_internals_and_replay_guard(spark, tmp_path):
    """r07 review: the delivery reader must treat the swap protocol's
    '.tmp'/'.old' siblings as internals — a crash mid-tmp-write must
    neither brick the reader nor expose uncommitted rows, and a crash
    between the two renames (only '.old' left) must heal to the
    committed snapshot.  before_id is the foreachBatch replay guard:
    a replayed batch must not see its own already-committed delivery."""
    import os
    import shutil

    from hypergraph_gpu_label_propagation_spark.streaming.dedup_stream import (
        read_deliveries,
    )

    root = str(tmp_path / "idx")
    os.makedirs(root)

    def mk(name, ids):
        spark.createDataFrame([(i,) for i in ids], "doc_id long").coalesce(
            1
        ).write.parquet(os.path.join(root, name))

    mk("delivery=0", [100])
    # crash mid-tmp-write: parquet dir without _SUCCESS, under .tmp
    mk("delivery=1.tmp", [111])
    os.remove(os.path.join(root, "delivery=1.tmp", "_SUCCESS"))
    # crash between the two renames: only the .old snapshot remains
    mk("delivery=2", [122])
    os.rename(os.path.join(root, "delivery=2"), os.path.join(root, "delivery=2.old"))

    got = {r["doc_id"] for r in read_deliveries(spark, root).collect()}
    assert got == {100, 122}          # 0 committed, 2 healed, 1.tmp ignored
    # the reader must NOT delete the tmp: it may be a concurrent
    # appender's IN-FLIGHT write (the writer's own next swap cleans a
    # stale one); it is simply never read (r07 second review)
    assert os.path.exists(os.path.join(root, "delivery=1.tmp"))
    assert os.path.exists(os.path.join(root, "delivery=2", "_SUCCESS"))

    # replay guard: batch 2's replay sees only strictly earlier deliveries
    early = {r["doc_id"] for r in read_deliveries(spark, root, before_id=2).collect()}
    assert early == {100}

    # a BASE dir without _SUCCESS is still foreign/corrupt -> refused
    mk("delivery=3", [133])
    os.remove(os.path.join(root, "delivery=3", "_SUCCESS"))
    import pytest

    with pytest.raises(ValueError, match="_SUCCESS"):
        read_deliveries(spark, root)
    shutil.rmtree(os.path.join(root, "delivery=3"))


def test_stream_dedup_refuses_reset_checkpoint(spark, tmp_path):
    """r07 second review: a fresh/reset stream checkpoint over a
    persisting index must refuse loudly — proceeding would hide the
    standing index behind the replay guard AND overwrite its delivery
    dirs (silent dedup-coverage loss)."""
    import os

    import pytest

    from hypergraph_gpu_label_propagation_spark.streaming.dedup_stream import (
        run_stream_dedup,
    )

    state = str(tmp_path / "state")
    os.makedirs(os.path.join(state, "index"))
    spark.createDataFrame(
        [(1, 0, "b", [1, 2, 3, 4, 5, 6, 7, 8])],
        "doc_id long, band int, bucket string, sig array<long>",
    ).coalesce(1).write.parquet(os.path.join(state, "index", "delivery=5"))

    stream_dir = tmp_path / "docs"
    stream_dir.mkdir()
    spark.createDataFrame(
        [(0, "some text here")], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(stream_dir / "b1"))
    with pytest.raises(Exception, match="behind the delivery state"):
        run_stream_dedup(spark, str(stream_dir) + "/*", state)
