"""k-means + IVF ANN (operators/kmeans.py).

FP-reduction order makes centroid low bits run-dependent, so these
tests assert structure + recall on well-separated synthetic clusters
(exactly recoverable) and plan shape, not value hashes — the
approx_stats policy."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from hypergraph_gpu_label_propagation_spark.operators.kmeans import (
    ivf_topk,
    kmeans_fit,
)
from hypergraph_gpu_label_propagation_spark.operators.similarity import cosine_topk
from hypergraph_gpu_label_propagation_spark.plans.inspect import explain_str


DIM = 8
N_CLUSTERS = 4
PER_CLUSTER = 40


def _clustered_df(spark):
    rng = np.random.default_rng(11)
    centers = rng.uniform(-50, 50, size=(N_CLUSTERS, DIM))
    rows = []
    for ci in range(N_CLUSTERS):
        pts = centers[ci] + rng.normal(0, 0.5, size=(PER_CLUSTER, DIM))
        for j, p in enumerate(pts):
            rows.append((ci * PER_CLUSTER + j, [float(x) for x in p], ci))
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>, true_cluster int"),
        centers,
    )


def test_kmeans_recovers_separated_clusters(spark):
    df, _ = _clustered_df(spark)
    res = kmeans_fit(df, k=N_CLUSTERS, max_iters=10, seed=3)
    assert len(res.centroids) == N_CLUSTERS
    assert all(len(c) == DIM for c in res.centroids)
    # monotone refinement: shift sequence ends small
    assert res.shifts[-1] <= res.shifts[0] or res.shifts[-1] < 1e-3
    got = res.assignments.join(df.select("vec_id", "true_cluster"), "vec_id")
    # every true cluster maps to exactly one cell, and cells are distinct
    m = got.groupBy("true_cluster").agg(F.count_distinct("cell").alias("n")).collect()
    assert all(r["n"] == 1 for r in m)
    assert got.select("cell").distinct().count() == N_CLUSTERS


def test_kmeans_empty_cell_and_validation(spark):
    df, _ = _clustered_df(spark)
    with pytest.raises(ValueError, match="k must be"):
        kmeans_fit(df, k=0)
    with pytest.raises(ValueError, match="distinct vectors"):
        kmeans_fit(df.limit(3), k=5)


def test_ivf_topk_full_recall_on_separated_clusters(spark):
    """nprobe=1 on well-separated clusters: each query's true top-k
    lives in its own cell, so IVF must EQUAL the exact baseline."""
    df, _ = _clustered_df(spark)
    queries = df.filter(F.col("vec_id") % 40 == 0)  # one per cluster
    exact = cosine_topk(df, queries, k=5)
    approx = ivf_topk(
        df, queries, k=5, n_cells=N_CLUSTERS, nprobe=1, seed=3
    )
    e = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in approx.collect()}
    assert a == e


def test_ivf_topk_recall_on_real_embeddings(spark):
    """Plumbing + recall floor on the driver's unclustered testdata:
    probing half the cells of a random-ish corpus must recover most of
    the true neighbors, and ranks must be valid/dense per query."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.limit(8)
    exact = cosine_topk(emb, queries, k=5)
    approx = ivf_topk(emb, queries, k=5, n_cells=8, nprobe=4, seed=7)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    rows = approx.collect()
    a = {(r["query_id"], r["neighbor_id"]) for r in rows}
    assert len(a & e) / len(e) >= 0.5  # nprobe/n_cells=0.5 floor
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())


def test_ivf_probe_join_is_equi_join_no_cartesian(spark):
    df, _ = _clustered_df(spark)
    queries = df.limit(4)
    plan = explain_str(
        ivf_topk(df, queries, k=3, n_cells=N_CLUSTERS, nprobe=2, seed=3)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_round_dist_matches_full_precision_when_separated(spark):
    """round_dist (the cross-engine contract-row device: q_ivf_topk
    rounds assignment/probe sq-L2 to 6 decimals so the DuckDB twin's
    GROUP-BY-sum order can't flip an argmin) must be a no-op whenever
    inter-centroid separation >> 1e-6 — i.e. it changes WHICH cell only
    at true near-ties, never the well-separated case."""
    df, centers = _clustered_df(spark)
    queries = df.limit(6)
    cents = [[float(x) for x in c] for c in centers]
    kw = dict(k=3, n_cells=N_CLUSTERS, nprobe=2, centroids=cents)
    full = ivf_topk(df, queries, **kw).collect()
    rounded = ivf_topk(df, queries, round_dist=6, **kw).collect()
    key = lambda rows: sorted(
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rank"]) for r in rows
    )
    assert key(full) == key(rounded)


def test_ivf_cell_salt_exact_and_still_equi_join(spark):
    """cell_salt splits hot cells across shuffle partitions on the JOIN
    KEY ONLY — the candidate set (and thus every result row) must be
    IDENTICAL to the unsalted run, and the probe join must remain an
    equi-join with no cartesian fallback."""
    import pytest as _pytest

    df, centers = _clustered_df(spark)
    queries = df.limit(8)
    cents = [[float(x) for x in c] for c in centers]
    kw = dict(k=3, n_cells=N_CLUSTERS, nprobe=2, centroids=cents)
    base = ivf_topk(df, queries, **kw).collect()
    salted_df = ivf_topk(df, queries, cell_salt=4, **kw)
    salted = salted_df.collect()
    key = lambda rows: sorted(
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rank"]) for r in rows
    )
    assert key(base) == key(salted)
    plan = salted_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    with _pytest.raises(ValueError, match="cell_salt"):
        ivf_topk(df, queries, cell_salt=0, **kw)


def test_ivf_durable_index_parity_and_crash_safety(spark, monkeypatch):
    """r07 (verdict #4): the durable IVF index (inverted file bucketed
    by cell + centroid table + commit manifest) must return ROW-
    IDENTICAL results to inline ivf_topk with the same centroids; the
    probe join against the bucketed scan must stay an equi-join; and a
    half-written index (crash between the two table writes) must be
    refused, same both-or-neither protocol as the bucketed LP layout."""
    import pytest as _pytest

    from hypergraph_gpu_label_propagation_spark.operators.kmeans import (
        ivf_topk_from_index,
        should_index,
        write_ivf_index,
    )

    df, _ = _clustered_df(spark)
    queries = df.filter(F.col("vec_id") % 10 == 0)
    common = dict(k=4, nprobe=2)
    # salt >1 so the index round-trips the salt through the manifest
    write_ivf_index(df, "t_ivf_idx", n_cells=N_CLUSTERS, seed=7, cell_salt=2)
    cent = sorted(
        (r["cell"], tuple(r["centroid"]))
        for r in spark.table("t_ivf_idx_ivf_centroids").collect()
    )
    centroids = [list(c) for _, c in cent]
    inline = ivf_topk(
        df, queries, n_cells=N_CLUSTERS, centroids=centroids,
        cell_salt=2, **common,
    )
    from_index = ivf_topk_from_index(spark, "t_ivf_idx", queries, **common)
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, from_index.collect())
    )
    plan = explain_str(from_index)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan

    # crossover rule: index from the second query batch on
    assert not should_index(1) and should_index(2)

    # crash between the inverted-file write and the centroid write ->
    # the manifest is absent and the reader refuses the index
    writer_cls = type(df.write)
    real_save = writer_cls.saveAsTable
    calls = {"n": 0}

    def dying_save(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash mid index write")
        return real_save(self, *a, **kw)

    monkeypatch.setattr(writer_cls, "saveAsTable", dying_save)
    with _pytest.raises(RuntimeError, match="simulated crash"):
        write_ivf_index(df, "t_ivf_idx", n_cells=N_CLUSTERS, seed=7, cell_salt=2)
    monkeypatch.setattr(writer_cls, "saveAsTable", real_save)
    with _pytest.raises(ValueError, match="manifest"):
        ivf_topk_from_index(spark, "t_ivf_idx", queries, **common)


def test_ann_frontier_both_paths_same_fixture(spark):
    """r07 (verdict #6): both scale paths on the SAME real-embedding
    fixture, recall floors pinned from the measured frontier
    (BENCH_SCALING.md round-7: IVF dominates signlsh at equal wall on
    unstructured corpora at sf0.1 AND sf1 — recall 0.72 vs 0.26 best).
    Floors sit ~0.1 under the measured values (signlsh is plane-hash
    deterministic; IVF recall can wobble with Lloyd's FP reduction
    order): ivf(8 cells, nprobe 3) >= 0.5, signlsh(6 planes,
    multiprobe) >= 0.12, and IVF must stay strictly ahead — the
    documented guidance for choosing a path."""
    from hypergraph_gpu_label_propagation_spark.operators.similarity import (
        ann_recall,
        signlsh_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.select("embedding").first()["embedding"])
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    exact = cosine_topk(emb, queries, k=5).localCheckpoint(eager=True)
    lsh = signlsh_topk(
        emb, queries, k=5, dim=dim, num_planes=6, multiprobe=True
    )
    r_lsh = float(ann_recall(lsh, exact).collect()[0]["recall"])
    ivf = ivf_topk(emb, queries, k=5, n_cells=8, nprobe=3, seed=7)
    r_ivf = float(ann_recall(ivf, exact).collect()[0]["recall"])
    assert r_lsh >= 0.12, r_lsh
    assert r_ivf >= 0.5, r_ivf
    assert r_ivf > r_lsh  # the frontier's ordering, pinned


def test_stream_ivf_index_append_equals_rebuild(spark, tmp_path):
    """r07: streaming IVF appends.  The coarse quantizer is FROZEN at
    build time, so appended postings are a pure function of (batch,
    centroids) and base ∪ deliveries == a full rebuild's inverted file
    — probes over the streamed index must be ROW-IDENTICAL to
    ivf_topk_from_index over an index rebuilt on the full corpus with
    the same centroids (exact, not an estimate).  Replay-idempotence
    comes from the delivery=<id> two-rename swap (dedup_stream
    protocol, crash-tested there)."""
    from hypergraph_gpu_label_propagation_spark.operators.kmeans import (
        ivf_topk_from_index,
        write_ivf_index,
    )
    from hypergraph_gpu_label_propagation_spark.streaming.ann_stream import (
        run_stream_index_append,
        stream_ivf_topk,
    )

    df, _ = _clustered_df(spark)
    base = df.filter(F.col("vec_id") < 120).select("vec_id", "embedding")
    b1 = df.filter((F.col("vec_id") >= 120) & (F.col("vec_id") < 140)).select(
        "vec_id", "embedding"
    )
    b2 = df.filter(F.col("vec_id") >= 140).select("vec_id", "embedding")

    write_ivf_index(base, "t_annstr_base", n_cells=N_CLUSTERS, seed=5, cell_salt=2)
    cents = [
        [float(x) for x in r["centroid"]]
        for r in spark.table("t_annstr_base_ivf_centroids").orderBy("cell").collect()
    ]

    stream_dir = tmp_path / "emb_stream"
    stream_dir.mkdir()
    state = str(tmp_path / "ann_state")
    b1.coalesce(1).write.parquet(str(stream_dir / "b1"))
    r1 = run_stream_index_append(spark, str(stream_dir) + "/*", state, "t_annstr_base")
    b2.coalesce(1).write.parquet(str(stream_dir / "b2"))
    r2 = run_stream_index_append(spark, str(stream_dir) + "/*", state, "t_annstr_base")
    assert r1.rows_per_batch == [20] and r2.rows_per_batch == [20]

    queries = df.filter(F.col("vec_id") % 40 == 0).select("vec_id", "embedding")
    streamed = stream_ivf_topk(
        spark, "t_annstr_base", state, queries, k=4, nprobe=2
    )
    # rebuild on the FULL corpus with the SAME frozen centroids
    write_ivf_index(
        df.select("vec_id", "embedding"), "t_annstr_full",
        n_cells=N_CLUSTERS, centroids=cents, cell_salt=2,
    )
    rebuilt = ivf_topk_from_index(spark, "t_annstr_full", queries, k=4, nprobe=2)
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )
    # every streamed doc is probeable (b2's planted dups included)
    ids = {r["neighbor_id"] for r in streamed.collect()}
    assert ids & {int(r["vec_id"]) for r in b2.collect()}
