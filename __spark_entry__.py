"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (full hypergraph label
propagation to convergence on the sf0.001 lineitem-derived hypergraph).
``queries()`` exposes every implemented operator from SURVEY.md section 2
plus the training-data pipeline operators; ``oracle_sql()`` gives the
DuckDB-runnable ANSI-SQL twin for each SQL-expressible one.

Hypergraph for the relational test tables: hyperedges = orders,
vertices = parts, membership = lineitem (edge_id = l_orderkey,
vertex_id = l_partkey); initial labels = vertex_id % 10 over the dense
universe [0, max(l_partkey)].  This exercises the exact reference
semantics (majority vote, smallest-label tie-break, degree-0 -> 0) on
driver-provided data so DuckDB can cross-check.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hypergraph_gpu_label_propagation_spark.functions.text import (
    STOPWORDS,
    detect_language,
    fingerprint,
    lang_markers_rows,
    quality_features,
)
from hypergraph_gpu_label_propagation_spark.model import Hypergraph
from hypergraph_gpu_label_propagation_spark.operators.components import connected_components
from hypergraph_gpu_label_propagation_spark.operators.dedup import (
    MERSENNE31,
    SIMHASH_BITS,
    exact_dedup_groups,
    minhash_coeffs,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
)
from hypergraph_gpu_label_propagation_spark.operators.label_propagation import (
    edge_majority_step,
    label_propagation,
)
from hypergraph_gpu_label_propagation_spark.operators.pagerank import (
    hypergraph_pagerank,
    pagerank_state_init,
    pagerank_step,
)
from hypergraph_gpu_label_propagation_spark.operators.similarity import cosine_topk
from hypergraph_gpu_label_propagation_spark.operators.triangles import triangle_count

MAX_LABELS = 10
DAMPING = 0.85

# ---------------------------------------------------------------------------
# shared builders
# ---------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _incidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite incidence: hyperedge = order, vertex = part."""
    return (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").cast("long").alias("edge_id"),
            F.col("l_partkey").cast("long").alias("vertex_id"),
        )
        .distinct()
    )


def _nv(spark: SparkSession, sf_dir: str) -> int:
    return int(
        _t(spark, sf_dir, "lineitem").agg(F.max("l_partkey")).collect()[0][0]
    ) + 1


def _universe(spark: SparkSession, nv: int) -> DataFrame:
    return spark.range(nv).select(F.col("id").alias("vertex_id"))


def _labels0(spark: SparkSession, nv: int) -> DataFrame:
    """Deterministic initial labels: vertex_id % 10 over the universe."""
    return spark.range(nv).select(
        F.col("id").alias("vertex_id"), (F.col("id") % MAX_LABELS).cast("int").alias("label")
    )


def _freeze(spark: SparkSession, sf_dir: str) -> Hypergraph:
    return Hypergraph.freeze(spark, _incidence(spark, sf_dir))


# SQL CTE fragments shared by the oracle strings
_SQL_INC = (
    "inc AS (SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS edge_id, "
    "CAST(l_partkey AS BIGINT) AS vertex_id FROM lineitem)"
)
_SQL_UNI = (
    "uni AS (SELECT CAST(UNNEST(generate_series(0, "
    "(SELECT MAX(l_partkey) FROM lineitem))) AS BIGINT) AS vertex_id)"
)
_SQL_LAB0 = "lab0 AS (SELECT vertex_id, CAST(vertex_id % 10 AS INT) AS label FROM uni)"

# one LP phase as SQL: majority with (count desc, label asc) tie-break
def _sql_majority(src: str, key: str, out: str) -> str:
    return (
        f"{out} AS (SELECT {key}, CAST(label AS INT) AS label FROM ("
        f"  SELECT {key}, label, ROW_NUMBER() OVER (PARTITION BY {key} "
        f"  ORDER BY c DESC, label ASC) AS rn FROM ("
        f"    SELECT {key}, label, COUNT(*) AS c FROM {src} "
        f"    WHERE label >= 0 AND label < {MAX_LABELS} GROUP BY {key}, label)"
        f") WHERE rn = 1)"
    )


_SQL_EDGE_MAJ = (
    "ej AS (SELECT i.edge_id, l.label FROM inc i JOIN lab0 l USING (vertex_id)), "
    + _sql_majority("ej", "edge_id", "emaj")
)

# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full LP to convergence on the sf0.001 hypergraph."""
    sf_dir = "/root/testdata/sf0.001"
    hg = Hypergraph.freeze(spark, _incidence(spark, sf_dir))
    res = label_propagation(hg, _labels0(spark, hg.num_vertices), max_labels=MAX_LABELS)
    hg.unpersist()
    return res.labels


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_incidence(spark, sf_dir):
    return _incidence(spark, sf_dir)


def q_vertex_degrees(spark, sf_dir):
    inc = _incidence(spark, sf_dir)
    uni = _universe(spark, _nv(spark, sf_dir))
    deg = inc.groupBy("vertex_id").agg(F.count("*").alias("degree"))
    return uni.join(deg, "vertex_id", "left").select(
        "vertex_id", F.coalesce("degree", F.lit(0)).cast("long").alias("degree")
    )


def q_edge_sizes(spark, sf_dir):
    return (
        _incidence(spark, sf_dir)
        .groupBy("edge_id")
        .agg(F.count("*").cast("long").alias("edge_size"))
    )


def q_graph_profile(spark, sf_dir):
    """Graph-profiling surface: log2-bucketed vertex-degree and
    edge-size histograms with per-bucket extrema — the first query a
    10^12-file hypergraph needs (it drives the partition-count and
    skew-strategy choices in plans/tuning.py and plans/skew.py).  Pure
    narrow aggregation chain — r08 (guide §2.3): both histograms ride
    ONE melt pass (explode to (kind, key) rows) instead of a union of
    two branches that each re-scanned + re-deduplicated the incidence;
    rows identical, the oracle SQL is unchanged."""
    inc = _incidence(spark, sf_dir)

    melted = inc.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("vertex_degree").alias("kind"),
                    F.col("vertex_id").alias("k"),
                ),
                F.struct(
                    F.lit("edge_size").alias("kind"), F.col("edge_id").alias("k")
                ),
            )
        ).alias("_e")
    ).select(F.col("_e.kind").alias("kind"), F.col("_e.k").alias("k"))
    deg = melted.groupBy("kind", "k").agg(F.count("*").alias("d"))
    # bucket = floor(log2(d)) computed as bit-length - 1: EXACT
    # integer arithmetic (both engines), immune to FP log2 landing
    # epsilon below an integer for large counts
    return deg.select(
        "kind",
        (F.length(F.bin("d")) - 1).cast("int").alias("bucket"),
        F.col("d"),
    ).groupBy("kind", "bucket").agg(
        F.count("*").cast("long").alias("n"),
        F.min("d").cast("long").alias("min_count"),
        F.max("d").cast("long").alias("max_count"),
    )


def q_lp_edge_majority(spark, sf_dir):
    inc = _incidence(spark, sf_dir)
    labels = _labels0(spark, _nv(spark, sf_dir))
    return edge_majority_step(inc, labels, MAX_LABELS)


def q_lp_superstep(spark, sf_dir):
    """One full LP superstep through the engine path: freeze() caches the
    dual incidence layout ONCE (the previous hand-rolled variant computed
    the scan+distinct subtree twice — the r02 bench regression), run the
    superstep, eagerly checkpoint the result, then free the cache."""
    from hypergraph_gpu_label_propagation_spark.operators.label_propagation import (
        lp_superstep,
    )

    hg = _freeze(spark, sf_dir)
    out = (
        lp_superstep(hg, _labels0(spark, hg.num_vertices), MAX_LABELS)
        .select("vertex_id", "label", "changed")
        .localCheckpoint(eager=True)
    )
    hg.unpersist()
    return out


def q_lp_superstep_weighted(spark, sf_dir):
    """README.md:153 weighted-vote variant (1/edge_size per incident-edge
    vote in phase 2), flag-gated in the engine; unit weights stay the
    normative default."""
    from hypergraph_gpu_label_propagation_spark.operators.label_propagation import (
        lp_superstep,
    )

    hg = _freeze(spark, sf_dir)
    out = (
        lp_superstep(hg, _labels0(spark, hg.num_vertices), MAX_LABELS, weighted=True)
        .select("vertex_id", "label", "changed")
        .localCheckpoint(eager=True)
    )
    hg.unpersist()
    return out


def q_lp_converged(spark, sf_dir):
    hg = _freeze(spark, sf_dir)
    res = label_propagation(hg, _labels0(spark, hg.num_vertices), max_labels=MAX_LABELS)
    hg.unpersist()
    return res.labels


def q_lp_converged_bucketed(spark, sf_dir):
    """LP to convergence over the DURABLE bucketed dual layout
    (sources/bucketed.py): the incidence is persisted as two
    bucketed+sorted tables (by vertex_id / by edge_id), then every
    superstep join reads the bucketed scans with NO Exchange on the
    incidence side (asserted in tests/test_bucketed.py).  End-to-end
    this is the 100 TB deployment shape — Iceberg bucket-transform
    tables on a real cluster — run under the driver gate with the SAME
    oracle as lp_converged (the layout must not change the answer)."""
    from hypergraph_gpu_label_propagation_spark.sources.bucketed import (
        freeze_from_bucketed,
        write_bucketed,
    )

    write_bucketed(_incidence(spark, sf_dir), "lp_headline_bucketed")
    hg = freeze_from_bucketed(spark, "lp_headline_bucketed", persist=True)
    res = label_propagation(hg, _labels0(spark, hg.num_vertices), max_labels=MAX_LABELS)
    hg.unpersist()
    return res.labels


def q_connected_components(spark, sf_dir):
    hg = _freeze(spark, sf_dir)
    res = connected_components(hg)
    hg.unpersist()
    return res.components


def q_pagerank_2iter(spark, sf_dir):
    """Two loop-safe (fully lazy) pagerank_iteration composes: the
    dangling mass is a broadcast scalar subquery inside each iteration's
    plan, so the whole query is ONE job with zero driver collects."""
    from hypergraph_gpu_label_propagation_spark.operators.pagerank import (
        pagerank_iteration,
    )

    hg = _freeze(spark, sf_dir)
    inv_degree = hg.incidence_by_vertex.groupBy("vertex_id").agg(
        (F.lit(1.0) / F.count("*")).alias("inv_degree")
    )
    ranks = hg.vertices().select(
        "vertex_id", F.lit(1.0 / hg.num_vertices).cast("double").alias("rank")
    )
    for _ in range(2):
        ranks = pagerank_iteration(hg, ranks, inv_degree, DAMPING)
    return ranks.select("vertex_id", F.round("rank", 6).alias("rank"))


def q_pagerank_converged(spark, sf_dir):
    hg = _freeze(spark, sf_dir)
    # tol=1e-7 on the L1 delta bounds per-vertex error by
    # delta * d/(1-d) ~ 5.7e-7 < the north rule's allclose(1e-6)
    res = hypergraph_pagerank(hg, damping=DAMPING, tol=1e-7)
    hg.unpersist()
    return res.ranks.select("vertex_id", F.round("rank", 6).alias("rank"))


SUPP_OFFSET = 1_000_000  # part and supplier key ranges overlap — disjoin them


def _edge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed part -> supplier edge table (the north rule's literal
    'link graph over an edge table' reading; offset keeps the two id
    ranges disjoint)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").cast("long").alias("src"),
            (F.col("l_suppkey").cast("long") + SUPP_OFFSET).alias("dst"),
        )
        .distinct()
    )


def q_edges_pagerank(spark, sf_dir):
    """Directed PageRank over the plain edge table
    (operators/digraph.py::pagerank_edges — out-degree normalized,
    dangling mass redistributed, tol=1e-7 L1 stopping rule); oracle is
    the same recursive-CTE pattern as pagerank_converged, directed."""
    from hypergraph_gpu_label_propagation_spark.operators.digraph import pagerank_edges

    res = pagerank_edges(_edge_table(spark, sf_dir), damping=DAMPING, tol=1e-7)
    return res.ranks.select("vertex_id", F.round("rank", 6).alias("rank"))


def q_edges_cc(spark, sf_dir):
    """Connected components over the plain edge table (undirected
    semantics: symmetrized adjacency, min-label propagation +
    pointer jumping)."""
    from hypergraph_gpu_label_propagation_spark.operators.digraph import (
        connected_components_edges,
    )

    res = connected_components_edges(_edge_table(spark, sf_dir))
    return res.components.select("vertex_id", F.col("component").cast("long"))


def q_edges_triangles(spark, sf_dir):
    """Triangle count over a plain edge table with actual triangles
    (same-order part pairs — the clique-expanded co-occurrence edges)."""
    from hypergraph_gpu_label_propagation_spark.operators.digraph import (
        triangle_count_edges,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").cast("long").alias("p")
    )
    edges = (
        li.alias("a").join(li.alias("b"), "o")
        .filter(F.col("a.p") < F.col("b.p"))
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .distinct()
    )
    return triangle_count_edges(edges).select(
        F.col("n_triangles").cast("long").alias("n_triangles")
    )


def q_lp_edges(spark, sf_dir):
    """Reference LP semantics on a PAIRWISE graph (digraph.py::lp_edges:
    every (src,dst) row is a size-2 hyperedge) over the same-order part
    co-occurrence edges — the edge-table face of the LP engine; oracle
    is the unrolled fixed-point CTE with the pairwise incidence."""
    from hypergraph_gpu_label_propagation_spark.operators.digraph import lp_edges

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").cast("long").alias("p")
    )
    edges = (
        li.alias("a").join(li.alias("b"), "o")
        .filter(F.col("a.p") < F.col("b.p"))
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .distinct()
    )
    res = lp_edges(edges, _labels0(spark, _nv(spark, sf_dir)), max_labels=MAX_LABELS)
    return res.labels


PPR_SEEDS = [1, 7, 42]


def q_ppr(spark, sf_dir):
    """Personalized PageRank from a 3-seed restart set (restart AND
    dangling mass return to the seed distribution); recursive-CTE twin
    replicates the identical L1 stopping rule and update, so both
    engines run the same iteration count."""
    from hypergraph_gpu_label_propagation_spark.operators.pagerank import (
        personalized_pagerank,
    )

    hg = _freeze(spark, sf_dir)
    res = personalized_pagerank(hg, seeds=PPR_SEEDS, damping=DAMPING, tol=1e-7)
    hg.unpersist()
    return res.ranks.select("vertex_id", F.round("rank", 6).alias("rank"))


def q_edges_hits(spark, sf_dir):
    """HITS hubs/authorities over the part->supplier edge table, fixed
    12 iterations with L1 normalization (digraph.py::hits_edges); the
    twin replicates the identical round structure in a recursive CTE."""
    from hypergraph_gpu_label_propagation_spark.operators.digraph import hits_edges

    return hits_edges(_edge_table(spark, sf_dir), iterations=12)


def q_kcore(spark, sf_dir):
    """k-core (k=90) of the co-occurrence graph by iterative peeling
    (operators/kcore.py); at sf0.01 this takes 4 peel rounds to a
    527-vertex core.  Oracle: recursive CTE carrying the alive set with
    a shrink guard (same pattern as the pagerank_converged twin)."""
    from hypergraph_gpu_label_propagation_spark.operators.kcore import k_core

    hg = _freeze(spark, sf_dir)
    res = k_core(hg, k=90)
    hg.unpersist()
    return res.membership.select(F.col("vertex_id").cast("long"), "in_core")


def q_coreness(spark, sf_dir):
    """Full k-core decomposition (per-vertex core number) via the
    iterated h-index fixed point (operators/kcore.py::coreness); the
    oracle replicates the SAME iteration as a recursive CTE with a
    change-count guard, so both engines stop at the identical fixed
    point (which IS coreness — Lü et al. 2016)."""
    from hypergraph_gpu_label_propagation_spark.operators.kcore import coreness

    hg = _freeze(spark, sf_dir)
    res = coreness(hg)
    hg.unpersist()
    return res.coreness.select(F.col("vertex_id").cast("long"), "coreness")


def q_lp_modularity(spark, sf_dir):
    """Community-quality evaluation: Newman modularity of the CONVERGED
    LP labeling on the clique-expanded co-occurrence graph — the metric
    that closes the loop from 'LP ran' to 'LP found structure'.  The
    twin nests the unrolled LP fixed-point CTE inside the modularity
    SQL, so the whole run->evaluate pipeline is hash-checked."""
    from hypergraph_gpu_label_propagation_spark.operators.triangles import modularity

    hg = _freeze(spark, sf_dir)
    res = label_propagation(hg, _labels0(spark, hg.num_vertices), max_labels=MAX_LABELS)
    out = modularity(hg, res.labels).localCheckpoint(eager=True)
    hg.unpersist()
    return out


def q_ktruss(spark, sf_dir):
    """k-truss (k=17) of the co-occurrence graph — the EDGE-level
    decomposition beside kcore/coreness (operators/ktruss.py); oracle is
    the recursive-CTE edge peel with the kcore twin's shrink guard."""
    from hypergraph_gpu_label_propagation_spark.operators.ktruss import k_truss

    hg = _freeze(spark, sf_dir)
    res = k_truss(hg, k=17)
    hg.unpersist()
    return res.membership.select(
        F.col("u").cast("long"), F.col("v").cast("long"), "in_truss"
    )


def q_triangle_count(spark, sf_dir):
    hg = _freeze(spark, sf_dir)
    return triangle_count(hg).select(F.col("n_triangles").cast("long").alias("n_triangles"))


def q_triangles_per_vertex(spark, sf_dir):
    from hypergraph_gpu_label_propagation_spark.operators.triangles import (
        per_vertex_triangle_count,
    )

    hg = _freeze(spark, sf_dir)
    return per_vertex_triangle_count(hg).select(
        "vertex_id", F.col("n_triangles").cast("long").alias("n_triangles")
    )


def q_near_dup(spark, sf_dir):
    """r07 tagged union: the near-dup PAIR view (verbatim r04-r06 row)
    plus the fuzzy-dedup CLUSTER view built on the SAME pair frame
    (dedup_clusters: min-label CC over the pair graph, keeper = min id,
    singletons keep themselves).  The pair frame is eagerly
    localCheckpointed so the minhash pipeline runs once for both tags
    (CC references pairs iteratively — multi-reference lineage would
    otherwise recompute it per round)."""
    from hypergraph_gpu_label_propagation_spark.operators.dedup import (
        dedup_clusters,
        near_dup_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = near_dup_pairs(
        docs, "doc_id", "text", threshold=0.05
    ).localCheckpoint(eager=True)
    clusters = dedup_clusters(docs, "doc_id", "text", pairs=pairs)
    return (
        pairs.select(
            F.lit("pair").alias("tag"),
            F.col("id_a").cast("long").alias("k1"),
            F.col("id_b").cast("long").alias("k2"),
            F.col("jaccard").cast("double").alias("val"),
        )
        .unionByName(
            clusters.select(
                F.lit("cluster").alias("tag"),
                F.col("doc_id").cast("long").alias("k1"),
                F.col("cluster_id").cast("long").alias("k2"),
                F.col("keep").cast("double").alias("val"),
            )
        )
    )


def q_dedup_exact(spark, sf_dir):
    return exact_dedup_groups(_t(spark, sf_dir, "documents"), "doc_id", "text").select(
        "content_hash", F.col("keep_id").cast("long"), F.col("n_dups").cast("long")
    )


def q_text_profile(spark, sf_dir):
    """The whole per-document text-analysis surface in ONE scan — the
    production shape (compute every stat in one pass over the corpus):
    quality features (length/diversity/stopword), regex + BPE-ish token
    counts, content fingerprint, and language ID.  Replaces the four
    separate round-3 contract rows (text_quality/langid/tokens/
    fingerprint; driver gate caps at 50 entries) with identical
    per-column semantics."""
    from hypergraph_gpu_label_propagation_spark.functions.text import (
        bpe_token_estimate,
        regex_tokens,
    )

    from hypergraph_gpu_label_propagation_spark.functions.text import (
        distinct_token_count,
        stopword_count,
        token_count,
    )

    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    nt = token_count(t)
    # every column-expression stat in ONE projection over ONE scan (no
    # self-join); only the language-ID winner (a genuine aggregation)
    # joins in, and it is vertex... doc-sized, not corpus-text-sized
    wide = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length(t).cast("long").alias("n_chars"),
        nt.cast("long").alias("n_tokens"),
        distinct_token_count(t).cast("long").alias("n_distinct"),
        F.round(distinct_token_count(t) / nt, 6).alias("distinct_ratio"),
        F.round(stopword_count(t) / nt, 6).alias("stopword_ratio"),
        F.size(regex_tokens(t)).cast("long").alias("n_regex_tokens"),
        bpe_token_estimate(t).cast("long").alias("bpe_estimate"),
        fingerprint(t).alias("fp"),
    )
    lang = detect_language(docs, "doc_id", "text").select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang_guess"
    )
    return wide.join(lang, "doc_id")


def q_doc_repetition(spark, sf_dir):
    """r07 tagged union of two per-doc quality signals: 'rep' = the
    verbatim Gopher §A.1.1 duplicate-3-gram fraction; 'lm' = the
    CCNet-style unigram LM score (mean log2 P(token) under the
    corpus's own add-k-smoothed unigram distribution — the perplexity
    filter in its model-free simplification)."""
    from hypergraph_gpu_label_propagation_spark.functions.text import (
        repetition_features,
        unigram_logprob,
    )

    docs = _t(spark, sf_dir, "documents")
    rep = repetition_features(docs, "doc_id", "text", n=3).select(
        F.lit("rep").alias("tag"),
        F.col("doc_id").cast("long"),
        F.col("n_ngrams").alias("c1"),
        F.col("n_distinct_ngrams").alias("c2"),
        F.col("dup_ngram_ratio").alias("val"),
    )
    lm = unigram_logprob(docs, "doc_id", "text").select(
        F.lit("lm").alias("tag"),
        F.col("doc_id").cast("long"),
        F.col("n_scored_tokens").cast("long").alias("c1"),
        F.lit(0).cast("long").alias("c2"),
        F.col("lm_logprob").alias("val"),
    )
    return rep.unionByName(lm)


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag documents sharing any 3-token
    shingle with the (deterministic) benchmark subset doc_id % 97 == 0
    — broadcast benchmark-shingle join, no corpus-side shuffle."""
    from hypergraph_gpu_label_propagation_spark.operators.decontam import (
        decontaminate,
    )

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return decontaminate(docs, bench, "doc_id", "text", n=3).select(
        F.col("doc_id").cast("long"), "n_hit_shingles", "contaminated"
    )


def q_stratified_sample(spark, sf_dir):
    """Per-language rebalancing sample (keep all de, half of en, ...)
    — deterministic per-stratum hash rates, engine/retry-stable."""
    from hypergraph_gpu_label_propagation_spark.functions.sampling import (
        stratified_sample,
    )

    docs = _t(spark, sf_dir, "documents")
    rates = {"de": 1.0, "en": 0.5, "es": 0.25, "fr": 0.1, "zh": 0.75}
    return stratified_sample(docs, "doc_id", "lang", rates, seed=11).select(
        F.col("doc_id").cast("long"), "lang"
    )


def q_doc_split(spark, sf_dir):
    """Deterministic leakage-free train/val/test split + hash sampling:
    assignment is a pure function of (doc_id, seed) via the md5 60-bit
    hash, so it is stable across runs/engines/retries (rand() is not).

    r07 tagged union: the verbatim split view ('split' rows, rnk=0)
    plus the training-shard assignment ('shard' rows: shard id as grp,
    seeded within-shard shuffle rank as rnk — the export_shards
    order)."""
    from hypergraph_gpu_label_propagation_spark.functions.sampling import (
        hash_sample,
        hash_split,
        shard_assignment,
    )

    docs = _t(spark, sf_dir, "documents")
    split = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    sampled = hash_sample(split, "doc_id", 0.5, seed=7).select(
        F.lit("split").alias("tag"),
        F.col("doc_id").cast("long"),
        F.col("split").alias("grp"),
        F.lit(0).cast("long").alias("rnk"),
    )
    shards = shard_assignment(docs, "doc_id", num_shards=8, seed=42).select(
        F.lit("shard").alias("tag"),
        F.col("doc_id").cast("long"),
        F.col("shard").cast("string").alias("grp"),
        F.col("shard_rank").cast("long").alias("rnk"),
    )
    return sampled.unionByName(shards)


def q_ngram_jaccard(spark, sf_dir):
    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.1
    ).select(F.col("id_a").cast("long"), F.col("id_b").cast("long"), "jaccard")


def q_minhash_signatures(spark, sf_dir):
    sig = minhash_signatures(_t(spark, sf_dir, "documents"), "doc_id", "text")
    return sig.select(F.col("doc_id").cast("long"), *[F.col(f"mh{i}").cast("long") for i in range(8)])


def q_minhash_lsh(spark, sf_dir):
    return minhash_lsh_candidates(
        _t(spark, sf_dir, "documents"), "doc_id", "text"
    ).select(F.col("id_a").cast("long"), F.col("id_b").cast("long"))


def q_simhash(spark, sf_dir):
    return simhash64(_t(spark, sf_dir, "documents"), "doc_id", "text").select(
        F.col("doc_id").cast("long"), F.col("simhash").cast("long")
    )


def q_cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 8), k=5).select(
        F.col("query_id").cast("long"),
        F.col("neighbor_id").cast("long"),
        "cos_sim",
        F.col("rank").cast("long"),
    )


def q_signlsh_topk(spark, sf_dir):
    """ANN scale path under the driver gate: sign-LSH buckets (8 md5
    Rademacher planes) + hamming-1 multiprobe + exact cosine re-rank on
    candidates only.  Fully deterministic, so the DuckDB twin reproduces
    buckets, probes, and ranking exactly."""
    from hypergraph_gpu_label_propagation_spark.operators.similarity import (
        signlsh_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return signlsh_topk(
        emb, emb.filter(F.col("vec_id") < 8), k=5, num_planes=8,
        multiprobe=True, dim=64,
    ).select(
        F.col("query_id").cast("long"),
        F.col("neighbor_id").cast("long"),
        "cos_sim",
        F.col("rank").cast("long"),
    )


def q_ann_topk(spark, sf_dir):
    """The exact broadcast baseline (cosine_topk) and the bucketed
    scale path (signlsh_topk) as ONE tagged-union driver row — same
    (query_id, neighbor_id, cos_sim, rank) shape, `method` tag — to
    free a board slot (driver gate caps at 50) for ivf_topk."""
    exact = q_cosine_topk(spark, sf_dir).select(F.lit("exact").alias("method"), "*")
    lsh = q_signlsh_topk(spark, sf_dir).select(F.lit("signlsh").alias("method"), "*")
    return exact.unionByName(lsh)


def q_ivf_topk(spark, sf_dir):
    """IVF ANN (operators/kmeans.py) under the driver gate, made
    cross-engine deterministic: centroids are the embeddings of the 4
    hash-min (h60 of vec_id, repo-wide md5 pattern) corpus vectors —
    skipping Lloyd iterations, whose FP mean-reduction order is
    engine-specific — and assignment/probe distances round to 6
    decimals (round_dist) exactly like cos_sim, so the DuckDB twin
    reproduces cell assignment, the nprobe=2 probe set, and the final
    ranking value-for-value.  The kmeans_fit-built index (farthest-
    point init + Lloyd) is exercised in pytest via recall against the
    exact baseline; this row pins the IVF probe/join/re-rank plumbing."""
    from hypergraph_gpu_label_propagation_spark.operators.dedup import h60
    from hypergraph_gpu_label_propagation_spark.operators.kmeans import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    seeds = (
        emb.select("vec_id", "embedding")
        .orderBy(h60(F.col("vec_id").cast("string")).asc(), F.col("vec_id").asc())
        .limit(4)
        .collect()
    )
    centroids = [[float(x) for x in r["embedding"]] for r in seeds]
    return ivf_topk(
        emb, emb.filter(F.col("vec_id") < 8), k=5, n_cells=4, nprobe=2,
        centroids=centroids, round_dist=6,
    ).select(
        F.col("query_id").cast("long"),
        F.col("neighbor_id").cast("long"),
        "cos_sim",
        F.col("rank").cast("long"),
    )


def q_embedding_near_dup(spark, sf_dir):
    """Embedding near-dup at scale: banded sign-LSH candidates (4 bands x
    8 deterministic md5 Rademacher planes) + exact cosine verify on the
    candidate set only — no all-pairs stage (round-1 verdict fix).  The
    0.25 threshold fits the synthetic embeddings' similarity range (max
    pairwise cos ~0.51)."""
    from hypergraph_gpu_label_propagation_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(
        emb, "vec_id", "embedding", dim=64, threshold=0.25
    ).select(F.col("id_a").cast("long"), F.col("id_b").cast("long"), "cos_sim")


def q_multimodal_decode(spark, sf_dir):
    """Multimodal plumbing under the driver gate: synthetic binary assets
    -> Arrow mapInPandas pseudo-decode (FAKE backend; REAL is the
    documented codec stub).  The DuckDB twin re-derives the metadata from
    sha256 of the payload's hex, so the full binary->metadata path is
    value-hash-checked."""
    from hypergraph_gpu_label_propagation_spark.operators.multimodal import (
        decode_assets,
        synth_assets,
    )

    dec = decode_assets(synth_assets(spark, n=64))
    return dec.select(
        F.col("asset_id").cast("long"),
        "kind",
        F.col("width").cast("int"),
        F.col("height").cast("int"),
        F.col("n_frames").cast("int"),
        F.col("sample_rate").cast("int"),
        "duration_ms",
    )


def q_events_window(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            # ts is TIMESTAMP_NTZ: cast-to-string is wall-clock and
            # session-timezone-independent (unix_timestamp would route
            # NTZ through the session timezone)
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            F.col("n_events").cast("long"),
            "sum_value",
        )
    )


def q_events_stream(spark, sf_dir):
    """Structured Streaming contract query: drive the watermarked
    tumbling-window aggregation (streaming/events.py) over a file stream
    to completion into a memory sink.  Complete output mode emits every
    window, so the result equals the batch twin exactly and the existing
    events_window oracle SQL verifies the STREAMING path end-to-end
    (append-mode late-data semantics are pytest-covered)."""
    import shutil
    import tempfile
    import uuid

    from hypergraph_gpu_label_propagation_spark.streaming.events import (
        run_to_completion,
        stream_events_window,
    )

    tmp = tempfile.mkdtemp(prefix="events_stream_")
    try:
        src = f"{sf_dir}/events.parquet"
        # flatten: a Spark-written events.parquet is a DIRECTORY of part
        # files, and readStream.parquet(tmp) does NOT recurse into
        # subdirectories — nesting the copied dir silently yields an
        # empty stream (caught by the sf1 scaling audit, r05)
        if os.path.isdir(src):
            for fname in os.listdir(src):
                if fname.endswith(".parquet"):
                    shutil.copy(os.path.join(src, fname), tmp)
        else:
            shutil.copy(src, tmp)
        name = f"events_stream_{uuid.uuid4().hex[:8]}"
        out = run_to_completion(
            stream_events_window(spark, tmp), name, output_mode="complete"
        )
        # memory sink holds the rows; localCheckpoint detaches the plan
        # from the temp files/table so cleanup below is safe
        result = out.localCheckpoint(eager=True)
        spark.catalog.dropTempView(name)  # don't accumulate sink views
        return result
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_events_user_stats(spark, sf_dir):
    """Custom stateful streaming operator under the driver gate:
    ``applyInPandasWithState`` running per-user (count, sum, max) in
    update mode (streaming/events.py::stream_user_stats).  Emitted rows
    are strictly increasing in n_events per user, so the final state =
    the max-n_events row per user, which must equal the batch aggregate
    — the DuckDB twin computes exactly that."""
    import shutil
    import tempfile
    import uuid

    from hypergraph_gpu_label_propagation_spark.streaming.events import (
        run_to_completion,
        stream_user_stats,
    )

    tmp = tempfile.mkdtemp(prefix="events_user_stats_")
    try:
        src = f"{sf_dir}/events.parquet"
        # flatten: a Spark-written events.parquet is a DIRECTORY of part
        # files, and readStream.parquet(tmp) does NOT recurse into
        # subdirectories — nesting the copied dir silently yields an
        # empty stream (caught by the sf1 scaling audit, r05)
        if os.path.isdir(src):
            for fname in os.listdir(src):
                if fname.endswith(".parquet"):
                    shutil.copy(os.path.join(src, fname), tmp)
        else:
            shutil.copy(src, tmp)
        name = f"user_stats_{uuid.uuid4().hex[:8]}"
        out = run_to_completion(stream_user_stats(spark, tmp), name, "update")
        final = (
            out.groupBy("user_id")
            .agg(F.max(F.struct("n_events", "sum_value", "max_value")).alias("_f"))
            .select(
                F.col("user_id").cast("long"),
                F.col("_f.n_events").cast("long").alias("n_events"),
                F.round("_f.sum_value", 6).alias("sum_value"),
                F.round("_f.max_value", 6).alias("max_value"),
            )
            .localCheckpoint(eager=True)
        )
        spark.catalog.dropTempView(name)
        return final
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_events_sessions(spark, sf_dir):
    """Per-user gap-based sessionization via session_window (4h gap) —
    the batch twin of streaming/events.py::stream_events_sessions; the
    DuckDB oracle is the classic lag/cumsum islands SQL."""
    from hypergraph_gpu_label_propagation_spark.streaming.events import sessionize

    return sessionize(_t(spark, sf_dir, "events"), gap="4 hours")


def q_agg_pushdown(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    # l_shipdate is TIMESTAMP_NTZ in the parquet: wall-clock semantics,
    # so the literal comparison is session-timezone-independent in both
    # engines (DuckDB TIMESTAMP literals are likewise naive)
    return (
        li.filter(F.col("l_shipdate") < "1998-09-03")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count("*").cast("long").alias("n_rows"),
        )
    )


def q_agg_rollup(spark, sf_dir):
    """Multi-level aggregation (ROLLUP) over the lineitem flags — the
    grouping-sets surface of the relational checklist; grouping ids
    exported as flags so the oracle's NULL-vs-value semantics are
    unambiguous in the hash."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
    )


def q_agg_relational(spark, sf_dir):
    """Tagged union of the former agg_pushdown + agg_rollup rows (r06:
    folded to free a board slot for text_prep_chunks under the driver
    gate's 50-row cap — the degree_surface precedent; both originals
    ride verbatim under UNION ALL in the oracle)."""
    pd = q_agg_pushdown(spark, sf_dir).select(
        F.lit("pushdown").alias("src"),
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
        "sum_qty",
        "revenue",
        "n_rows",
    )
    ru = q_agg_rollup(spark, sf_dir).select(
        F.lit("rollup").alias("src"),
        "returnflag",
        "linestatus",
        "sum_qty",
        F.lit(None).cast("double").alias("revenue"),
        "n_rows",
    )
    return pd.unionByName(ru)


# text_prep_chunks injects deterministic PII + whitespace junk into the
# documents text IN-QUERY (both engines build the identical string) so
# the scrub patterns and the newline-collapsing normalizer genuinely
# fire on every row — the raw synthetic corpus contains neither.
_TP_SIZE, _TP_OVERLAP = 32, 8


def q_text_prep_chunks(spark, sf_dir):
    """Training-corpus text prep under the driver gate: PII-injected
    documents -> normalize_ws -> scrub_pii -> overlapping token-window
    chunking (functions/text.py, functions/chunking.py) — the DuckDB
    twin re-derives the full regex chain and the window arithmetic."""
    from hypergraph_gpu_label_propagation_spark.functions.chunking import (
        chunk_documents,
    )
    from hypergraph_gpu_label_propagation_spark.functions.text import (
        normalize_ws,
        scrub_pii,
    )

    docs = _t(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or 10.0."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(".7 ssn 123-45-6789 \t call 415-555-0199 \n\n\n\n tail"),
    )
    cleaned = docs.select("doc_id", scrub_pii(normalize_ws(aug)).alias("text"))
    return chunk_documents(cleaned, size=_TP_SIZE, overlap=_TP_OVERLAP).select(
        F.col("doc_id").cast("long"),
        F.col("chunk_idx").cast("int"),
        F.col("n_tokens").cast("int"),
        "chunk",
    )


def q_quantiles(spark, sf_dir):
    """Exact interpolated quantiles per group (Spark percentile() ==
    DuckDB quantile_cont(), both linear interpolation on sorted values) —
    the distribution-statistics surface a corpus-quality pipeline needs;
    exact, not approx_percentile, so it is oracle-checkable."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_quantity, array(0.5D, 0.9D))").alias("_q"))
        .select(
            "l_returnflag",
            F.round(F.element_at("_q", 1), 6).alias("p50"),
            F.round(F.element_at("_q", 2), 6).alias("p90"),
        )
    )


def q_approx_stats(spark, sf_dir):
    """Approximate-statistics surface (functions/stats.py): exact
    per-group quantiles + distinct counts (hash-checked by the twin)
    alongside sketch forms (approx_percentile / HyperLogLog++), with
    per-group ``*_ok`` tolerance flags certifying the sketches against
    the exact values.  Sketch internals are engine-specific, so the
    cross-engine contract for the approx columns is the tolerance flag
    (oracle emits the expected flag = 1), while exact columns compare
    value-exactly as usual."""
    from hypergraph_gpu_label_propagation_spark.functions.stats import (
        stats_with_tolerance,
    )

    return stats_with_tolerance(
        _t(spark, sf_dir, "lineitem"),
        ["l_returnflag"],
        value_col="l_quantity",
        key_col="l_partkey",
    )


def q_set_ops_nations(spark, sf_dir):
    """Set-op coverage (SURVEY section 2.5): distinct union of customer
    and supplier nation keys."""
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.union(supp).distinct().select(F.col("nationkey").cast("int"))


def q_gen_uniform(spark, sf_dir):
    """Generator surface (G1): seeded uniform hypergraph via the
    hash-ranked sampler (sources/generators.py) — every step is md5
    arithmetic, so the DuckDB twin regenerates the IDENTICAL incidence
    and the driver hash-checks the generator end-to-end."""
    from hypergraph_gpu_label_propagation_spark.sources.generators import uniform_hypergraph

    return uniform_hypergraph(spark, num_vertices=500, num_edges=1000, seed=42)


def q_gen_fixed(spark, sf_dir):
    """Generator surface (G2): d-uniform Erdos-Renyi (every edge exactly
    edge_size members), same hash-ranked sampler, same exact twin."""
    from hypergraph_gpu_label_propagation_spark.sources.generators import fixed_hypergraph

    return fixed_hypergraph(spark, num_vertices=300, num_edges=500, edge_size=4, seed=7)


def q_gen_planted(spark, sf_dir):
    """Generator surface (G3): planted-partition hypergraph via the
    hash-ranked sampler (intra-community bias + outside top-up, all md5
    arithmetic) — DuckDB regenerates the identical incidence."""
    from hypergraph_gpu_label_propagation_spark.sources.generators import (
        planted_partition_hypergraph,
    )

    return planted_partition_hypergraph(
        spark, num_vertices=500, num_edges=800, communities=8,
        p_intra=0.85, seed=11,
    )


def q_gen_hsbm(spark, sf_dir):
    """Generator surface (G4): hSBM rejection sampler via the hash-ranked
    machinery.  Parameters chosen so the FIRST candidate pool suffices
    (acceptance >= p_inter = 0.5 per candidate, pool = 4x edges), which
    makes the driver's pool-doubling loop deterministic and the DuckDB
    twin exact."""
    from hypergraph_gpu_label_propagation_spark.sources.generators import hsbm_hypergraph

    return hsbm_hypergraph(
        spark, num_vertices=400, num_edges=300, communities=8,
        p_intra=0.9, p_inter=0.5, min_edge_size=2, max_edge_size=4, seed=13,
    )


def q_generators(spark, sf_dir):
    """All four generator surfaces (G1-G4) as ONE contract row: the
    driver's checked set records at most 50 entries (CORRECTNESS_r03
    had 50 rows for 53 queries and silently dropped the last three
    registered), so the four per-generator queries are unioned with a
    ``gen`` tag — each component is byte-identical to its round-3
    standalone query/oracle pair, and a hash mismatch in ANY generator
    still fails the row."""
    from hypergraph_gpu_label_propagation_spark.sources.generators import (
        fixed_hypergraph,
        hsbm_hypergraph,
        planted_partition_hypergraph,
        uniform_hypergraph,
    )

    def tag(df, name):
        return df.select(
            F.lit(name).alias("gen"),
            F.col("edge_id").cast("long"),
            F.col("vertex_id").cast("long"),
        )

    return (
        tag(uniform_hypergraph(spark, num_vertices=500, num_edges=1000, seed=42),
            "uniform")
        .unionByName(tag(
            fixed_hypergraph(spark, num_vertices=300, num_edges=500,
                             edge_size=4, seed=7), "fixed"))
        .unionByName(tag(
            planted_partition_hypergraph(
                spark, num_vertices=500, num_edges=800, communities=8,
                p_intra=0.85, seed=11), "planted"))
        .unionByName(tag(
            hsbm_hypergraph(
                spark, num_vertices=400, num_edges=300, communities=8,
                p_intra=0.9, p_inter=0.5, min_edge_size=2,
                max_edge_size=4, seed=13), "hsbm"))
    )


def q_source_files_hypergraph(spark, sf_dir):
    """Flagship derivation (input_hint): synthetic source_files table ->
    repo/commit hyperedges with the sha256 provenance invariant enforced
    during construction.  Oracle-checked: dense ids are global key ranks
    (sources/source_files.py::dense_ids), so DuckDB reproduces the whole
    derivation with ROW_NUMBER() window twins."""
    from hypergraph_gpu_label_propagation_spark.sources.source_files import (
        derive_hypergraph_frames,
        synth_source_files,
    )

    sf = synth_source_files(spark, n_repos=10, files_per_repo=12, commits_per_repo=3)
    incidence, _, _ = derive_hypergraph_frames(sf, verify_sha256=True)
    return incidence.select(
        F.col("edge_id").cast("long"), F.col("vertex_id").cast("long")
    )


def q_degree_surface(spark, sf_dir):
    """Accessor surface (B4) as ONE tagged-union row: per-vertex degrees
    (universe left-join — isolated vertices report 0) UNION per-edge
    sizes.  Folds the former vertex_degrees + edge_sizes rows to free
    board slots under the driver's 50-row gate (r04 verdict #1); each
    component is byte-identical to its standalone round-4 pair."""
    deg = q_vertex_degrees(spark, sf_dir).select(
        F.lit("vertex_degree").alias("kind"),
        F.col("vertex_id").alias("id"),
        F.col("degree").alias("n"),
    )
    sz = q_edge_sizes(spark, sf_dir).select(
        F.lit("edge_size").alias("kind"),
        F.col("edge_id").alias("id"),
        F.col("edge_size").alias("n"),
    )
    return deg.unionByName(sz)


GS_SEEDS = (1, 7, 13, 42, 99)
GS_SEED = 17
GS_FANOUTS = [(2, 2), (2, 2)]
GS_WALK_LEN = 3


def q_graph_sampling(spark, sf_dir):
    """GNN data-prep surface under the driver gate (r04 verdict #1) as
    ONE tagged-union row: GraphSAGE fanout sampling, induced subgraph,
    and DeepWalk-style random walks (operators/sampling_graph.py) over
    the sf hypergraph.  Every choice is md5 hash-ranked with an id
    tie-break, so the DuckDB twin regenerates the IDENTICAL sample —
    the same oracle discipline as the generators row.  Columns are a
    tagged (op, a, b, c, d) union:
      neighborhood: (seed_id, hop, edge_id, vertex_id)
      induced:      (edge_id, vertex_id, -1, -1)
      walk:         (seed_id, step, vertex_id, -1)
    """
    from hypergraph_gpu_label_propagation_spark.operators.sampling_graph import (
        induced_subgraph,
        random_walks,
        sample_neighborhood,
    )

    hg = _freeze(spark, sf_dir)
    seeds = spark.createDataFrame([(s,) for s in GS_SEEDS], "seed_id long")
    neg1 = F.lit(-1).cast("long")
    nb = sample_neighborhood(hg, seeds, fanouts=GS_FANOUTS, seed=GS_SEED).select(
        F.lit("neighborhood").alias("op"),
        F.col("seed_id").alias("a"),
        F.col("hop").cast("long").alias("b"),
        F.col("edge_id").alias("c"),
        F.col("vertex_id").alias("d"),
    )
    sub = induced_subgraph(
        hg, hg.vertices().filter(F.col("vertex_id") % 5 == 0)
    ).select(
        F.lit("induced").alias("op"),
        F.col("edge_id").alias("a"),
        F.col("vertex_id").alias("b"),
        neg1.alias("c"),
        neg1.alias("d"),
    )
    wk = random_walks(hg, seeds, walk_length=GS_WALK_LEN, seed=GS_SEED).select(
        F.lit("walk").alias("op"),
        F.col("seed_id").alias("a"),
        F.col("step").cast("long").alias("b"),
        F.col("vertex_id").alias("c"),
        neg1.alias("d"),
    )
    out = nb.unionByName(sub).unionByName(wk).localCheckpoint(eager=True)
    hg.unpersist()
    return out


def q_incremental_cc(spark, sf_dir):
    """Incremental connected components under the driver gate: the sf
    incidence arrives in TWO stream deliveries (edge_id%3==0 first, the
    rest after), each re-converging warm-started from the previous
    minima via streaming/lp_stream.run_incremental_cc.  Because the
    min-propagation fixed point is UNIQUE, the warm-started final state
    must EQUAL a cold CC of the full graph — which is exactly what the
    DuckDB oracle computes (same recursive-CTE twin as the
    connected_components row).  Isolated universe vertices report
    themselves, matching the batch query's shape."""
    import os
    import tempfile

    from hypergraph_gpu_label_propagation_spark.streaming.lp_stream import (
        run_incremental_cc,
    )

    import shutil

    inc = _incidence(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="icc_gate_")
    try:
        stream_dir = os.path.join(tmp, "stream")
        os.makedirs(stream_dir)
        state = os.path.join(tmp, "state")
        inc.filter(F.pmod("edge_id", F.lit(3)) == 0).coalesce(1).write.parquet(
            os.path.join(stream_dir, "b0")
        )
        run_incremental_cc(spark, stream_dir + "/*", state)
        inc.filter(F.pmod("edge_id", F.lit(3)) != 0).coalesce(1).write.parquet(
            os.path.join(stream_dir, "b1")
        )
        res = run_incremental_cc(spark, stream_dir + "/*", state)
        uni = _universe(spark, _nv(spark, sf_dir))
        out = uni.join(res.labels, "vertex_id", "left").select(
            "vertex_id",
            F.coalesce("component", F.col("vertex_id")).cast("long").alias("component"),
        )
        # materialize BEFORE the finally removes the parquet state the
        # lazy plan still reads (same discipline as q_graph_sampling)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "incidence_build": q_incidence,
        "source_files_hypergraph": q_source_files_hypergraph,
        "generators": q_generators,
        "degree_surface": q_degree_surface,
        "graph_profile": q_graph_profile,
        "graph_sampling": q_graph_sampling,
        "incremental_cc": q_incremental_cc,
        "lp_edge_majority": q_lp_edge_majority,
        "lp_superstep": q_lp_superstep,
        "lp_superstep_weighted": q_lp_superstep_weighted,
        "lp_converged": q_lp_converged,
        "lp_converged_bucketed": q_lp_converged_bucketed,
        "lp_modularity": q_lp_modularity,
        "connected_components": q_connected_components,
        "pagerank_2iter": q_pagerank_2iter,
        "pagerank_converged": q_pagerank_converged,
        "ppr": q_ppr,
        "kcore": q_kcore,
        "coreness": q_coreness,
        "ktruss": q_ktruss,
        "lp_edges": q_lp_edges,
        "edges_pagerank": q_edges_pagerank,
        "edges_cc": q_edges_cc,
        "edges_triangles": q_edges_triangles,
        "edges_hits": q_edges_hits,
        "triangle_count": q_triangle_count,
        "triangles_per_vertex": q_triangles_per_vertex,
        "near_dup": q_near_dup,
        "dedup_exact": q_dedup_exact,
        "text_profile": q_text_profile,
        "doc_repetition": q_doc_repetition,
        "decontaminate": q_decontaminate,
        "stratified_sample": q_stratified_sample,
        "doc_split": q_doc_split,
        "ngram_jaccard": q_ngram_jaccard,
        # minhash_signatures rides inside minhash_lsh's oracle (the lsh
        # twin re-derives the full signature CTE), freeing a board slot
        # under the 50-row gate; the operator keeps its own pytest.
        "minhash_lsh": q_minhash_lsh,
        "simhash": q_simhash,
        "ann_topk": q_ann_topk,
        "ivf_topk": q_ivf_topk,
        "embedding_near_dup": q_embedding_near_dup,
        "multimodal_decode": q_multimodal_decode,
        "events_window": q_events_window,
        "events_stream": q_events_stream,
        "events_sessions": q_events_sessions,
        "events_user_stats": q_events_user_stats,
        "agg_relational": q_agg_relational,
        "text_prep_chunks": q_text_prep_chunks,
        "quantiles": q_quantiles,
        "approx_stats": q_approx_stats,
        "set_ops_nations": q_set_ops_nations,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect-compatible ANSI SQL)
# ---------------------------------------------------------------------------


def _sql_lit(s: str) -> str:
    """A DuckDB E'...' escape-string literal for a replacement string
    that may contain newlines/backslashes."""
    return "E'" + s.replace("\\", "\\\\").replace("'", "''").replace("\n", "\\n") + "'"


def _sql_text_clean(col: str) -> str:
    """DuckDB twin of normalize_ws + scrub_pii: BOTH pattern lists are
    imported (NORMALIZE_PATTERNS + PII_PATTERNS — functions/text.py is
    the single source of truth; an edit there flows into this oracle
    automatically) and chained through regexp_replace(..., 'g').  RE2
    and Java regex agree on every construct these patterns use (char
    classes, \\b, non-capturing groups, bounded repeats)."""
    from hypergraph_gpu_label_propagation_spark.functions.text import (
        NORMALIZE_PATTERNS,
        PII_PATTERNS,
    )

    e = col
    for pat, repl in NORMALIZE_PATTERNS:
        e = f"regexp_replace({e}, '{pat}', {_sql_lit(repl)}, 'g')"
    e = f"TRIM({e})"
    for pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        e = f"regexp_replace({e}, '{p}', {_sql_lit(repl)}, 'g')"
    return e


_TP_STRIDE = _TP_SIZE - _TP_OVERLAP
_TP_AUG = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) "
    "|| '@mail.example.com or 10.0.' || CAST(doc_id % 250 AS VARCHAR) "
    "|| '.7 ssn 123-45-6789 ' || chr(9) || ' call 415-555-0199 ' "
    "|| repeat(chr(10), 4) || ' tail'"
)


def _mk_sql_text_prep() -> str:
    """Build the text_prep_chunks oracle (idempotent — a plain function
    of the imported pattern lists; no str.format over text that itself
    contains regex brace quantifiers).  Window starts mirror
    chunk_documents exactly: last start = ceil(max(0, n-size)/stride)
    strides, so no tail window fully contained in its predecessor."""
    clean = _sql_text_clean(_TP_AUG)
    sz, st = _TP_SIZE, _TP_STRIDE
    return f"""
WITH docs AS (SELECT doc_id, {clean} AS t FROM documents),
stripped AS (SELECT doc_id, regexp_replace(t, '^\\s+|\\s+$', '', 'g') AS t FROM docs),
tok AS (SELECT doc_id, CASE WHEN t = '' THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(t, '\\s+') END AS toks FROM stripped),
ex AS (SELECT doc_id, toks,
              UNNEST(CASE WHEN len(toks) = 0 THEN []::BIGINT[]
                          ELSE generate_series(0, ((GREATEST(0, CAST(len(toks) AS BIGINT) - {sz}) + {st - 1}) // {st}) * {st}, {st}) END) AS s
       FROM tok)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(s // {st} AS INT) AS chunk_idx,
       CAST(LEAST({sz}, len(toks) - s) AS INT) AS n_tokens,
       array_to_string(toks[s + 1 : s + {sz}], ' ') AS chunk
FROM ex
"""


_SQL_TEXT_PREP = _mk_sql_text_prep()


def _sql_lp_superstep_body() -> str:
    vj = "vj AS (SELECT i.vertex_id, e.label FROM inc i JOIN emaj e USING (edge_id))"
    vmaj = _sql_majority("vj", "vertex_id", "vmaj")
    return (
        f"WITH {_SQL_INC}, {_SQL_UNI}, {_SQL_LAB0}, {_SQL_EDGE_MAJ}, {vj}, {vmaj} "
        "SELECT u.vertex_id, CAST(COALESCE(v.label, 0) AS INT) AS label, "
        "CAST(COALESCE(v.label, 0) != l.label AS INT) AS changed "
        "FROM uni u LEFT JOIN vmaj v USING (vertex_id) JOIN lab0 l USING (vertex_id)"
    )


def _sql_pagerank_2iter() -> str:
    d = DAMPING
    def one_iter(rin: str, rout: str) -> str:
        return (
            f"c_{rout} AS (SELECT r.vertex_id, r.rank * g.inv_degree AS contrib "
            f"  FROM {rin} r JOIN invdeg g USING (vertex_id)), "
            f"em_{rout} AS (SELECT i.edge_id, SUM(c.contrib) / COUNT(*) AS mass "
            f"  FROM inc i JOIN c_{rout} c USING (vertex_id) GROUP BY i.edge_id), "
            f"gath_{rout} AS (SELECT i.vertex_id, SUM(e.mass) AS g "
            f"  FROM inc i JOIN em_{rout} e USING (edge_id) GROUP BY i.vertex_id), "
            f"dang_{rout} AS (SELECT COALESCE(SUM(r.rank), 0) AS dm FROM {rin} r "
            f"  LEFT JOIN invdeg g USING (vertex_id) WHERE g.inv_degree IS NULL), "
            f"{rout} AS (SELECT u.vertex_id, "
            f"  (1 - {d}) / n.n + {d} * ((SELECT dm FROM dang_{rout}) / n.n) "
            f"  + {d} * COALESCE(g.g, 0) AS rank "
            f"  FROM uni u CROSS JOIN nn n LEFT JOIN gath_{rout} g USING (vertex_id))"
        )
    return (
        f"WITH {_SQL_INC}, {_SQL_UNI}, "
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM uni), "
        "invdeg AS (SELECT vertex_id, 1.0 / COUNT(*) AS inv_degree FROM inc GROUP BY vertex_id), "
        "r0 AS (SELECT u.vertex_id, 1.0 / n.n AS rank FROM uni u CROSS JOIN nn n), "
        + one_iter("r0", "r1") + ", "
        + one_iter("r1", "r2") + " "
        "SELECT vertex_id, ROUND(rank, 6) AS rank FROM r2"
    )


def _sql_lp_converged(
    max_supersteps: int = 12,
    inc_sql: str | None = None,
    uni_sql: str | None = None,
) -> str:
    """LP-to-convergence twin: unroll ``max_supersteps`` supersteps of the
    majority CTE chain.  Labels reach a fixed point once changes = 0 (the
    tol=1e-6 stopping rule at these vertex counts), so any unroll depth
    >= the convergence iteration count (4-6 at sf0.001/sf0.01, fixed-point
    verified K=10 vs K=12 identical) yields exactly the converged labels.
    MATERIALIZED pins DuckDB to evaluate each shared CTE once — without it
    the chain re-derives `inc` per reference (30 s -> 0.8 s at sf0.01)."""
    inc_sql = (inc_sql or _SQL_INC).replace("inc AS (", "inc AS MATERIALIZED (")
    uni_sql = (uni_sql or _SQL_UNI).replace("uni AS (", "uni AS MATERIALIZED (")
    ctes = [inc_sql, uni_sql, _SQL_LAB0]
    prev = "lab0"
    for k in range(1, max_supersteps + 1):
        ctes.append(
            f"ej{k} AS (SELECT i.edge_id, l.label FROM inc i JOIN {prev} l USING (vertex_id))"
        )
        ctes.append(_sql_majority(f"ej{k}", "edge_id", f"emaj{k}"))
        ctes.append(
            f"vj{k} AS (SELECT i.vertex_id, e.label FROM inc i JOIN emaj{k} e USING (edge_id))"
        )
        ctes.append(_sql_majority(f"vj{k}", "vertex_id", f"vmaj{k}"))
        ctes.append(
            f"lab{k} AS MATERIALIZED (SELECT u.vertex_id, "
            f"CAST(COALESCE(v.label, 0) AS INT) AS label "
            f"FROM uni u LEFT JOIN vmaj{k} v USING (vertex_id))"
        )
        prev = f"lab{k}"
    return "WITH " + ", ".join(ctes) + f" SELECT vertex_id, label FROM {prev}"


def _sql_pagerank_converged(tol: float = 1e-7, max_iterations: int = 100) -> str:
    """PageRank-to-convergence twin: a recursive CTE that replicates the
    Spark driver loop's exact stopping rule (stop once the L1 delta of the
    just-accepted state drops under tol, operators/pagerank.py:118-143).

    Each working-table row carries (k, vertex_id, rank, prev) so the
    recursive term can compute the step-k L1 delta from its own rows and
    emit step k+1 only while delta >= tol.  Both engines therefore run the
    IDENTICAL iteration count on identical data; remaining cross-engine
    drift is summation-order noise (~1e-14), four orders under the closest
    round-6 boundary (2.1e-11 at sf0.01), so ROUND(rank, 6) hash-matches.
    """
    d = DAMPING
    return f"""
WITH RECURSIVE
{_SQL_INC.replace("inc AS (", "inc AS MATERIALIZED (")},
{_SQL_UNI.replace("uni AS (", "uni AS MATERIALIZED (")},
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM uni),
invdeg AS MATERIALIZED (SELECT vertex_id, 1.0 / COUNT(*) AS inv_degree
  FROM inc GROUP BY vertex_id),
it(k, vertex_id, rank, prev) AS (
  SELECT 0, u.vertex_id, 1.0 / n.n, CAST(0.0 AS DOUBLE)
  FROM uni u CROSS JOIN nn n
  UNION ALL
  SELECT s.k + 1, c.vertex_id,
         (1 - {d}) / n.n + {d} * (s.dm / n.n) + {d} * COALESCE(g.g, 0) AS rank,
         c.rank AS prev
  FROM it c
  CROSS JOIN nn n
  CROSS JOIN (SELECT MAX(k) AS k, SUM(ABS(rank - prev)) AS dl,
                COALESCE(SUM(CASE WHEN vertex_id NOT IN
                  (SELECT vertex_id FROM invdeg) THEN rank END), 0) AS dm
              FROM it) s
  LEFT JOIN (SELECT i.vertex_id, SUM(e.mass) AS g
             FROM inc i JOIN (SELECT i2.edge_id,
                                SUM(c2.rank * g2.inv_degree) / COUNT(*) AS mass
                              FROM inc i2 JOIN it c2 USING (vertex_id)
                              JOIN invdeg g2 ON g2.vertex_id = c2.vertex_id
                              GROUP BY i2.edge_id) e USING (edge_id)
             GROUP BY i.vertex_id) g USING (vertex_id)
  WHERE s.dl >= {tol} AND s.k < {max_iterations}
)
SELECT vertex_id, ROUND(rank, 6) AS rank
FROM it WHERE k = (SELECT MAX(k) FROM it)
"""


def _sql_ppr(tol: float = 1e-7, max_iterations: int = 100) -> str:
    """PPR twin: same recursive-CTE pattern as pagerank_converged with
    the restart vector s (1/|seeds| on seeds) replacing the uniform
    teleport; rank' = ((1-d) + d*dm) * s + d * gathered."""
    d = DAMPING
    seeds = ", ".join(str(x) for x in PPR_SEEDS)
    w = 1.0 / len(PPR_SEEDS)
    return f"""
WITH RECURSIVE
{_SQL_INC.replace("inc AS (", "inc AS MATERIALIZED (")},
{_SQL_UNI.replace("uni AS (", "uni AS MATERIALIZED (")},
invdeg AS MATERIALIZED (SELECT vertex_id, 1.0 / COUNT(*) AS inv_degree
  FROM inc GROUP BY vertex_id),
sv AS MATERIALIZED (SELECT vertex_id,
  CASE WHEN vertex_id IN ({seeds}) THEN {w!r} ELSE 0.0 END::DOUBLE AS s FROM uni),
it(k, vertex_id, rank, prev) AS (
  SELECT 0, vertex_id, s, CAST(0.0 AS DOUBLE) FROM sv
  UNION ALL
  SELECT st.k + 1, c.vertex_id,
         ((1 - {d}) + {d} * st.dm) * sv.s + {d} * COALESCE(g.g, 0) AS rank,
         c.rank AS prev
  FROM it c
  JOIN sv ON sv.vertex_id = c.vertex_id
  CROSS JOIN (SELECT MAX(k) AS k, SUM(ABS(rank - prev)) AS dl,
                COALESCE(SUM(CASE WHEN vertex_id NOT IN
                  (SELECT vertex_id FROM invdeg) THEN rank END), 0) AS dm
              FROM it) st
  LEFT JOIN (SELECT i.vertex_id, SUM(e.mass) AS g
             FROM inc i JOIN (SELECT i2.edge_id,
                                SUM(c2.rank * g2.inv_degree) / COUNT(*) AS mass
                              FROM inc i2 JOIN it c2 USING (vertex_id)
                              JOIN invdeg g2 ON g2.vertex_id = c2.vertex_id
                              GROUP BY i2.edge_id) e USING (edge_id)
             GROUP BY i.vertex_id) g ON g.vertex_id = c.vertex_id
  WHERE st.dl >= {tol} AND st.k < {max_iterations}
)
SELECT vertex_id, ROUND(rank, 6) AS rank
FROM it WHERE k = (SELECT MAX(k) FROM it)
"""


def _sql_source_files_hypergraph(
    n_repos: int = 10,
    files_per_repo: int = 12,
    commits_per_repo: int = 3,
    monorepo_factor: int = 10,
) -> str:
    """DuckDB twin of synth_source_files + derive_hypergraph_frames
    (sources/source_files.py): regenerate the deterministic table with
    the same expressions (commit = sha256, lang cycle, monorepo skew),
    then reproduce the dense ids as ROW_NUMBER() global key ranks."""
    mono_files = files_per_repo * monorepo_factor
    rpm = mono_files * commits_per_repo
    rpr = files_per_repo * commits_per_repo
    cpr = commits_per_repo
    total = rpm + (n_repos - 1) * rpr
    return f"""
WITH base AS (
  SELECT i,
    CASE WHEN i < {rpm} THEN 0 ELSE (i - {rpm}) // {rpr} + 1 END AS r,
    CASE WHEN i < {rpm} THEN i // {cpr} ELSE ((i - {rpm}) % {rpr}) // {cpr} END AS p,
    CASE WHEN i < {rpm} THEN i % {cpr} ELSE (i - {rpm}) % {cpr} END AS c
  FROM (SELECT UNNEST(generate_series(0, {total - 1})) AS i)
),
src AS (
  SELECT
    'org' || CAST(r // 7 AS VARCHAR) || '/repo' || CAST(r AS VARCHAR) AS repo,
    'src/dir' || CAST(p % 13 AS VARCHAR) || '/file' || CAST(p AS VARCHAR) || '.' ||
      (['py','cpp','java','rs','go'])[CAST(p % 5 AS INT) + 1] AS path,
    sha256('org' || CAST(r // 7 AS VARCHAR) || '/repo' || CAST(r AS VARCHAR)
           || ':' || CAST(c AS VARCHAR)) AS commit
  FROM base
),
vmap AS (SELECT repo, path, ROW_NUMBER() OVER (ORDER BY repo, path) - 1 AS vertex_id
         FROM (SELECT DISTINCT repo, path FROM src)),
remap AS (SELECT repo, ROW_NUMBER() OVER (ORDER BY repo) - 1 AS repo_eid
          FROM (SELECT DISTINCT repo FROM src)),
cmap AS (SELECT repo, commit, ROW_NUMBER() OVER (ORDER BY repo, commit) - 1 AS commit_eid
         FROM (SELECT DISTINCT repo, commit FROM src)),
nr AS (SELECT COUNT(*) AS n FROM remap),
inc_repo AS (SELECT DISTINCT e.repo_eid AS edge_id, v.vertex_id
             FROM src s JOIN vmap v USING (repo, path) JOIN remap e USING (repo)),
inc_commit AS (SELECT DISTINCT c.commit_eid + (SELECT n FROM nr) AS edge_id, v.vertex_id
               FROM src s JOIN vmap v USING (repo, path) JOIN cmap c USING (repo, commit))
SELECT CAST(edge_id AS BIGINT) AS edge_id, CAST(vertex_id AS BIGINT) AS vertex_id
FROM (SELECT * FROM inc_repo UNION ALL SELECT * FROM inc_commit)
"""


def _sql_gen_uniform(
    num_vertices: int,
    num_edges: int,
    min_edge_size: int,
    max_edge_size: int,
    seed: int,
) -> str:
    """DuckDB twin of the hash-ranked uniform sampler
    (sources/generators.py::uniform_hypergraph): identical k draw,
    candidate window, and rank hash, so the regenerated incidence is
    byte-identical to Spark's."""
    from hypergraph_gpu_label_propagation_spark.sources.generators import (
        candidate_window,
    )

    span = max_edge_size - min_edge_size + 1
    window = candidate_window(max_edge_size)
    if num_vertices <= window:
        n_slots, cand = num_vertices, "s.s"
    else:
        n_slots = window
        cand = (
            f"('0x' || substr(md5('{seed}:c:' || CAST(e.edge_id AS VARCHAR) "
            f"|| ':' || CAST(s.s AS VARCHAR)), 1, 15))::BIGINT % {num_vertices}"
        )
    return f"""
WITH e AS (SELECT UNNEST(generate_series(0, {num_edges - 1})) AS edge_id),
k AS (SELECT edge_id, {min_edge_size} +
    ('0x' || substr(md5('{seed}:k:' || CAST(edge_id AS VARCHAR)), 1, 15))::BIGINT
    % {span} AS k FROM e),
cand AS (SELECT DISTINCT e.edge_id, {cand} AS vertex_id
  FROM e, (SELECT UNNEST(generate_series(0, {n_slots - 1})) AS s) s),
ranked AS (SELECT c.edge_id, c.vertex_id, k.k,
    ROW_NUMBER() OVER (PARTITION BY c.edge_id ORDER BY
      ('0x' || substr(md5('{seed}:r:' || CAST(c.edge_id AS VARCHAR)
        || ':' || CAST(c.vertex_id AS VARCHAR)), 1, 15))::BIGINT ASC,
      c.vertex_id ASC) AS rn
  FROM cand c JOIN k USING (edge_id))
SELECT CAST(edge_id AS BIGINT) AS edge_id, CAST(vertex_id AS BIGINT) AS vertex_id
FROM ranked WHERE rn <= k
"""


def _dh60(expr: str) -> str:
    """DuckDB h60 twin of operators/dedup.py::h60."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def _sql_gen_planted(
    num_vertices: int,
    num_edges: int,
    communities: int,
    p_intra: float,
    min_edge_size: int,
    max_edge_size: int,
    seed: int,
) -> str:
    """DuckDB twin of the hash-ranked planted-partition generator
    (sources/generators.py::planted_partition_hypergraph): identical
    k / intra / community draws, candidate pools, and rank hashes."""
    from hypergraph_gpu_label_propagation_spark.sources.generators import (
        candidate_window,
    )

    if communities < 2:
        # mirror planted_partition_hypergraph's guard: the outside-top-up
        # pool indexes `oi // (C-1)`, which this generator would emit as a
        # literal division by zero for C=1
        raise ValueError("planted partition needs communities >= 2")
    V, C, E = num_vertices, communities, num_edges
    span = max_edge_size - min_edge_size + 1
    W = candidate_window(max_edge_size)
    p6 = int(round(p_intra * 1_000_000))
    ev = "CAST(edge_id AS VARCHAR)"
    sv = "CAST(slot AS VARCHAR)"
    if V <= W:
        uni_vid, uni_cap = "slot", V
    else:
        uni_expr = f"'{seed}:c:' || {ev} || ':' || {sv}"
        uni_vid = f"{_dh60(uni_expr)} % {V}"
        uni_cap = W
    return f"""
WITH e AS (SELECT UNNEST(generate_series(0, {E - 1})) AS edge_id),
base AS (SELECT edge_id,
  {min_edge_size} + {_dh60(f"'{seed}:k:' || {ev}")} % {span} AS k,
  {_dh60(f"'{seed}:i:' || {ev}")} % 1000000 < {p6} AS intra,
  ({_dh60(f"'{seed}:g:' || {ev}")} % {V}) % {C} AS c
  FROM e),
b2 AS (SELECT *, ({V} - c + {C} - 1) // {C} AS size_c FROM base),
ex AS (SELECT * FROM b2, (SELECT UNNEST(generate_series(0, {W - 1})) AS slot) s),
uni AS (SELECT edge_id, 0 AS pool, k AS take, {uni_vid} AS vertex_id
  FROM ex WHERE NOT intra AND slot < {uni_cap}),
ins AS (SELECT edge_id, 1 AS pool, LEAST(k, size_c) AS take,
  (CASE WHEN size_c <= {W} THEN slot
        ELSE {_dh60(f"'{seed}:a:' || {ev} || ':' || {sv}")} % size_c END) * {C} + c
  AS vertex_id
  FROM ex WHERE intra AND slot < LEAST({W}, size_c)),
tb AS (SELECT edge_id, k, c, size_c,
  CASE WHEN {V} - size_c <= {W} THEN slot
       ELSE {_dh60(f"'{seed}:b:' || {ev} || ':' || {sv}")} % ({V} - size_c) END AS oi
  FROM ex WHERE intra AND size_c < k AND slot < LEAST({W}, {V} - size_c)),
tp AS (SELECT edge_id, 2 AS pool, k - size_c AS take,
  (oi // {C - 1}) * {C}
  + CASE WHEN oi % {C - 1} < c THEN oi % {C - 1} ELSE oi % {C - 1} + 1 END AS vertex_id
  FROM tb),
cand AS (SELECT DISTINCT edge_id, pool, take, vertex_id FROM
  (SELECT * FROM uni UNION ALL SELECT * FROM ins UNION ALL SELECT * FROM tp)),
rk AS (SELECT edge_id, vertex_id, take,
  ROW_NUMBER() OVER (PARTITION BY edge_id, pool ORDER BY
    {_dh60(f"'{seed}:r:' || {ev} || ':' || CAST(vertex_id AS VARCHAR)")} ASC,
    vertex_id ASC) AS rn
  FROM cand)
SELECT CAST(edge_id AS BIGINT) AS edge_id, CAST(vertex_id AS BIGINT) AS vertex_id
FROM rk WHERE rn <= take
"""


def _sql_gen_hsbm(
    num_vertices: int,
    num_edges: int,
    communities: int,
    p_intra: float,
    p_inter: float,
    min_edge_size: int,
    max_edge_size: int,
    seed: int,
) -> str:
    """DuckDB twin of the hash-ranked hSBM generator: uniform candidate
    members (hash stream ``seed:h``), set-wise monochromaticity, md5
    acceptance coin, dense renumber of the first ``num_edges`` accepted.
    Pins the FIRST candidate pool (``max(4*num_edges, 1000)``) — the
    contract parameters are chosen so it suffices, which is a
    deterministic property of the hashes, so the twin never diverges
    from the Spark driver's pool-doubling loop."""
    from hypergraph_gpu_label_propagation_spark.sources.generators import (
        candidate_window,
    )

    V, C, E = num_vertices, communities, num_edges
    span = max_edge_size - min_edge_size + 1
    W = candidate_window(max_edge_size)
    ncand = max(4 * E, 1000)
    p6i = int(round(p_intra * 1_000_000))
    p6o = int(round(p_inter * 1_000_000))
    pre = f"{seed}:h"
    cv = "CAST(cand_id AS VARCHAR)"
    sv = "CAST(s.s AS VARCHAR)"
    if V <= W:
        n_slots, cand_expr = V, "s.s"
    else:
        n_slots = W
        ce = f"'{pre}:c:' || {cv} || ':' || {sv}"
        cand_expr = f"{_dh60(ce)} % {V}"
    ke = f"'{pre}:k:' || {cv}"
    re_ = (
        f"'{pre}:r:' || CAST(c.cand_id AS VARCHAR) || ':' "
        "|| CAST(c.vertex_id AS VARCHAR)"
    )
    xe = f"'{seed}:x:' || {cv}"
    return f"""
WITH e AS (SELECT UNNEST(generate_series(0, {ncand - 1})) AS cand_id),
k AS (SELECT cand_id, {min_edge_size} + {_dh60(ke)} % {span} AS k FROM e),
cand AS (SELECT DISTINCT e.cand_id, {cand_expr} AS vertex_id
  FROM e, (SELECT UNNEST(generate_series(0, {n_slots - 1})) AS s) s),
ranked AS (SELECT c.cand_id, c.vertex_id, k.k,
    ROW_NUMBER() OVER (PARTITION BY c.cand_id ORDER BY
      {_dh60(re_)} ASC,
      c.vertex_id ASC) AS rn
  FROM cand c JOIN k USING (cand_id)),
inc AS (SELECT cand_id, vertex_id FROM ranked WHERE rn <= k),
mono AS (SELECT cand_id, COUNT(DISTINCT vertex_id % {C}) = 1 AS m
  FROM inc GROUP BY cand_id),
keep AS (SELECT cand_id FROM mono
  WHERE {_dh60(xe)} % 1000000 < CASE WHEN m THEN {p6i} ELSE {p6o} END),
renum AS (SELECT cand_id, ROW_NUMBER() OVER (ORDER BY cand_id) - 1 AS edge_id
  FROM keep)
SELECT CAST(r.edge_id AS BIGINT) AS edge_id, CAST(i.vertex_id AS BIGINT) AS vertex_id
FROM inc i JOIN renum r USING (cand_id) WHERE r.edge_id < {E}
"""


_SQL_ED = (
    "ed AS MATERIALIZED (SELECT DISTINCT CAST(l_partkey AS BIGINT) AS src, "
    f"CAST(l_suppkey AS BIGINT) + {SUPP_OFFSET} AS dst FROM lineitem)"
)
# NOTE: inside WITH RECURSIVE, DuckDB treats a plain `a UNION b` CTE
# body as a (degenerate) recursive union and does NOT global-dedup it —
# spell the dedup explicitly as DISTINCT over UNION ALL
_SQL_EUNI = (
    "euni AS MATERIALIZED (SELECT DISTINCT vertex_id FROM "
    "(SELECT src AS vertex_id FROM ed UNION ALL SELECT dst FROM ed))"
)


def _sql_edges_pagerank(tol: float = 1e-7, max_iterations: int = 100) -> str:
    """Directed-edge-table twin of pagerank_converged's recursive CTE:
    out-degree-normalized contributions along src->dst, dangling mass
    from vertices with no out-edges, identical L1 stopping rule."""
    d = DAMPING
    return f"""
WITH RECURSIVE
{_SQL_ED},
{_SQL_EUNI},
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM euni),
invout AS MATERIALIZED (SELECT src, 1.0 / COUNT(*) AS io FROM ed GROUP BY src),
it(k, vertex_id, rank, prev) AS (
  SELECT 0, u.vertex_id, 1.0 / n.n, CAST(0.0 AS DOUBLE)
  FROM euni u CROSS JOIN nn n
  UNION ALL
  SELECT s.k + 1, c.vertex_id,
         (1 - {d}) / n.n + {d} * (s.dm / n.n) + {d} * COALESCE(g.g, 0) AS rank,
         c.rank AS prev
  FROM it c
  CROSS JOIN nn n
  CROSS JOIN (SELECT MAX(k) AS k, SUM(ABS(rank - prev)) AS dl,
                COALESCE(SUM(CASE WHEN vertex_id NOT IN
                  (SELECT src FROM invout) THEN rank END), 0) AS dm
              FROM it) s
  LEFT JOIN (SELECT e.dst AS vertex_id, SUM(c2.rank * io.io) AS g
             FROM ed e JOIN it c2 ON c2.vertex_id = e.src
             JOIN invout io ON io.src = e.src
             GROUP BY e.dst) g USING (vertex_id)
  WHERE s.dl >= {tol} AND s.k < {max_iterations}
)
SELECT vertex_id, ROUND(rank, 6) AS rank
FROM it WHERE k = (SELECT MAX(k) FROM it)
"""


def _sql_ktruss(k: int) -> str:
    """k-truss twin: recursive CTE carrying the alive EDGE set; each
    step keeps edges with >= k-2 triangles among the alive set (support
    via the symmetrized working table, spelled UNION ALL — see the
    DuckDB WITH RECURSIVE union-dedup gotcha), with the kcore twin's
    shrink guard + final outside filter."""
    def survivors(src: str) -> str:
        sym = f"(SELECT u, v FROM {src} UNION ALL SELECT v, u FROM {src})"
        return (
            f"SELECT e.u, e.v FROM {src} e "
            f"JOIN {sym} s1 ON s1.u = e.u "
            f"JOIN {sym} s2 ON s2.u = e.v AND s2.v = s1.v "
            f"GROUP BY e.u, e.v HAVING COUNT(*) >= {k - 2}"
        )

    return f"""WITH RECURSIVE
{_SQL_INC.replace("inc AS (", "inc AS MATERIALIZED (")},
adj AS MATERIALIZED (SELECT DISTINCT a.vertex_id AS u, b.vertex_id AS v
  FROM inc a JOIN inc b USING (edge_id) WHERE a.vertex_id < b.vertex_id),
it(r, u, v) AS (
  SELECT 0, u, v FROM adj
  UNION ALL
  SELECT s.r + 1, d.u, d.v
  FROM ({survivors("it")}) d
  CROSS JOIN (SELECT MAX(r) AS r, COUNT(*) AS n FROM it) s
  WHERE (SELECT COUNT(*) FROM ({survivors("it")})) < s.n
),
last AS (SELECT u, v FROM it WHERE r = (SELECT MAX(r) FROM it)),
fin AS ({survivors("last")})
SELECT adj.u, adj.v,
  CAST(CASE WHEN f.u IS NOT NULL THEN 1 ELSE 0 END AS INT) AS in_truss
FROM adj LEFT JOIN fin f ON f.u = adj.u AND f.v = adj.v"""


def _sql_edges_hits(iterations: int = 20) -> str:
    """HITS twin: the normalized-auth derived table is inlined at each
    of its three uses (per-vertex value, hub numerator, hub
    normalizer) — same raw-sum-then-divide arithmetic as the Spark
    loop, so round-6 values match after the fixed iteration count."""
    ar = (
        "SELECT e1.dst AS vertex_id, SUM(c1.hub) AS ar "
        "FROM ed e1 JOIN it c1 ON c1.vertex_id = e1.src GROUP BY e1.dst"
    )
    an = (
        f"SELECT x.vertex_id, x.ar / (SELECT SUM(y.ar) FROM ({ar}) y) AS a "
        f"FROM ({ar}) x"
    )
    hr = (
        f"SELECT e3.src AS vertex_id, SUM(an2.a) AS hr "
        f"FROM ed e3 JOIN ({an}) an2 ON an2.vertex_id = e3.dst GROUP BY e3.src"
    )
    hn = (
        f"SELECT z.vertex_id, z.hr / (SELECT SUM(w.hr) FROM ({hr}) w) AS h "
        f"FROM ({hr}) z"
    )
    return f"""
WITH RECURSIVE
{_SQL_ED},
{_SQL_EUNI},
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM euni),
it(k, vertex_id, hub, auth) AS (
  SELECT 0, u.vertex_id, 1.0 / n.n, 1.0 / n.n FROM euni u CROSS JOIN nn n
  UNION ALL
  SELECT s.k + 1, u.vertex_id,
         COALESCE(hn.h, 0) AS hub,
         COALESCE(an.a, 0) AS auth
  FROM euni u
  CROSS JOIN (SELECT MAX(k) AS k FROM it) s
  LEFT JOIN ({an}) an ON an.vertex_id = u.vertex_id
  LEFT JOIN ({hn}) hn ON hn.vertex_id = u.vertex_id
  WHERE s.k < {iterations}
)
SELECT vertex_id, ROUND(hub, 6) AS hub, ROUND(auth, 6) AS auth
FROM it WHERE k = {iterations}
"""


def _sql_minhash_sig_cte() -> str:
    """doc -> (doc_id, mh0..mh7) as CTEs: toks/shingles/hash/sig."""
    coeffs = minhash_coeffs(8)
    mins = ", ".join(
        f"MIN(({a} * h + {b}) % {MERSENNE31}) AS mh{i}" for i, (a, b) in enumerate(coeffs)
    )
    return (
        "sh AS (SELECT doc_id, UNNEST(list_distinct(list_transform("
        "  range(1, len(string_split(text, ' ')) - 1), "
        "  i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] "
        "       || ' ' || string_split(text, ' ')[i+2]))) AS shingle FROM documents), "
        "hsh AS (SELECT doc_id, "
        f"  ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {MERSENNE31} AS h FROM sh), "
        f"sig AS (SELECT doc_id, {mins} FROM hsh GROUP BY doc_id)"
    )


def _sql_simhash() -> str:
    sums = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(SIMHASH_BITS)
    )
    acc = " + ".join(
        f"CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(SIMHASH_BITS)
    )
    return (
        "WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM documents), "
        "hsh AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok), "
        f"bits AS (SELECT doc_id, {sums} FROM hsh GROUP BY doc_id) "
        f"SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST({acc} AS BIGINT) AS simhash FROM bits"
    )


def _dh60(expr: str) -> str:
    """DuckDB twin of operators.dedup.h60 (60-bit md5 prefix)."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def _sql_graph_sampling() -> str:
    """DuckDB twin of q_graph_sampling: unrolls the fanout hops and walk
    steps as CTE chains; every hash-ranked choice is replicated with the
    same md5 string and the same (hash, id) tie-break, so the sample is
    regenerated exactly (the generators-row discipline applied to the
    GNN data-prep trio)."""
    seeds_values = ", ".join(f"({s})" for s in GS_SEEDS)
    ctes = [
        _SQL_INC,
        f"seeds(s) AS (VALUES {seeds_values})",
        "f0 AS (SELECT CAST(s AS BIGINT) AS seed_id, CAST(s AS BIGINT) AS vertex_id FROM seeds)",
    ]
    hop_selects = []
    prev = "f0"
    for hop, (f_e, f_v) in enumerate(GS_FANOUTS, start=1):
        pre = f"{GS_SEED}:{hop}"
        he = _dh60(
            f"'{pre}:e:' || f.seed_id || ':' || f.vertex_id || ':' || i.edge_id"
        )
        hv = _dh60(f"'{pre}:v:' || p.seed_id || ':' || p.edge_id || ':' || i.vertex_id")
        ctes.append(
            f"ce{hop} AS (SELECT f.seed_id, f.vertex_id, i.edge_id, {he} AS h "
            f"FROM {prev} f JOIN inc i USING (vertex_id))"
        )
        ctes.append(
            f"pe{hop} AS (SELECT DISTINCT seed_id, edge_id FROM ("
            f"SELECT seed_id, edge_id, ROW_NUMBER() OVER (PARTITION BY seed_id, vertex_id "
            f"ORDER BY h, edge_id) AS rn FROM ce{hop}) WHERE rn <= {f_e})"
        )
        ctes.append(
            f"cv{hop} AS (SELECT p.seed_id, p.edge_id, i.vertex_id, {hv} AS h "
            f"FROM pe{hop} p JOIN inc i USING (edge_id))"
        )
        ctes.append(
            f"pv{hop} AS (SELECT seed_id, edge_id, vertex_id FROM ("
            f"SELECT seed_id, edge_id, vertex_id, ROW_NUMBER() OVER (PARTITION BY seed_id, edge_id "
            f"ORDER BY h, vertex_id) AS rn FROM cv{hop}) WHERE rn <= {f_v})"
        )
        ctes.append(
            f"f{hop} AS (SELECT DISTINCT seed_id, vertex_id FROM pv{hop})"
        )
        prev = f"f{hop}"
        hop_selects.append(
            f"SELECT 'neighborhood' AS op, seed_id AS a, CAST({hop} AS BIGINT) AS b, "
            f"edge_id AS c, vertex_id AS d FROM pv{hop}"
        )
    # induced subgraph: vertices % 5 == 0, surviving edges need >= 2 members
    ctes.append("ki AS (SELECT edge_id, vertex_id FROM inc WHERE vertex_id % 5 = 0)")
    ctes.append(
        "oke AS (SELECT edge_id FROM ki GROUP BY edge_id HAVING COUNT(*) >= 2)"
    )
    ind_select = (
        "SELECT 'induced', edge_id, vertex_id, CAST(-1 AS BIGINT), CAST(-1 AS BIGINT) "
        "FROM ki JOIN oke USING (edge_id)"
    )
    # random walks: one edge then one member per step, rn=1 choices
    walk_selects = [
        "SELECT 'walk', seed_id, CAST(0 AS BIGINT), seed_id, CAST(-1 AS BIGINT) FROM f0"
    ]
    prev = "f0"
    for step in range(1, GS_WALK_LEN + 1):
        pre = f"{GS_SEED}:w{step}"
        he = _dh60(f"'{pre}:e:' || c.seed_id || ':' || i.edge_id")
        hv = _dh60(f"'{pre}:v:' || p.seed_id || ':' || i.vertex_id")
        ctes.append(
            f"we{step} AS (SELECT c.seed_id, i.edge_id, {he} AS h "
            f"FROM {prev} c JOIN inc i USING (vertex_id))"
        )
        ctes.append(
            f"wpe{step} AS (SELECT seed_id, edge_id FROM ("
            f"SELECT seed_id, edge_id, ROW_NUMBER() OVER (PARTITION BY seed_id "
            f"ORDER BY h, edge_id) AS rn FROM we{step}) WHERE rn = 1)"
        )
        ctes.append(
            f"wv{step} AS (SELECT p.seed_id, i.vertex_id, {hv} AS h "
            f"FROM wpe{step} p JOIN inc i USING (edge_id))"
        )
        ctes.append(
            f"wc{step} AS (SELECT seed_id, vertex_id FROM ("
            f"SELECT seed_id, vertex_id, ROW_NUMBER() OVER (PARTITION BY seed_id "
            f"ORDER BY h, vertex_id) AS rn FROM wv{step}) WHERE rn = 1)"
        )
        prev = f"wc{step}"
        walk_selects.append(
            f"SELECT 'walk', seed_id, CAST({step} AS BIGINT), vertex_id, "
            f"CAST(-1 AS BIGINT) FROM wc{step}"
        )
    return (
        "WITH " + ", ".join(ctes) + " "
        + " UNION ALL ".join(hop_selects + [ind_select] + walk_selects)
    )


_SQL_COSINE_TOPK = (
    "WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv "
    "  FROM embeddings WHERE vec_id < 8), "
    "pairs AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
    "  ROUND(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]), 6) AS cos_sim "
    "  FROM q, embeddings e WHERE e.vec_id != q.query_id), "
    "rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
    "  ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM pairs) "
    "SELECT CAST(query_id AS BIGINT) AS query_id, "
    "CAST(neighbor_id AS BIGINT) AS neighbor_id, cos_sim, "
    "CAST(rank AS BIGINT) AS rank FROM rk WHERE rank <= 5"
)

# single-band sign-LSH buckets (planes 0..7), hamming-1 multiprobe
# (bucket XOR each bit), exact re-rank on candidates
_SQL_SIGNLSH_TOPK = (
    "WITH planes AS MATERIALIZED ("
    "  SELECT p.p, d.d, "
    "    CASE WHEN ('0x' || substr(md5('p' || p.p || ':d' || d.d), 1, 15))::BIGINT "
    "      % 2 = 0 THEN 1.0 ELSE -1.0 END AS s "
    "  FROM (SELECT UNNEST(generate_series(0, 7)) AS p) p, "
    "       (SELECT UNNEST(generate_series(0, 63)) AS d) d), "
    "vex AS MATERIALIZED (SELECT vec_id, UNNEST(embedding::DOUBLE[]) AS x, "
    "  UNNEST(generate_series(0, len(embedding) - 1)) AS d FROM embeddings), "
    "buckets AS MATERIALIZED (SELECT vec_id, "
    "  SUM(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS bucket FROM ("
    "    SELECT v.vec_id, p.p, SUM(v.x * p.s) AS dot "
    "    FROM vex v JOIN planes p USING (d) GROUP BY v.vec_id, p.p) "
    "  GROUP BY vec_id), "
    "qb AS (SELECT b.vec_id AS query_id, UNNEST([b.bucket, "
    "    xor(b.bucket, 1), xor(b.bucket, 2), xor(b.bucket, 4), xor(b.bucket, 8), "
    "    xor(b.bucket, 16), xor(b.bucket, 32), xor(b.bucket, 64), "
    "    xor(b.bucket, 128)]) AS bucket "
    "  FROM buckets b WHERE b.vec_id < 8), "
    "cand AS (SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id "
    "  FROM qb q JOIN buckets c USING (bucket) WHERE c.vec_id != q.query_id), "
    "scored AS (SELECT DISTINCT c.query_id, c.neighbor_id, "
    "  ROUND(list_cosine_similarity(a.embedding::DOUBLE[], "
    "    b.embedding::DOUBLE[]), 6) AS cos_sim "
    "  FROM cand c JOIN embeddings a ON a.vec_id = c.query_id "
    "  JOIN embeddings b ON b.vec_id = c.neighbor_id), "
    "rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
    "  ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM scored) "
    "SELECT CAST(query_id AS BIGINT) AS query_id, "
    "CAST(neighbor_id AS BIGINT) AS neighbor_id, cos_sim, "
    "CAST(rank AS BIGINT) AS rank FROM rk WHERE rank <= 5"
)

# q_ivf_topk twin: 4 hash-min centroids (same h60-of-vec_id rank,
# cell = rank index), ROUND(sq-L2, 6) argmin assignment (tie -> lower
# cell), nprobe=2 probe set per query by the same rounded metric,
# exact cosine re-rank on probed cells only.
_SQL_IVF_TOPK = (
    "WITH cen AS MATERIALIZED ("
    "  SELECT cell, UNNEST(v) AS c, UNNEST(generate_series(0, len(v) - 1)) AS d "
    "  FROM (SELECT embedding::DOUBLE[] AS v, ROW_NUMBER() OVER ("
    "    ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT ASC, "
    "    vec_id ASC) - 1 AS cell FROM embeddings) WHERE cell < 4), "
    "vex AS MATERIALIZED (SELECT vec_id, UNNEST(embedding::DOUBLE[]) AS x, "
    "  UNNEST(generate_series(0, len(embedding) - 1)) AS d FROM embeddings), "
    "dist AS (SELECT v.vec_id, c.cell, "
    "  ROUND(SUM((v.x - c.c) * (v.x - c.c)), 6) AS dr "
    "  FROM vex v JOIN cen c USING (d) GROUP BY v.vec_id, c.cell), "
    "rnk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id "
    "  ORDER BY dr ASC, cell ASC) AS rn FROM dist), "
    "assign AS (SELECT vec_id, cell FROM rnk WHERE rn = 1), "
    "probes AS (SELECT vec_id AS query_id, cell FROM rnk "
    "  WHERE rn <= 2 AND vec_id < 8), "
    "cand AS (SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id "
    "  FROM probes p JOIN assign a USING (cell) WHERE a.vec_id != p.query_id), "
    "scored AS (SELECT c.query_id, c.neighbor_id, "
    "  ROUND(list_cosine_similarity(qa.embedding::DOUBLE[], "
    "    nb.embedding::DOUBLE[]), 6) AS cos_sim "
    "  FROM cand c JOIN embeddings qa ON qa.vec_id = c.query_id "
    "  JOIN embeddings nb ON nb.vec_id = c.neighbor_id), "
    "rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
    "  ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM scored) "
    "SELECT CAST(query_id AS BIGINT) AS query_id, "
    "CAST(neighbor_id AS BIGINT) AS neighbor_id, cos_sim, "
    "CAST(rank AS BIGINT) AS rank FROM rk WHERE rank <= 5"
)


def oracle_sql() -> dict[str, str]:
    sw = ", ".join(f"'{s}'" for s in STOPWORDS)
    markers_values = ", ".join(f"('{l}', '{w}')" for l, w in lang_markers_rows())
    oracles = {
        "incidence_build": f"WITH {_SQL_INC} SELECT * FROM inc",
        "degree_surface": (
            f"WITH {_SQL_INC}, {_SQL_UNI}, "
            "deg AS (SELECT vertex_id, COUNT(*) AS d FROM inc GROUP BY vertex_id) "
            "SELECT 'vertex_degree' AS kind, u.vertex_id AS id, "
            "CAST(COALESCE(deg.d, 0) AS BIGINT) AS n "
            "FROM uni u LEFT JOIN deg USING (vertex_id) "
            "UNION ALL "
            "SELECT 'edge_size', edge_id, CAST(COUNT(*) AS BIGINT) "
            "FROM inc GROUP BY edge_id"
        ),
        "graph_sampling": _sql_graph_sampling(),
        "lp_edge_majority": (
            f"WITH {_SQL_INC}, {_SQL_UNI}, {_SQL_LAB0}, {_SQL_EDGE_MAJ} "
            "SELECT edge_id, label FROM emaj"
        ),
        "graph_profile": (
            f"WITH {_SQL_INC}, "
            "vd AS (SELECT COUNT(*) AS d FROM inc GROUP BY vertex_id), "
            "es AS (SELECT COUNT(*) AS d FROM inc GROUP BY edge_id) "
            # bit-length - 1 == floor(log2(d)) in exact integer
            # arithmetic on both engines (no FP epsilon flips)
            "SELECT 'vertex_degree' AS kind, CAST(LENGTH(BIN(d)) - 1 AS INT) AS bucket, "
            "CAST(COUNT(*) AS BIGINT) AS n, CAST(MIN(d) AS BIGINT) AS min_count, "
            "CAST(MAX(d) AS BIGINT) AS max_count FROM vd GROUP BY 2 "
            "UNION ALL "
            "SELECT 'edge_size', CAST(LENGTH(BIN(d)) - 1 AS INT), "
            "CAST(COUNT(*) AS BIGINT), CAST(MIN(d) AS BIGINT), "
            "CAST(MAX(d) AS BIGINT) FROM es GROUP BY 2"
        ),
        "lp_superstep": _sql_lp_superstep_body(),
        "lp_superstep_weighted": (
            # phase 1 unchanged (unit-weight edge majority); phase 2
            # weights each incident edge's vote by 1/edge_size, sums
            # quantized to 9 decimals before the argmax (cross-engine
            # FP-order immunity for mathematically-equal sums)
            f"WITH {_SQL_INC}, {_SQL_UNI}, {_SQL_LAB0}, {_SQL_EDGE_MAJ}, "
            "esz AS (SELECT edge_id, 1.0 / COUNT(*) AS w FROM inc GROUP BY edge_id), "
            "votes AS (SELECT i.vertex_id, e.label, s.w FROM inc i "
            "  JOIN emaj e USING (edge_id) JOIN esz s USING (edge_id) "
            f"  WHERE e.label >= 0 AND e.label < {MAX_LABELS}), "
            "wcnt AS (SELECT vertex_id, label, ROUND(SUM(w), 9) AS c "
            "  FROM votes GROUP BY vertex_id, label), "
            "vmaj AS (SELECT vertex_id, CAST(label AS INT) AS label FROM ("
            "  SELECT vertex_id, label, ROW_NUMBER() OVER (PARTITION BY vertex_id "
            "  ORDER BY c DESC, label ASC) AS rn FROM wcnt) WHERE rn = 1) "
            "SELECT u.vertex_id, CAST(COALESCE(v.label, 0) AS INT) AS label, "
            "CAST(COALESCE(v.label, 0) != l.label AS INT) AS changed "
            "FROM uni u LEFT JOIN vmaj v USING (vertex_id) JOIN lab0 l USING (vertex_id)"
        ),
        "lp_converged": _sql_lp_converged(),
        # the durable bucketed layout must be answer-preserving
        "lp_converged_bucketed": _sql_lp_converged(),
        "lp_modularity": (
            f"WITH lp AS ({_sql_lp_converged()}), "
            "inc2 AS (SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS edge_id, "
            "  CAST(l_partkey AS BIGINT) AS vertex_id FROM lineitem), "
            "adj AS (SELECT DISTINCT a.vertex_id AS u, b.vertex_id AS v "
            "  FROM inc2 a JOIN inc2 b USING (edge_id) "
            "  WHERE a.vertex_id < b.vertex_id), "
            "mm AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM adj), "
            "deg AS (SELECT x AS v, CAST(COUNT(*) AS DOUBLE) AS d FROM ("
            "  SELECT u AS x FROM adj UNION ALL SELECT v FROM adj) GROUP BY 1), "
            "intra AS (SELECT la.label, CAST(COUNT(*) AS DOUBLE) AS e "
            "  FROM adj JOIN lp la ON la.vertex_id = adj.u "
            "  JOIN lp lb ON lb.vertex_id = adj.v AND lb.label = la.label "
            "  GROUP BY 1), "
            "dc AS (SELECT lp.label, SUM(deg.d) AS dsum FROM lp "
            "  JOIN deg ON deg.v = lp.vertex_id GROUP BY 1) "
            "SELECT ROUND(SUM(COALESCE(i.e, 0) / mm.m "
            "  - POW(dc.dsum / (2 * mm.m), 2)), 6) AS modularity "
            "FROM dc LEFT JOIN intra i USING (label) CROSS JOIN mm"
        ),
        "pagerank_converged": _sql_pagerank_converged(),
        "ppr": _sql_ppr(),
        "connected_components": (
            f"WITH RECURSIVE {_SQL_INC}, {_SQL_UNI}, "
            "adj AS (SELECT DISTINCT a.vertex_id AS u, b.vertex_id AS v "
            "  FROM inc a JOIN inc b USING (edge_id)), "
            "reach(u, v) AS (SELECT u, v FROM adj "
            "  UNION SELECT r.u, a.v FROM reach r JOIN adj a ON r.v = a.u), "
            "comp AS (SELECT u AS vertex_id, MIN(v) AS c FROM reach GROUP BY u) "
            "SELECT x.vertex_id, CAST(COALESCE(comp.c, x.vertex_id) AS BIGINT) AS component "
            "FROM uni x LEFT JOIN comp USING (vertex_id)"
        ),
        "pagerank_2iter": _sql_pagerank_2iter(),
        "kcore": (
            # iterative peel as a recursive CTE: working table = alive
            # set; emit the survivors only while they still shrink; one
            # final outside peel resolves the stop-on-empty edge case
            f"""WITH RECURSIVE
{_SQL_INC.replace("inc AS (", "inc AS MATERIALIZED (")},
{_SQL_UNI.replace("uni AS (", "uni AS MATERIALIZED (")},
adj AS MATERIALIZED (SELECT DISTINCT a.vertex_id AS u, b.vertex_id AS v
  FROM inc a JOIN inc b USING (edge_id) WHERE a.vertex_id != b.vertex_id),
it(r, u) AS (
  SELECT 0, u FROM (SELECT DISTINCT u FROM adj)
  UNION ALL
  SELECT s.r + 1, d.u
  FROM (SELECT a.u FROM adj a JOIN it x ON x.u = a.u JOIN it y ON y.u = a.v
        GROUP BY a.u HAVING COUNT(*) >= 90) d
  CROSS JOIN (SELECT MAX(r) AS r, COUNT(*) AS n FROM it) s
  WHERE (SELECT COUNT(*) FROM (SELECT a.u FROM adj a JOIN it x ON x.u = a.u
         JOIN it y ON y.u = a.v GROUP BY a.u HAVING COUNT(*) >= 90)) < s.n
),
last AS (SELECT u FROM it WHERE r = (SELECT MAX(r) FROM it)),
finalcore AS (SELECT a.u FROM adj a JOIN last x ON x.u = a.u
  JOIN last y ON y.u = a.v GROUP BY a.u HAVING COUNT(*) >= 90)
SELECT u2.vertex_id,
  CAST(CASE WHEN f.u IS NOT NULL THEN 1 ELSE 0 END AS INT) AS in_core
FROM uni u2 LEFT JOIN finalcore f ON f.u = u2.vertex_id"""
        ),
        "coreness": (
            # iterated h-index fixed point as a recursive CTE: working
            # table carries (k, u, c, prev); each step ranks neighbor
            # values desc per vertex and takes h = max(least(c, rank));
            # the change-count guard stops at the same fixed point as
            # the Spark loop (coreness, Lü et al. 2016)
            f"""WITH RECURSIVE
{_SQL_INC.replace("inc AS (", "inc AS MATERIALIZED (")},
{_SQL_UNI.replace("uni AS (", "uni AS MATERIALIZED (")},
adj AS MATERIALIZED (SELECT DISTINCT a.vertex_id AS u, b.vertex_id AS v
  FROM inc a JOIN inc b USING (edge_id) WHERE a.vertex_id != b.vertex_id),
it(k, u, c, prev) AS (
  SELECT 0, u, CAST(COUNT(*) AS INT), -1 FROM adj GROUP BY u
  UNION ALL
  SELECT s.k + 1, h.u, h.h, cur.c
  FROM (SELECT nb.u, CAST(MAX(LEAST(nb.c, nb.rn)) AS INT) AS h FROM (
          SELECT a.u, st.c,
                 ROW_NUMBER() OVER (PARTITION BY a.u ORDER BY st.c DESC) AS rn
          FROM adj a JOIN it st ON st.u = a.v) nb GROUP BY nb.u) h
  JOIN it cur ON cur.u = h.u
  CROSS JOIN (SELECT MAX(k) AS k,
                SUM(CASE WHEN c != prev THEN 1 ELSE 0 END) AS ch FROM it) s
  WHERE s.ch > 0
),
fin AS (SELECT u, c FROM it WHERE k = (SELECT MAX(k) FROM it))
SELECT u2.vertex_id, CAST(COALESCE(f.c, 0) AS INT) AS coreness
FROM uni u2 LEFT JOIN fin f ON f.u = u2.vertex_id"""
        ),
        "lp_edges": _sql_lp_converged(
            inc_sql=(
                "pe AS MATERIALIZED (SELECT ROW_NUMBER() OVER () AS edge_id, u, v "
                "  FROM (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
                "        FROM lineitem a JOIN lineitem b "
                "        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)), "
                "inc AS (SELECT edge_id, CAST(u AS BIGINT) AS vertex_id FROM pe "
                "  UNION ALL SELECT edge_id, CAST(v AS BIGINT) FROM pe)"
            )
        ),
        "ktruss": _sql_ktruss(17),
        "edges_pagerank": _sql_edges_pagerank(),
        "edges_hits": _sql_edges_hits(12),
        "edges_cc": (
            f"WITH RECURSIVE {_SQL_ED}, {_SQL_EUNI}, "
            "adj AS (SELECT DISTINCT u, v FROM (SELECT src AS u, dst AS v FROM ed "
            "  UNION ALL SELECT dst, src FROM ed)), "
            "reach(u, v) AS (SELECT u, v FROM adj "
            "  UNION SELECT r.u, a.v FROM reach r JOIN adj a ON r.v = a.u), "
            "comp AS (SELECT u AS vertex_id, MIN(v) AS c FROM reach GROUP BY u) "
            "SELECT x.vertex_id, "
            "CAST(LEAST(x.vertex_id, COALESCE(comp.c, x.vertex_id)) AS BIGINT) "
            "AS component "
            "FROM euni x LEFT JOIN comp USING (vertex_id)"
        ),
        "edges_triangles": (
            "WITH li AS (SELECT DISTINCT l_orderkey AS o, "
            "  CAST(l_partkey AS BIGINT) AS p FROM lineitem), "
            "adj AS (SELECT DISTINCT a.p AS u, b.p AS v FROM li a "
            "  JOIN li b ON a.o = b.o AND a.p < b.p) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles "
            "FROM adj e1 JOIN adj e2 ON e1.v = e2.u "
            "JOIN adj e3 ON e3.u = e1.u AND e3.v = e2.v"
        ),
        "triangle_count": (
            f"WITH {_SQL_INC}, "
            "adj AS (SELECT DISTINCT a.vertex_id AS u, b.vertex_id AS v "
            "  FROM inc a JOIN inc b USING (edge_id) WHERE a.vertex_id < b.vertex_id) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles "
            "FROM adj e1 JOIN adj e2 ON e1.v = e2.u "
            "JOIN adj e3 ON e3.u = e1.u AND e3.v = e2.v"
        ),
        "triangles_per_vertex": (
            f"WITH {_SQL_INC}, {_SQL_UNI}, "
            "adj AS (SELECT DISTINCT a.vertex_id AS u, b.vertex_id AS v "
            "  FROM inc a JOIN inc b USING (edge_id) WHERE a.vertex_id < b.vertex_id), "
            "tri AS (SELECT e1.u AS tu, e1.v AS tv, e2.v AS tw "
            "  FROM adj e1 JOIN adj e2 ON e1.v = e2.u "
            "  JOIN adj e3 ON e3.u = e1.u AND e3.v = e2.v), "
            "per AS (SELECT x AS vertex_id, COUNT(*) AS c FROM ("
            "  SELECT tu AS x FROM tri UNION ALL SELECT tv FROM tri "
            "  UNION ALL SELECT tw FROM tri) GROUP BY 1) "
            "SELECT u2.vertex_id, CAST(COALESCE(per.c, 0) AS BIGINT) AS n_triangles "
            "FROM uni u2 LEFT JOIN per USING (vertex_id)"
        ),
        "near_dup": (
            # r07 tagged union: 'pair' = the r04-r06 near-dup row
            # verbatim (CTE np); 'cluster' = fuzzy-dedup components
            # over np (transitive-closure min per doc, the recursive-
            # CTE shape shared with edges_cc), keeper flag as DOUBLE.
            # adj is SELECT DISTINCT over UNION ALL, not UNION — inside
            # WITH RECURSIVE DuckDB does not globally dedup a plain
            # UNION in a non-recursive CTE (r03 gotcha).
            f"WITH RECURSIVE {_sql_minhash_sig_cte()}, "
            "bands AS ("
            + " UNION ALL ".join(
                f"SELECT doc_id, {j} AS band, md5(CAST(mh{2*j} AS VARCHAR) || ',' || "
                f"CAST(mh{2*j+1} AS VARCHAR)) AS bucket FROM sig"
                for j in range(4)
            )
            + "), "
            "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b "
            "  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket "
            "  WHERE a.doc_id < b.doc_id), "
            "sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id), "
            "com AS (SELECT c.id_a, c.id_b, COUNT(*) AS nc FROM cand c "
            "  JOIN sh a ON a.doc_id = c.id_a JOIN sh b ON b.doc_id = c.id_b "
            "  AND a.shingle = b.shingle GROUP BY 1, 2), "
            "np AS (SELECT CAST(com.id_a AS BIGINT) AS id_a, "
            "  CAST(com.id_b AS BIGINT) AS id_b, "
            "  ROUND(nc / (sa.n + sb.n - nc), 6) AS jaccard "
            "  FROM com JOIN sz sa ON com.id_a = sa.doc_id "
            "  JOIN sz sb ON com.id_b = sb.doc_id "
            "  WHERE ROUND(nc / (sa.n + sb.n - nc), 6) >= 0.05), "
            "adj AS (SELECT DISTINCT u, v FROM (SELECT id_a AS u, id_b AS v "
            "  FROM np UNION ALL SELECT id_b, id_a FROM np)), "
            "reach(u, v) AS (SELECT u, v FROM adj "
            "  UNION SELECT r.u, a.v FROM reach r JOIN adj a ON r.v = a.u), "
            "comp AS (SELECT u, MIN(v) AS c FROM reach GROUP BY u) "
            "SELECT 'pair' AS tag, id_a AS k1, id_b AS k2, jaccard AS val "
            "FROM np "
            "UNION ALL "
            "SELECT 'cluster' AS tag, CAST(d.doc_id AS BIGINT) AS k1, "
            "CAST(LEAST(d.doc_id, COALESCE(comp.c, d.doc_id)) AS BIGINT) AS k2, "
            "CAST(CASE WHEN d.doc_id = LEAST(d.doc_id, "
            "COALESCE(comp.c, d.doc_id)) THEN 1 ELSE 0 END AS DOUBLE) AS val "
            "FROM documents d LEFT JOIN comp ON d.doc_id = comp.u"
        ),
        "dedup_exact": (
            "SELECT md5(text) AS content_hash, CAST(MIN(doc_id) AS BIGINT) AS keep_id, "
            "CAST(COUNT(*) AS BIGINT) AS n_dups FROM documents GROUP BY 1"
        ),
        "text_profile": (
            # ONE scan computing the full per-doc text surface, LEFT JOIN
            # with the language-ID winner (same marker-vote semantics)
            f"WITH markers(lang_cand, word) AS (VALUES {markers_values}), "
            "t AS (SELECT doc_id, text, string_split(text, ' ') AS toks, "
            r"  regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]') AS rt "
            "FROM documents), "
            "tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents), "
            "hits AS (SELECT tk.doc_id, m.lang_cand, COUNT(*) AS h FROM tok tk "
            "  JOIN markers m USING (word) GROUP BY 1, 2), "
            "mx AS (SELECT doc_id, MAX(h) AS h FROM hits GROUP BY doc_id), "
            "win AS (SELECT hits.doc_id, MIN(hits.lang_cand) AS lang_guess "
            "  FROM hits JOIN mx ON hits.doc_id = mx.doc_id AND hits.h = mx.h "
            "  GROUP BY hits.doc_id) "
            "SELECT CAST(t.doc_id AS BIGINT) AS doc_id, "
            "CAST(length(text) AS BIGINT) AS n_chars, "
            "CAST(len(toks) AS BIGINT) AS n_tokens, "
            "CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct, "
            "ROUND(len(list_distinct(toks)) / len(toks), 6) AS distinct_ratio, "
            f"ROUND(len(list_filter(toks, x -> x IN ({sw}))) / len(toks), 6) AS stopword_ratio, "
            "CAST(len(rt) AS BIGINT) AS n_regex_tokens, "
            "CAST(COALESCE(list_sum(list_transform(rt, "
            "  x -> CAST(ceil(len(x) / 4.0) AS BIGINT))), 0) AS BIGINT) AS bpe_estimate, "
            "md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp, "
            "COALESCE(w.lang_guess, 'und') AS lang_guess "
            "FROM t LEFT JOIN win w ON t.doc_id = w.doc_id"
        ),
        "doc_repetition": (
            # r07 tagged union: 'rep' = the verbatim Gopher row; 'lm' =
            # the unigram LM score — same add-k model, explicit DOUBLE
            # casts (DuckDB decimal-literal arithmetic would otherwise
            # run at fixed scale), ROUND 6 absorbs cross-engine FP
            # sum-order in the AVG (the cos_sim policy)
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            "g AS (SELECT doc_id, CASE WHEN len(toks) >= 3 THEN "
            "  list_transform(range(1, len(toks) - 1), "
            "    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) "
            "  ELSE []::VARCHAR[] END AS ngs FROM t), "
            "tk AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok "
            "  FROM documents), "
            "tk2 AS (SELECT * FROM tk WHERE tok <> ''), "
            "vocab AS (SELECT tok, COUNT(*) AS cnt FROM tk2 GROUP BY tok), "
            "tot AS (SELECT SUM(cnt) AS n, COUNT(*) AS v FROM vocab), "
            "lpv AS (SELECT tok, log2((CAST(cnt AS DOUBLE) + 0.5) / "
            "  (CAST(n AS DOUBLE) + 0.5 * CAST(v AS DOUBLE))) AS lp "
            "  FROM vocab, tot), "
            "sc AS (SELECT tk2.doc_id, COUNT(*) AS nt, ROUND(AVG(lp), 6) AS lp "
            "  FROM tk2 JOIN lpv USING (tok) GROUP BY tk2.doc_id) "
            "SELECT 'rep' AS tag, CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(len(ngs) AS BIGINT) AS c1, "
            "CAST(len(list_distinct(ngs)) AS BIGINT) AS c2, "
            "CASE WHEN len(ngs) > 0 THEN "
            "  ROUND(CAST(1.0 AS DOUBLE) - len(list_distinct(ngs)) / len(ngs), 6) "
            "ELSE 0.0 END AS val FROM g "
            "UNION ALL "
            "SELECT 'lm' AS tag, CAST(d.doc_id AS BIGINT) AS doc_id, "
            "CAST(COALESCE(sc.nt, 0) AS BIGINT) AS c1, "
            "CAST(0 AS BIGINT) AS c2, sc.lp AS val "
            "FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id"
        ),
        "decontaminate": (
            "WITH sh AS (SELECT doc_id, UNNEST(list_distinct(list_transform("
            "  range(1, len(string_split(text, ' ')) - 1), "
            "  i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] "
            "       || ' ' || string_split(text, ' ')[i+2]))) AS shingle FROM documents), "
            "bsh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0), "
            "hits AS (SELECT doc_id, COUNT(*) AS nh FROM sh JOIN bsh USING (shingle) "
            "  GROUP BY doc_id) "
            "SELECT CAST(d.doc_id AS BIGINT) AS doc_id, "
            "CAST(COALESCE(h.nh, 0) AS BIGINT) AS n_hit_shingles, "
            "CAST(COALESCE(h.nh, 0) > 0 AS INT) AS contaminated "
            "FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id"
        ),
        "stratified_sample": (
            "WITH h AS (SELECT doc_id, lang, "
            "  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':11'), 1, 15))::BIGINT "
            "    % 1000000 AS b FROM documents) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, lang FROM h "
            "WHERE b < CASE lang WHEN 'de' THEN 1000000 WHEN 'en' THEN 500000 "
            "  WHEN 'es' THEN 250000 WHEN 'fr' THEN 100000 WHEN 'zh' THEN 750000 "
            "  ELSE 0 END"
        ),
        "doc_split": (
            # same md5 60-bit bucket hash (seed 42 for the split, 7 for
            # sampling); integer thresholds: test < 100000, train < 900000
            # (names sorted: test, train, val), sample keeps bucket7 < 500000
            "WITH h AS (SELECT doc_id, "
            "  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 15))::BIGINT "
            "    % 1000000 AS b42, "
            "  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 15))::BIGINT "
            "    % 1000000 AS b7 "
            "  FROM documents) "
            "SELECT 'split' AS tag, CAST(doc_id AS BIGINT) AS doc_id, "
            "CASE WHEN b42 < 100000 THEN 'test' "
            "     WHEN b42 < 900000 THEN 'train' ELSE 'val' END AS grp, "
            "CAST(0 AS BIGINT) AS rnk "
            "FROM h WHERE b7 < 500000 "
            # r07 'shard' leg: shard = bucket % 8; rank = row_number by
            # the independent ':r:'-salted md5 (ties by id) — the
            # export_shards seeded-shuffle order, replicated exactly
            "UNION ALL "
            "SELECT 'shard' AS tag, CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(b42 % 8 AS VARCHAR) AS grp, "
            "ROW_NUMBER() OVER (PARTITION BY b42 % 8 "
            "  ORDER BY md5(CAST(doc_id AS VARCHAR) || ':r:42'), doc_id) AS rnk "
            "FROM h"
        ),
        "ngram_jaccard": (
            "WITH sh AS (SELECT doc_id, UNNEST(list_distinct(list_transform("
            "  range(1, len(string_split(text, ' ')) - 1), "
            "  i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] "
            "       || ' ' || string_split(text, ' ')[i+2]))) AS shingle FROM documents), "
            "sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id), "
            "com AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c "
            "  FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b, "
            "ROUND(c / (sa.n + sb.n - c), 6) AS jaccard "
            "FROM com JOIN sz sa ON com.id_a = sa.doc_id JOIN sz sb ON com.id_b = sb.doc_id "
            "WHERE ROUND(c / (sa.n + sb.n - c), 6) >= 0.1"
        ),
        "minhash_lsh": (
            f"WITH {_sql_minhash_sig_cte()}, "
            "bands AS ("
            + " UNION ALL ".join(
                f"SELECT doc_id, {j} AS band, md5(CAST(mh{2*j} AS VARCHAR) || ',' || "
                f"CAST(mh{2*j+1} AS VARCHAR)) AS bucket FROM sig"
                for j in range(4)
            )
            + ") "
            "SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS id_a, "
            "CAST(b.doc_id AS BIGINT) AS id_b "
            "FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket "
            "WHERE a.doc_id < b.doc_id"
        ),
        "simhash": _sql_simhash(),
        "ann_topk": (
            "SELECT 'exact' AS method, * FROM (" + _SQL_COSINE_TOPK + ") "
            "UNION ALL "
            "SELECT 'signlsh' AS method, * FROM (" + _SQL_SIGNLSH_TOPK + ")"
        ),
        "ivf_topk": _SQL_IVF_TOPK,
        "embedding_near_dup": (
            # same banded sign-LSH: planes from md5('p{p}:d{d}') parity
            # (plane_sign_value twin), band = p // 8, bit = p % 8
            "WITH planes AS MATERIALIZED ("
            "  SELECT p.p, d.d, "
            "    CASE WHEN ('0x' || substr(md5('p' || p.p || ':d' || d.d), 1, 15))::BIGINT "
            "      % 2 = 0 THEN 1.0 ELSE -1.0 END AS s "
            "  FROM (SELECT UNNEST(generate_series(0, 31)) AS p) p, "
            "       (SELECT UNNEST(generate_series(0, 63)) AS d) d), "
            "vex AS MATERIALIZED ("
            "  SELECT vec_id, UNNEST(embedding::DOUBLE[]) AS x, "
            "         UNNEST(generate_series(0, len(embedding) - 1)) AS d "
            "  FROM embeddings), "
            "dots AS (SELECT v.vec_id, p.p, SUM(v.x * p.s) AS dot "
            "  FROM vex v JOIN planes p USING (d) GROUP BY v.vec_id, p.p), "
            "buckets AS (SELECT vec_id, p // 8 AS band, "
            "  SUM(CASE WHEN dot > 0 THEN 1 << (p % 8) ELSE 0 END) AS bucket "
            "  FROM dots GROUP BY 1, 2), "
            "cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b "
            "  FROM buckets a JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket "
            "  WHERE a.vec_id < b.vec_id) "
            "SELECT CAST(c.id_a AS BIGINT) AS id_a, CAST(c.id_b AS BIGINT) AS id_b, "
            "ROUND(list_cosine_similarity(ea.embedding::DOUBLE[], "
            "  eb.embedding::DOUBLE[]), 6) AS cos_sim "
            "FROM cand c JOIN embeddings ea ON ea.vec_id = c.id_a "
            "JOIN embeddings eb ON eb.vec_id = c.id_b "
            "WHERE ROUND(list_cosine_similarity(ea.embedding::DOUBLE[], "
            "  eb.embedding::DOUBLE[]), 6) >= 0.25"
        ),
        "multimodal_decode": (
            # synth_assets twin: payload = sha256 digest repeated 1+i%4;
            # FAKE decode derives metadata from sha256(hex(payload)) —
            # hex(A repeated n) = hex(A) repeated n, so no blob hashing
            # is needed (DuckDB sha256 is VARCHAR-only)
            "WITH a AS (SELECT i AS asset_id, "
            "  (['image','audio','video'])[CAST(i % 3 AS INT) + 1] AS kind, "
            "  repeat(sha256('asset:42:' || CAST(i AS VARCHAR)), "
            "         1 + CAST(i % 4 AS INT)) AS hexdata "
            "  FROM (SELECT UNNEST(generate_series(0, 63)) AS i)), "
            "h AS (SELECT asset_id, kind, sha256(hexdata) AS hx FROM a), "
            "b AS (SELECT asset_id, kind, "
            "  ('0x' || substr(hx, 1, 2))::INT AS h0, "
            "  ('0x' || substr(hx, 3, 2))::INT AS h1, "
            "  ('0x' || substr(hx, 5, 2))::INT AS h2, "
            "  ('0x' || substr(hx, 7, 2))::INT AS h3 FROM h) "
            "SELECT CAST(asset_id AS BIGINT) AS asset_id, kind, "
            "CAST(64 + h0 % 192 AS INT) AS width, "
            "CAST(64 + h1 % 192 AS INT) AS height, "
            "CAST(CASE WHEN kind = 'image' THEN 1 ELSE 1 + h2 % 300 END AS INT) AS n_frames, "
            "CAST(CASE WHEN kind = 'image' THEN 0 "
            "  ELSE 8000 + (h3 % 5) * 8000 END AS INT) AS sample_rate, "
            "CASE WHEN kind = 'image' THEN 0.0::DOUBLE "
            "  ELSE ROUND((1 + h2 % 300) * 33.37::DOUBLE, 2) END AS duration_ms "
            "FROM b"
        ),
        "events_window": (
            "SELECT strftime(time_bucket(INTERVAL 5 MINUTE, ts), '%Y-%m-%d %H:%M:%S') "
            "AS window_start, "
            "event_type, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "ROUND(SUM(value), 6) AS sum_value FROM events GROUP BY 1, 2"
        ),
        "events_sessions": (
            # gap-based islands: new session when the gap to the previous
            # event (per user) exceeds 4h; session_end = last event + gap
            "WITH x AS (SELECT user_id, ts, value, "
            "  CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL "
            "       OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) "
            "          > INTERVAL 4 HOUR THEN 1 ELSE 0 END AS brk FROM events), "
            "s AS (SELECT user_id, ts, value, SUM(brk) OVER (PARTITION BY user_id "
            "  ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM x) "
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "strftime(date_trunc('second', MIN(ts)), '%Y-%m-%d %H:%M:%S') AS session_start, "
            "strftime(date_trunc('second', MAX(ts) + INTERVAL 4 HOUR), "
            "  '%Y-%m-%d %H:%M:%S') AS session_end, "
            "CAST(COUNT(*) AS BIGINT) AS n_events, "
            "ROUND(SUM(value), 6) AS sum_value "
            "FROM s GROUP BY user_id, sid"
        ),
        "events_user_stats": (
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "CAST(COUNT(*) AS BIGINT) AS n_events, "
            "ROUND(SUM(value), 6) AS sum_value, "
            "ROUND(MAX(value), 6) AS max_value "
            "FROM events GROUP BY user_id"
        ),
        "agg_relational": (
            "SELECT 'pushdown' AS src, l_returnflag AS returnflag, "
            "l_linestatus AS linestatus, ROUND(SUM(l_quantity), 4) AS sum_qty, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue, "
            "CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem "
            "WHERE l_shipdate < TIMESTAMP '1998-09-03' "
            "GROUP BY l_returnflag, l_linestatus "
            "UNION ALL "
            "SELECT 'rollup', COALESCE(l_returnflag, '<all>'), "
            "COALESCE(l_linestatus, '<all>'), ROUND(SUM(l_quantity), 4), "
            "CAST(NULL AS DOUBLE), CAST(COUNT(*) AS BIGINT) "
            "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"
        ),
        "text_prep_chunks": _SQL_TEXT_PREP,
        "quantiles": (
            "SELECT l_returnflag, "
            "ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50, "
            "ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90 "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "approx_stats": (
            # exact columns recomputed; *_ok flags are the tolerance
            # contract (sketches are engine-specific — see q_approx_stats)
            "SELECT l_returnflag, "
            "ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50, "
            "CAST(1 AS INT) AS p50_ok, "
            "ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90, "
            "CAST(1 AS INT) AS p90_ok, "
            "CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_distinct, "
            "CAST(1 AS INT) AS distinct_ok "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "set_ops_nations": (
            "SELECT CAST(nationkey AS INT) AS nationkey FROM ("
            "SELECT c_nationkey AS nationkey FROM customer "
            "UNION SELECT s_nationkey FROM supplier)"
        ),
    }
    # generators: the hash-ranked sampler is md5 arithmetic end-to-end,
    # so DuckDB regenerates the identical incidence (exact twins).  One
    # unioned row for all four surfaces — see q_generators for why.
    oracles["generators"] = " UNION ALL ".join(
        f"SELECT '{tag}' AS gen, CAST(edge_id AS BIGINT) AS edge_id, "
        f"CAST(vertex_id AS BIGINT) AS vertex_id FROM ({sql})"
        for tag, sql in [
            ("uniform", _sql_gen_uniform(500, 1000, 2, 5, 42)),
            ("fixed", _sql_gen_uniform(300, 500, 4, 4, 7)),
            ("planted", _sql_gen_planted(500, 800, 8, 0.85, 2, 5, 11)),
            ("hsbm", _sql_gen_hsbm(400, 300, 8, 0.9, 0.5, 2, 4, 13)),
        ]
    )
    # the streaming query in complete output mode emits every window, so
    # its result equals the batch twin's — same oracle verifies both
    oracles["events_stream"] = oracles["events_window"]
    # flagship derivation: fully regenerated + re-derived inside DuckDB
    oracles["source_files_hypergraph"] = _sql_source_files_hypergraph()
    # warm-started incremental CC must equal the cold run bit-for-bit
    # (min-propagation fixed point is unique), so its oracle IS the cold
    # connected-components twin on the full incidence
    oracles["incremental_cc"] = oracles["connected_components"]
    return oracles
