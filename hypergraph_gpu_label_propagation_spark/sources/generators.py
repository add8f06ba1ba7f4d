"""Random hypergraph generators (reference src/common/hypergraph.cpp:91-285).

The reference draws from a single mt19937 stream, which is inherently
sequential; we replicate the *distributional* semantics with
partition-parallel, seed-deterministic generation (SURVEY.md section
2.3).  Results are identical at any partition count — the Spark analog
of the reference's seeded reproducibility (README.md:55-60).

G1/G2 (uniform/fixed) use a **hash-ranked sampler** built entirely from
column expressions (zero Python in the path): per edge,
``k = min + h60(seed:k:e) % span`` and the members are the first ``k``
distinct candidates ranked by an independent hash
``h60(seed:r:e:v)``.  Candidates are either ALL vertices (when
``num_vertices`` fits the candidate window — exact uniform k-subset) or
``4*max_edge_size + 32`` hash-drawn slots ``h60(seed:c:e:s) % V``
(i.i.d. uniform draws; conditioned on the distinct set, the
independent rank-hash again picks a uniform k-subset).  The shortfall
probability (fewer than ``k`` distinct among the window draws when
``V > window``) is bounded by ``C(W,2)^(W-k+1) / V^(W-k+1)`` —
astronomically small for ``W >= 4k``.  Because every step is md5
arithmetic, the DuckDB oracle reproduces the generator EXACTLY
(``__spark_entry__._sql_gen_uniform``), and generation throughput is
JVM-bound rather than per-edge-Python-rng-bound.

Planted (G3) and hSBM (G4) reuse the same machinery: planted adds
intra-community candidate pools with an outside top-up; hSBM draws
candidate edges from the shared sampler, computes monochromaticity
set-wise, and accepts via an md5 coin.  EVERY generator is therefore
Python-free column expressions with an exact DuckDB twin.

Generators:
- uniform:  per edge k ~ U[min,max] (>=2), k distinct vertices uniform
  without replacement (hypergraph.cpp:129-145);
- fixed:    d-uniform Erdos-Renyi, all edges exactly edge_size
  (hypergraph.cpp:147-160);
- planted:  community(v) = v % C; with prob p_intra pick a size-weighted
  community and sample inside it, topping up from outside when the
  community is smaller than k; else uniform global sample
  (hypergraph.cpp:163-227);
- hsbm:     rejection sampling — uniform k-set accepted w.p. p_intra if
  monochromatic (all members same community) else p_inter
  (hypergraph.cpp:238-285); Spark form generates surplus candidates and
  keeps the first num_edges accepted in candidate order (stable, so
  deterministic);
- random_labels: label ~ U[0, classes) per vertex from a separate
  label_seed (hypergraph.cpp:229-236).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

INC_SCHEMA = "edge_id long, vertex_id long"


def candidate_window(max_edge_size: int) -> int:
    """Candidate-slot count for the hash-ranked sampler; shared with the
    DuckDB twin so both engines draw the identical candidate sets."""
    return 4 * max_edge_size + 32


def _hash_members(
    spark: SparkSession,
    num_items: int,
    num_vertices: int,
    min_edge_size: int,
    max_edge_size: int,
    prefix: str,
    id_name: str = "edge_id",
) -> DataFrame:
    """Shared hash-ranked sampler core (module docstring): for items
    0..num_items-1, draw k ~ U[min,max] and the first k distinct
    candidates by an independent rank hash.  ``prefix`` namespaces the
    hash stream (plain seed for G1/G2, ``seed:h`` for hSBM candidates).
    Pure column expressions; per-item window bounded by the candidate
    window, partitioned by item id — parallel at any scale."""
    from hypergraph_gpu_label_propagation_spark.operators.dedup import h60

    span = max_edge_size - min_edge_size + 1
    window = candidate_window(max_edge_size)
    eid = F.col(id_name).cast("string")
    k = (
        F.lit(min_edge_size)
        + F.pmod(h60(F.concat(F.lit(f"{prefix}:k:"), eid)), F.lit(span))
    ).cast("int")
    if num_vertices <= window:
        n_slots, cand = num_vertices, F.col("slot").cast("long")
    else:
        n_slots = window
        cand = F.pmod(
            h60(F.concat(F.lit(f"{prefix}:c:"), eid, F.lit(":"), F.col("slot").cast("string"))),
            F.lit(num_vertices),
        )
    cands = (
        spark.range(num_items)
        .select(F.col("id").alias(id_name), k.alias("k"))
        .select(
            id_name, "k",
            F.explode(F.sequence(F.lit(0), F.lit(n_slots - 1))).alias("slot"),
        )
        .select(id_name, "k", cand.alias("vertex_id"))
        .distinct()  # k is functionally dependent on the item id
    )
    rank_h = h60(
        F.concat(F.lit(f"{prefix}:r:"), eid, F.lit(":"), F.col("vertex_id").cast("string"))
    )
    w = Window.partitionBy(id_name).orderBy(rank_h.asc(), F.col("vertex_id").asc())
    return (
        cands.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("k"))
        .select(id_name, "vertex_id")
    )


def uniform_hypergraph(
    spark: SparkSession,
    num_vertices: int,
    num_edges: int,
    min_edge_size: int = 2,
    max_edge_size: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Hash-ranked uniform sampler — pure column expressions, exact
    SQL twin (see module docstring).  k ~ U[min,max] per edge, members
    distinct (k capped at num_vertices, hypergraph.cpp:129-145)."""
    if min_edge_size < 2 or max_edge_size < min_edge_size:
        raise ValueError("edge size bounds invalid (reference hypergraph.cpp:130-133)")
    return _hash_members(
        spark, num_edges, num_vertices, min_edge_size, max_edge_size, f"{seed}"
    )


def fixed_hypergraph(
    spark: SparkSession,
    num_vertices: int,
    num_edges: int,
    edge_size: int = 4,
    seed: int = 42,
) -> DataFrame:
    return uniform_hypergraph(spark, num_vertices, num_edges, edge_size, edge_size, seed)


def planted_partition_hypergraph(
    spark: SparkSession,
    num_vertices: int,
    num_edges: int,
    communities: int = 8,
    p_intra: float = 0.85,
    min_edge_size: int = 2,
    max_edge_size: int = 5,
    seed: int = 42,
) -> DataFrame:
    """community(v) = v % communities (hypergraph.cpp:178-179).  Members
    of community c are the arithmetic progression c, c+C, c+2C, ... so
    in-community sampling needs no materialized pool.

    Hash-ranked form (same machinery as :func:`uniform_hypergraph`,
    zero Python in the path, exact SQL twin):

    - intra with prob ``h60(seed:i:e) % 10^6 < p_intra * 10^6``;
    - size-weighted community pick ``c = (h60(seed:g:e) % V) % C``
      (community of a uniform vertex, hypergraph.cpp:196-199);
    - INSIDE pool: community-index candidates ``idx * C + c``; when the
      community fits the candidate window every member is a candidate
      (exact without-replacement sample), else ``window`` hash slots;
      take ``min(k, size_c)`` ranked by the independent member hash;
    - OUTSIDE top-up (hypergraph.cpp:206-217) when the community is
      smaller than k: candidate index x over the non-community
      vertices maps to ``block*C + (off if off < c else off+1)`` with
      ``block, off = divmod(x, C-1)``; take ``k - size_c`` more;
    - non-intra edges: plain uniform candidates (tag-separated hashes).
    The inside/outside pools are disjoint by construction (inside
    ``== c (mod C)``, outside ``!= c``), so per-pool top-k unions to a
    distinct member set.
    """
    if min_edge_size < 2 or max_edge_size < min_edge_size:
        raise ValueError("edge size bounds invalid (reference hypergraph.cpp:130-133)")
    if communities < 1 or communities > num_vertices:
        raise ValueError("communities must be in [1, num_vertices]")
    from hypergraph_gpu_label_propagation_spark.operators.dedup import h60

    C = communities
    V = num_vertices
    span = max_edge_size - min_edge_size + 1
    window = candidate_window(max_edge_size)
    eid = F.col("edge_id").cast("string")
    sid = F.col("slot").cast("string")

    k = (
        F.lit(min_edge_size)
        + F.pmod(h60(F.concat(F.lit(f"{seed}:k:"), eid)), F.lit(span))
    ).cast("int")
    intra = (
        F.pmod(h60(F.concat(F.lit(f"{seed}:i:"), eid)), F.lit(1_000_000))
        < F.lit(int(round(p_intra * 1_000_000)))
    )
    comm = F.pmod(F.pmod(h60(F.concat(F.lit(f"{seed}:g:"), eid)), F.lit(V)), F.lit(C))
    # size of community c: ceil((V - c) / C) — `div` (exact integer
    # division, no double round-trip) so ids stay exact at any scale
    size_c = F.expr(f"({V} - c + {C} - 1) div {C}").cast("long")

    edges = spark.range(num_edges).select(
        F.col("id").alias("edge_id"), k.alias("k"), intra.alias("intra"), comm.alias("c")
    ).select("edge_id", "k", "intra", "c", size_c.alias("size_c"))

    ex = edges.select(
        "edge_id", "k", "intra", "c", "size_c",
        F.explode(F.sequence(F.lit(0), F.lit(window - 1))).alias("slot"),
    )

    # pool 0 = global uniform (non-intra), 1 = inside community, 2 = top-up
    if V <= window:  # exact without-replacement: every vertex is a candidate
        uni_vid, uni_cap = F.col("slot").cast("long"), F.lit(V)
    else:
        uni_vid = F.pmod(
            h60(F.concat(F.lit(f"{seed}:c:"), eid, F.lit(":"), sid)), F.lit(V)
        )
        uni_cap = F.lit(window)
    in_idx = F.when(
        F.col("size_c") <= window, F.col("slot").cast("long")
    ).otherwise(
        F.pmod(h60(F.concat(F.lit(f"{seed}:a:"), eid, F.lit(":"), sid)), F.col("size_c"))
    )
    out_pop = F.lit(V) - F.col("size_c")
    out_idx = F.when(
        out_pop <= window, F.col("slot").cast("long")
    ).otherwise(
        F.pmod(h60(F.concat(F.lit(f"{seed}:b:"), eid, F.lit(":"), sid)), out_pop)
    )
    uni_cand = ex.filter(~F.col("intra") & (F.col("slot") < uni_cap)).select(
        "edge_id", F.lit(0).alias("pool"), F.col("k").cast("long").alias("take"),
        uni_vid.alias("vertex_id"),
    )
    inside_cand = ex.filter(
        F.col("intra") & (F.col("slot") < F.least(F.lit(window), F.col("size_c")))
    ).select(
        "edge_id", F.lit(1).alias("pool"),
        F.least(F.col("k").cast("long"), F.col("size_c")).alias("take"),
        (in_idx * C + F.col("c")).cast("long").alias("vertex_id"),
    )
    # top-up: materialize the candidate index as a column first so the
    # exact integer div/mod below reference it by name
    topup_base = ex.filter(
        F.col("intra") & (F.col("size_c") < F.col("k"))
        & (F.col("slot") < F.least(F.lit(window), out_pop))
    ).select("edge_id", "k", "c", "size_c", out_idx.cast("long").alias("_oi"))
    if C > 1:
        blk = F.expr(f"_oi div {C - 1}")
        off = F.pmod(F.col("_oi"), F.lit(C - 1))
    else:  # degenerate: no outside pool exists (topup_base is empty)
        blk, off = F.lit(0), F.lit(0)
    topup_cand = topup_base.select(
        "edge_id", F.lit(2).alias("pool"),
        (F.col("k").cast("long") - F.col("size_c")).alias("take"),
        (blk * C + F.when(off < F.col("c"), off).otherwise(off + 1))
        .cast("long").alias("vertex_id"),
    )
    cands = (
        uni_cand.unionByName(inside_cand).unionByName(topup_cand)
        .select("edge_id", "pool", "take", "vertex_id")
        .distinct()
    )
    rank_h = h60(
        F.concat(F.lit(f"{seed}:r:"), eid, F.lit(":"), F.col("vertex_id").cast("string"))
    )
    w = Window.partitionBy("edge_id", "pool").orderBy(
        rank_h.asc(), F.col("vertex_id").asc()
    )
    return (
        cands.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("take"))
        .select("edge_id", "vertex_id")
    )


def hsbm_hypergraph(
    spark: SparkSession,
    num_vertices: int,
    num_edges: int,
    communities: int = 8,
    p_intra: float = 0.9,
    p_inter: float = 0.05,
    min_edge_size: int = 3,
    max_edge_size: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Rejection sampling (hypergraph.cpp:238-285): keep the first
    ``num_edges`` accepted candidates in candidate order, re-numbered
    densely.  The driver doubles the candidate pool until enough accept
    (the reference instead aborts after max(20m, 1000) attempts).

    Hash-ranked form: candidate members come from the shared sampler
    (:func:`_hash_members`, hash stream ``seed:h``); a candidate is
    monochromatic iff all members share ``v % C``; acceptance draws
    ``h60(seed:x:cand) % 10^6 < p * 10^6`` with p = p_intra/p_inter by
    monochromaticity — all md5 arithmetic, so the DuckDB twin
    regenerates the identical hypergraph when the first candidate pool
    suffices (the contract query pins such parameters)."""
    from hypergraph_gpu_label_propagation_spark.operators.dedup import h60

    C = communities

    def accepted(candidates: int) -> DataFrame:
        inc = _hash_members(
            spark, candidates, num_vertices, min_edge_size, max_edge_size,
            f"{seed}:h", id_name="cand_id",
        )
        mono = (
            inc.groupBy("cand_id")
            .agg(F.count_distinct(F.pmod("vertex_id", F.lit(C))).alias("_nc"))
            .select("cand_id", (F.col("_nc") == 1).alias("_mono"))
        )
        p6_intra = int(round(p_intra * 1_000_000))
        p6_inter = int(round(p_inter * 1_000_000))
        draw = F.pmod(
            h60(F.concat(F.lit(f"{seed}:x:"), F.col("cand_id").cast("string"))),
            F.lit(1_000_000),
        )
        keep = mono.filter(
            draw < F.when(F.col("_mono"), F.lit(p6_intra)).otherwise(F.lit(p6_inter))
        ).select("cand_id")
        return inc.join(keep, "cand_id")

    n_cand = max(4 * num_edges, 1000)
    n_acc = 0
    for _ in range(8):
        acc = accepted(n_cand)
        n_acc = acc.select("cand_id").distinct().count()
        if n_acc >= num_edges:
            break
        n_cand *= 2
    if n_acc < num_edges:
        # mirror the reference's failure behavior (hypergraph.cpp:238-285
        # aborts after max(20m, 1000) rejected attempts) instead of silently
        # returning a smaller hypergraph than requested
        raise RuntimeError(
            f"hsbm_hypergraph: only {n_acc}/{num_edges} hyperedges accepted after "
            f"8 candidate-pool doublings ({n_cand} candidates); raise p_intra/p_inter "
            "or lower num_edges"
        )
    # dense renumbering WITHOUT a single-partition global window: the
    # two-step range-partitioned rank (sources/source_files.py::dense_ids
    # — per-range row_number + broadcast cumulative offsets) assigns the
    # same ids as ROW_NUMBER() OVER (ORDER BY cand_id) at any scale
    from hypergraph_gpu_label_propagation_spark.sources.source_files import dense_ids

    kept = dense_ids(acc.select("cand_id").distinct(), ["cand_id"], "edge_id").filter(
        F.col("edge_id") < num_edges
    )
    return acc.join(kept, "cand_id").select("edge_id", "vertex_id")


def random_labels(
    spark: SparkSession, num_vertices: int, classes: int, label_seed: int = 42
) -> DataFrame:
    """label ~ U[0, classes) per vertex (hypergraph.cpp:229-236), as a
    pure column expression — no Python in the path."""
    return spark.range(num_vertices).select(
        F.col("id").alias("vertex_id"),
        F.pmod(F.xxhash64("id", F.lit(label_seed)), F.lit(classes)).cast("int").alias("label"),
    )
