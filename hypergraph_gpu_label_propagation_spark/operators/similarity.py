"""Similarity search over embedding columns.

- :func:`cosine_topk` — exact brute-force top-k by cosine for a query
  set: broadcast the (small) query side against the corpus, dot/norm
  via ``zip_with``/``aggregate`` (JVM-side), per-query top-k via window.
  The correctness baseline; O(|queries| * N).
- :func:`signlsh_buckets` / :func:`signlsh_topk` — the scale path:
  sign-random-projection LSH (Charikar 2002).  Deterministic
  pseudo-random hyperplanes derived from md5(plane:dim) so buckets are
  reproducible cross-engine; candidates = bucket collisions (optionally
  multi-probe by hamming-1 neighbors), then exact cosine re-rank on the
  candidate set only.

At 100 TB: the corpus stays partitioned by bucket (one shuffle at index
build), each query touches only its probe buckets, and re-ranking is a
per-bucket local top-k followed by a tiny global merge — that is the
``broadcast_queries=False`` path of :func:`signlsh_topk`; the default
``True`` broadcasts small interactive query sets instead (no corpus
shuffle at all).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hypergraph_gpu_label_propagation_spark.operators.dedup import cosine_sim


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """(query_id, neighbor_id, cos_sim, rank) exact top-k neighbors per
    query; deterministic tie-break (cos_sim desc, neighbor_id asc);
    cos_sim rounded to 6 for cross-engine comparability."""
    def norm(col):
        return F.sqrt(
            F.aggregate(col, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double"))
        )

    # precompute norms once per vector (not once per pair)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"),
        norm(F.col(vec_col)).alias("_cn"),
    )
    pairs = F.broadcast(q).crossJoin(c)
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    dot = F.aggregate(
        F.zip_with(F.col("_qv"), F.col("_cv"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(dot / (F.col("_qn") * F.col("_cn")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def plane_sign_value(plane: int, dim: int) -> float:
    """Deterministic +-1 from md5('p{plane}:d{dim}') parity — identical
    formula is reproducible in any engine with md5 (DuckDB twin:
    ('0x'||substr(md5('p'||p||':d'||d),1,15))::BIGINT % 2)."""
    h = int(hashlib.md5(f"p{plane}:d{dim}".encode()).hexdigest()[:15], 16)
    return 1.0 if h % 2 == 0 else -1.0


def plane_matrix(num_planes: int, dim: int, first_plane: int = 0) -> list[list[float]]:
    """The +-1 Rademacher plane matrix, precomputed driver-side.  Shipped
    to executors as ONE literal, so the plan stays O(num_planes) nodes at
    any embedding dim (at dim=768 the old per-element expression tree was
    a ~30k-node codegen blowup)."""
    return [
        [plane_sign_value(p, d) for d in range(dim)]
        for p in range(first_plane, first_plane + num_planes)
    ]


def bucket_expr(vec_col: F.Column, planes: list[list[float]]) -> F.Column:
    """bucket = integer whose bit p is sign(vec . plane_p), as a single
    JVM-side expression over a literal plane matrix: per-plane dot via
    transform+zip_with/aggregate, bit packing via a literal power array."""
    powers = F.lit([float(1 << p) for p in range(len(planes))])
    bits = F.transform(
        F.lit(planes),
        lambda plane: F.when(
            F.aggregate(
                F.zip_with(vec_col, plane, lambda x, s: x.cast("double") * s),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1.0),
        ).otherwise(F.lit(0.0)),
    )
    return (
        F.aggregate(
            F.zip_with(bits, powers, lambda b, w: b * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        .cast("long")
    )


def signlsh_band_buckets_arrow(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    num_bands: int = 4,
    planes_per_band: int = 8,
) -> DataFrame:
    """(id, band, bucket) — Arrow/numpy evaluation of the SAME bucket
    bits as :func:`signlsh_band_buckets` (guide §4.2: hand whole
    batches to vectorized native code; the interpreted per-plane HOF
    fold measured ~28 µs/row at dim=64 × 32 planes and dominated the
    embedding near-dup query).

    BIT-IDENTICAL to the expression form by construction: the JVM fold
    computes dot_p as ((0 + x_0·s_0) + x_1·s_1) + …, so the numpy loop
    accumulates per-DIMENSION in the same left-to-right order
    (acc += x_d·s_d for d = 0..dim-1, each an IEEE double op on exactly
    the same operands — float32 inputs widen exactly).  The bit packing
    Σ b_p·2^p is a sum of exact powers of two (< 2^53), exact in any
    order.  tests/test_r08_broadcast_gather.py pins frame equality
    against the expression form.
    """
    import numpy as np
    import pandas as pd

    S = np.array(
        [
            plane
            for b in range(num_bands)
            for plane in plane_matrix(planes_per_band, dim, b * planes_per_band)
        ],
        dtype=np.float64,
    )  # (num_bands * planes_per_band, dim)
    powers = np.power(2.0, np.arange(planes_per_band, dtype=np.float64))
    nb, ppb = num_bands, planes_per_band

    def fn(it):
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)  # (n, dim)
            acc = np.zeros((n, S.shape[0]), dtype=np.float64)
            for d in range(dim):
                # same accumulation order as the JVM fold (bit-exact)
                acc += x[:, d : d + 1] * S[:, d]
            bits = (acc > 0.0).astype(np.float64)
            buckets = (
                (bits.reshape(n, nb, ppb) * powers).sum(axis=2).astype(np.int64)
            )
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), nb),
                    "band": np.tile(np.arange(nb, dtype=np.int32), n),
                    "bucket": buckets.reshape(-1),
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, vec_col).mapInPandas(
        fn, f"{id_col} {id_type}, band int, bucket long"
    )


def signlsh_band_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    num_bands: int = 4,
    planes_per_band: int = 8,
) -> DataFrame:
    """(id, band, bucket) for ALL bands in ONE scan of the corpus: the
    per-band bucket expressions evaluate side by side in a single
    projection, then explode — at 100 TB this is one pass over the
    vectors instead of ``num_bands`` unioned scans.  Band b uses globally
    numbered planes [b*planes_per_band, (b+1)*planes_per_band)."""
    per_band = [
        F.struct(
            F.lit(b).alias("band"),
            bucket_expr(
                F.col(vec_col), plane_matrix(planes_per_band, dim, b * planes_per_band)
            ).alias("bucket"),
        )
        for b in range(num_bands)
    ]
    return df.select(
        F.col(id_col), F.explode(F.array(*per_band)).alias("_bb")
    ).select(id_col, F.col("_bb.band").alias("band"), F.col("_bb.bucket").alias("bucket"))


def signlsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int | None = None,
    first_plane: int = 0,
) -> DataFrame:
    """(id, bucket): bucket = integer whose bit p is sign(v . plane_p).

    Planes are +-1 vectors (Rademacher), deterministic via md5, built
    driver-side (:func:`plane_matrix`) and shipped as one literal.
    ``dim`` is required — sniffing it from the data would cost a driver
    action per call (and break on an empty frame).
    """
    if dim is None:
        raise ValueError(
            "signlsh_buckets requires dim (the embedding dimensionality); "
            "pass it explicitly instead of sniffing the data"
        )
    planes = plane_matrix(num_planes, dim, first_plane)
    return df.select(F.col(id_col), bucket_expr(F.col(vec_col), planes).alias("bucket"))


def signlsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 8,
    multiprobe: bool = True,
    dim: int | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates from same-bucket collisions (plus
    hamming-1 probe buckets when ``multiprobe``), exact cosine re-rank
    on candidates only.  Returns (query_id, neighbor_id, cos_sim, rank).

    ``dim`` is required (embedding dimensionality) — no data sniffing.

    ``broadcast_queries`` picks the physical strategy for the
    bucket-collision join:

    - ``True`` (default): broadcast the (small) probe-exploded query
      side — right for interactive query sets that fit the broadcast
      limit; the corpus is scanned exactly once, no shuffle on it.
    - ``False``: the LARGE-query-set path (|Q| beyond broadcast size,
      e.g. corpus-vs-corpus dedup or batch retrieval).  Both sides
      shuffle on ``bucket`` (``SHUFFLE_HASH`` hint — never a driver-side
      broadcast build), then a per-(bucket, query) local top-k runs
      WITHOUT re-shuffling (hash partitioning on bucket already
      co-locates each group; only a local sort is added) so at most
      ``k`` rows per probe bucket survive into the global
      per-query merge.  The global top-k over the union of per-bucket
      top-ks equals the top-k over all candidates: every candidate
      lives in >= 1 probe bucket, and inside that bucket its rank under
      the same total order bounds its global rank.

    Both paths produce identical results (pytest-asserted at |Q|=10^4).
    """
    if dim is None:
        raise ValueError("signlsh_topk requires dim (the embedding dimensionality)")
    planes = plane_matrix(num_planes, dim)
    # bucket + vector in ONE projection — a single scan per side (the
    # former signlsh_buckets + join-back shape scanned each side twice)
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        bucket_expr(F.col(vec_col), planes).alias("bucket"),
        F.col(vec_col).alias("_cv"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        bucket_expr(F.col(vec_col), planes).alias("bucket"),
        F.col(vec_col).alias("_qv"),
    )

    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(num_planes)],
        )
        qb = qb.select("query_id", "_qv", F.explode(probes).alias("bucket"))

    joined = (
        F.broadcast(qb).join(cb, "bucket")
        if broadcast_queries
        else qb.hint("shuffle_hash").join(cb, "bucket")
    )
    pairs = joined.filter(F.col("query_id") != F.col("neighbor_id")).select(
        "bucket",
        "query_id",
        "neighbor_id",
        F.round(cosine_sim(F.col("_qv"), F.col("_cv")), 6).alias("cos_sim"),
    )
    order = (F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    if not broadcast_queries:
        # per-bucket local top-k before the global merge: bounds the
        # shuffle into the per-query window to (probes * k) rows/query
        wl = Window.partitionBy("bucket", "query_id").orderBy(*order)
        pairs = (
            pairs.withColumn("_lr", F.row_number().over(wl))
            .filter(F.col("_lr") <= k)
            .drop("_lr")
        )
    cand = pairs.select("query_id", "neighbor_id", "cos_sim").distinct()
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ann_recall(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """One-row (n_exact, n_hit, recall): fraction of exact top-k pairs the
    approximate result recovered.  Meant to ride along a production ANN
    run (sampled query set) so recall is measured per run, not per test."""
    ex = exact.select("query_id", "neighbor_id")
    ap = approx.select("query_id", "neighbor_id", F.lit(1).alias("_hit"))
    joined = ex.join(ap, ["query_id", "neighbor_id"], "left")
    return joined.agg(
        F.count("*").alias("n_exact"),
        F.sum(F.coalesce("_hit", F.lit(0))).alias("n_hit"),
        F.round(F.sum(F.coalesce("_hit", F.lit(0))) / F.count("*"), 6).alias("recall"),
    )
