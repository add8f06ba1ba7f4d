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
per-bucket local top-k followed by a tiny global merge.
"""

from __future__ import annotations

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


def _plane_sign(plane: int, dim: int) -> F.Column:
    """Deterministic +-1 from md5('p{plane}:d{dim}') parity — identical
    formula is reproducible in any engine with md5."""
    h = F.conv(F.substring(F.md5(F.lit(f"p{plane}:d{dim}")), 1, 15), 16, 10).cast("long")
    return F.when(h % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def signlsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """(id, bucket): bucket = integer whose bit p is sign(v . plane_p).

    Planes are +-1 vectors (Rademacher), deterministic via md5; the dot
    product is a JVM-side aggregate over the array column.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = F.array(*[_plane_sign(p, d) for d in range(dim)])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), plane, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0))
    return df.select(F.col(id_col), bucket.alias("bucket"))


def signlsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 8,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates from same-bucket collisions (plus
    hamming-1 probe buckets when ``multiprobe``), exact cosine re-rank
    on candidates only.  Returns (query_id, neighbor_id, cos_sim, rank)."""
    dim = len(corpus.select(vec_col).first()[0])
    cb = signlsh_buckets(corpus, id_col, vec_col, num_planes, dim).join(
        corpus.select(F.col(id_col), F.col(vec_col)), id_col
    ).select(F.col(id_col).alias("neighbor_id"), "bucket", F.col(vec_col).alias("_cv"))

    qb = signlsh_buckets(queries, id_col, vec_col, num_planes, dim).join(
        queries.select(F.col(id_col), F.col(vec_col)), id_col
    ).select(F.col(id_col).alias("query_id"), "bucket", F.col(vec_col).alias("_qv"))

    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(num_planes)],
        )
        qb = qb.select("query_id", "_qv", F.explode(probes).alias("bucket"))

    cand = (
        F.broadcast(qb).join(cb, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_sim(F.col("_qv"), F.col("_cv")), 6).alias("cos_sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
