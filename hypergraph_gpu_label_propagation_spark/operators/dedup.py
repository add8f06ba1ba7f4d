"""Deduplication operators for large-scale training-data pipelines.

All hot paths are built-in column expressions (JVM-side); the hash
primitives (md5, the 60-bit hex->long trick) are chosen so every
operator has an exact ANSI-SQL twin runnable by the DuckDB oracle.

Operators:
- exact_dedup_groups / exact_dedup: hash-groupBy exact dedup;
- shingles: n-token shingling (the base for MinHash / Jaccard);
- ngram_jaccard_pairs: exact n-gram Jaccard similarity join
  (shingle-explode + equi-join + count ratio) — quadratic only within
  shingle buckets, the standard exact near-dup verifier;
- minhash_signatures / minhash_lsh_candidates: MinHash + banded LSH
  candidate generation (Broder 1997; Leskovec et al., MMDS ch.3) —
  the scale path: candidates come from band-bucket equi-joins, never
  an all-pairs product;
- simhash64: Charikar 2002 sign-random-projection fingerprint over
  token hashes, 60 bits (bit b = sign of the +-1 vote sum);
- embedding_near_dup_pairs: banded sign-LSH candidates + exact cosine
  verify on candidates only — the scale path for embedding near-dup;
- embedding_cosine_dup_pairs_exact: exact all-pairs cosine near-dup
  (test oracle for the LSH path; O(N^2), small inputs only).

Hash primitive: ``h60(s) = bigint(first 15 hex chars of md5(s))``
(60 bits, always positive, identical in Spark via
``conv(substring(md5(s),1,15),16,10)`` and DuckDB via
``('0x' || substr(md5(s),1,15))::BIGINT``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MERSENNE31 = 2147483647  # 2^31 - 1, the minhash modulus


def h60(col: Column | str) -> Column:
    """60-bit positive hash of a string (md5-based, cross-engine exact)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """(content_hash, keep_id, n_dups): one row per distinct content;
    keep_id = smallest id in the group (the canonical survivor)."""
    return (
        df.select(F.md5(F.col(content_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """The deduplicated rows themselves (keep the smallest id per content)."""
    groups = exact_dedup_groups(df, id_col, content_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(groups, id_col, "left_semi")


# ---------------------------------------------------------------------------
# shingling + exact n-gram Jaccard
# ---------------------------------------------------------------------------


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct n-token shingles (space-joined).  Empty for docs shorter
    than n tokens."""
    toks = F.split(text, " ")
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    parts = lambda i: [F.element_at(toks, i + j) for j in range(n)]  # noqa: E731
    sh = F.transform(idx, lambda i: F.concat_ws(" ", *parts(i)))
    return F.when(F.size(toks) >= n, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) exploded distinct shingles.

    Tokenizes into a materialized column first so ``split`` runs once
    per row — inlining it into the transform lambda re-evaluates the
    split per shingle element (no common-subexpression elimination
    inside lambda bodies)."""
    toks = F.col("_toks")
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    parts = lambda i: [F.element_at(toks, i + j) for j in range(n)]  # noqa: E731
    sh = F.transform(idx, lambda i: F.concat_ws(" ", *parts(i)))
    shingle_arr = F.when(F.size(toks) >= n, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )
    return (
        df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_toks"))
        .select(F.col(id_col), F.explode(shingle_arr).alias("shingle"))
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.2
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with n-gram Jaccard >= threshold,
    id_a < id_b, jaccard rounded to 6.

    Exact similarity join: pairs are generated ONLY for docs sharing at
    least one shingle (equi-join on shingle), so cost is sum of squared
    bucket sizes, not |docs|^2.  For web scale put minhash_lsh_candidates
    in front and use this as the verifier on candidates.
    """
    sh = doc_shingles(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + banded LSH
# ---------------------------------------------------------------------------


def minhash_coeffs(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) coefficients for the k-th permutation:
    h_k(x) = (a_k * x + b_k) mod (2^31 - 1).  Fixed formula so the
    DuckDB oracle can regenerate them."""
    return [(2 * i + 1, 7919 * i + 1) for i in range(k)]


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 8
) -> DataFrame:
    """(id, mh0..mh{K-1}): MinHash signature over n-gram shingles.
    Docs with no shingles are dropped (no signature to compare)."""
    sh = doc_shingles(df, id_col, text_col, n).select(
        F.col(id_col), (h60("shingle") % MERSENNE31).alias("h")
    )
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MERSENNE31).alias(f"mh{i}")
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes))
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """(id_a, id_b) candidate near-dup pairs: docs agreeing on ALL rows
    of at least one band (rows_per_band = num_hashes // bands).
    Candidates then go through ngram_jaccard_pairs or exact compare —
    LSH is the recall stage, never the verdict."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    # r08 (guide §2.3): one explode over a band-struct array instead of
    # a bands-way union — the union's branches each re-aggregated the
    # signature subplan (the shingle explode + groupBy) per band; the
    # explode computes it once and emits the identical (id, band,
    # bucket) rows in a single projection.
    band_structs = [
        F.struct(
            F.lit(j).cast("int").alias("band"),
            F.md5(
                F.concat_ws(
                    ",", *[F.col(f"mh{j * r + t}").cast("string") for t in range(r)]
                )
            ).alias("bucket"),
        )
        for j in range(bands)
    ]
    banded = sig.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("_bb")
    ).select(F.col(id_col), F.col("_bb.band").alias("band"), F.col("_bb.bucket").alias("bucket"))
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """The production near-dup pipeline: MinHash-LSH candidate recall ->
    exact n-gram Jaccard verification on candidates ONLY.

    This is the shape that survives 100 TB: the all-pairs stage never
    exists; LSH bounds candidates to band-bucket collisions, and the
    exact verifier (shingle join restricted by a semi-join to candidate
    ids... here simply an inner join against the candidate pair set)
    touches only those.  Returns (id_a, id_b, jaccard) with
    jaccard >= threshold.
    """
    cands = minhash_lsh_candidates(df, id_col, text_col, n, num_hashes, bands)
    sh = doc_shingles(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        a.join(cands, "id_a", "left_semi")
        .join(b.join(cands, "id_b", "left_semi"), "shingle")
        .join(cands, ["id_a", "id_b"])  # only verified candidate pairs
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a").join(sb, "id_b")
        .select(
            "id_a", "id_b",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash): 60-bit sign-random-projection fingerprint.  Token
    multiplicity counts (standard Charikar weighting with unit weights);
    bit b of the fingerprint is 1 iff the sum over tokens of
    (bit b of h60(token) ? +1 : -1) is > 0."""
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).select(F.col(id_col), h60("tok").alias("h"))
    # r08 (guide §2.3 narrow work per row): the ±1 vote sum per bit is
    # algebraically 2*(#set bits) - n, so aggregate the raw bit counts
    # (a bare shiftright+AND per bit, no conditional branch per row)
    # plus one count(*), and compare 2*cnt_b > n at the end — exact
    # integer identity with the previous when(+1/-1) sums.
    bit_sums = tok.groupBy(id_col).agg(
        F.count("*").alias("_n"),
        *[
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"s{b}")
            for b in range(SIMHASH_BITS)
        ],
    )
    acc = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        acc = acc + F.when(
            2 * F.col(f"s{b}") > F.col("_n"), F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return bit_sums.select(F.col(id_col), acc.alias("simhash"))


def simhash_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """(id_a, id_b, hamming) pairs within Hamming distance, via the
    standard block trick: split the fingerprint into max_hamming+1
    chunks — any pair within distance must agree exactly on >= 1 chunk,
    so candidates come from chunk equi-joins (no all-pairs)."""
    # eager localCheckpoint, not persist(): sig is referenced by every
    # chunk branch plus the two verify joins; checkpoint blocks are
    # GC-reclaimed (ContextCleaner), persist() entries leak until an
    # explicit unpersist the lazy return value can't schedule
    sig = simhash64(df, id_col, text_col).localCheckpoint(eager=True)
    chunks = max_hamming + 1
    width = SIMHASH_BITS // chunks
    pieces = []
    for c in range(chunks):
        mask = (1 << width) - 1
        pieces.append(
            sig.select(
                F.col(id_col),
                F.lit(c).alias("chunk"),
                F.shiftright("simhash", c * width).bitwiseAND(F.lit(mask)).alias("piece"),
            )
        )
    cand = pieces[0]
    for p in pieces[1:]:
        cand = cand.unionByName(p)
    a = cand.select(F.col(id_col).alias("id_a"), "chunk", "piece")
    b = cand.select(F.col(id_col).alias("id_b"), "chunk", "piece")
    pairs = (
        a.join(b, ["chunk", "piece"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sig.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sim_a"))
    sb = sig.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sim_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns, computed
    JVM-side with zip_with + aggregate (no Python)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return dot / (na * nb)


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.95,
    num_bands: int = 4,
    planes_per_band: int = 8,
) -> DataFrame:
    """(id_a, id_b, cos_sim) near-dup pairs by cosine >= threshold, at
    scale: banded sign-LSH candidates + exact cosine verify on candidates
    only — the all-pairs stage never exists.

    Band b hashes every vector with its own ``planes_per_band``
    deterministic Rademacher planes (globally numbered, so bands are
    independent); candidates = pairs agreeing on ALL bits of >= 1 band
    (an equi-join on (band, bucket) — same shape as the MinHash LSH
    band join above).  Recall for a pair at angle theta is
    1 - (1 - (1 - theta/pi)^planes_per_band)^num_bands: ~0.99 at
    cos=0.95 with the 4x8 default.  Exact-cosine verification keeps
    precision at 1.0.

    Scale: one narrow (id, band, bucket) shuffle to build the index,
    equi-join within buckets, semi-join-restricted verify — mirrors
    near_dup_pairs (MinHash) so both near-dup paths survive 100 TB.
    """
    from hypergraph_gpu_label_propagation_spark.operators.similarity import (
        signlsh_band_buckets_arrow,
    )

    vecs = df.select(F.col(id_col), F.col(vec_col))
    # all bands in ONE corpus scan, evaluated Arrow/numpy (guide §4.2 —
    # the interpreted per-plane HOF fold was the dominant cost of this
    # query: 1.4 s of 3.1 s at sf0.1; the numpy form is bit-identical
    # by order-preserving accumulation — see signlsh_band_buckets_arrow
    # — and measured 0.25 s).  Eagerly materialized (r08): both sides
    # of the candidate self-join reference this frame, and with no
    # exchange in its plan there is nothing for ReuseExchange to dedupe
    # — unpinned, each side re-evaluated the bucket computation.
    # localCheckpoint, not persist: blocks are GC-reclaimed, same
    # discipline as simhash_dup_pairs.
    bands = signlsh_band_buckets_arrow(
        vecs, id_col, vec_col, dim, num_bands, planes_per_band
    ).localCheckpoint(eager=True)
    a = bands.select(F.col(id_col).alias("id_a"), "band", "bucket")
    bb = bands.select(F.col(id_col).alias("id_b"), "band", "bucket")
    cand = (
        a.join(bb, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a", "id_b",
            F.round(cosine_sim(F.col("_va"), F.col("_vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_cosine_dup_pairs_exact(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Brute-force all-pairs twin of :func:`embedding_near_dup_pairs` —
    O(N^2), TEST ORACLE ONLY (recall ground truth for the LSH path);
    never call on a corpus."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", F.round(cosine_sim(F.col("_va"), F.col("_vb")), 6).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# Fuzzy-dedup clustering (pairs -> components -> canonical keeper)
# ---------------------------------------------------------------------------


def dedup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """The stage AFTER near-dup pair generation in a production dedup
    pipeline (the shape of Lee et al. 2022 / BigQuery-style fuzzy
    dedup): near-duplication is transitive in intent — if A~B and B~C
    all three are one duplicate family even when A~C misses the
    threshold — so group pairs into connected components and keep ONE
    canonical document per component.

    Returns (doc_id, cluster_id, keep): ``cluster_id`` = the MIN doc
    id of the component (min-label CC fixed point), ``keep`` = this is
    the canonical survivor.  Documents with no verified near-dup
    partner are singleton clusters (keep = true).

    100 TB shape: CC runs on the PAIR graph only — verified near-dup
    pairs are a vanishing fraction of the corpus, so the iterative part
    touches a tiny frame; the corpus appears once, in a single
    left join from (id) onto the component map.  Pass ``pairs=`` to
    reuse an already-materialized ``near_dup_pairs`` result (the board
    query shares one pair computation between the pair and cluster
    views).
    """
    from .digraph import connected_components_edges

    if pairs is None:
        pairs = near_dup_pairs(
            df, id_col, text_col, n, num_hashes, bands, threshold
        )
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    comp = connected_components_edges(edges).components
    ids = df.select(F.col(id_col).alias("doc_id"))
    return (
        ids.join(comp, ids.doc_id == comp.vertex_id, "left")
        .select(
            "doc_id",
            F.least(
                F.col("doc_id"), F.coalesce("component", F.col("doc_id"))
            ).alias("cluster_id"),
        )
        .withColumn("keep", F.col("doc_id") == F.col("cluster_id"))
    )
