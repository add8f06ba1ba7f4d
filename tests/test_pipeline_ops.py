"""Training-data pipeline operators: dedup family, similarity search,
text analysis, multimodal plumbing — correctness on synthetic corpora
with known ground truth."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hypergraph_gpu_label_propagation_spark.functions.text import (
    detect_language,
    fingerprint,
    quality_features,
)
from hypergraph_gpu_label_propagation_spark.operators.dedup import (
    embedding_cosine_dup_pairs_exact,
    embedding_near_dup_pairs,
    exact_dedup,
    exact_dedup_groups,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
    simhash_dup_pairs,
)
from hypergraph_gpu_label_propagation_spark.operators.multimodal import (
    DecodeBackend,
    decode_assets,
    extract_features,
    frame_sample_plan,
    synth_assets,
)
from hypergraph_gpu_label_propagation_spark.operators.similarity import (
    cosine_topk,
    signlsh_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the old river bank"
    near = "the quick brown fox jumps over the lazy dog near the old river bend"
    rows = [
        (0, base),
        (1, base),                      # exact dup of 0
        (2, near),                      # near dup of 0 (1 token differs)
        (3, "completely different words about spark shuffles and partitions"),
        (4, "der hund und die katze ist das haus und der baum"),
        (5, "el perro es la casa de el gato que es grande"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def test_exact_dedup(spark, docs):
    groups = exact_dedup_groups(docs, "doc_id", "text")
    dup_group = groups.filter(F.col("n_dups") > 1).collect()
    assert len(dup_group) == 1
    assert dup_group[0]["keep_id"] == 0 and dup_group[0]["n_dups"] == 2
    kept = exact_dedup(docs, "doc_id", "text")
    ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    assert ids == [0, 2, 3, 4, 5]  # doc 1 removed


def test_ngram_jaccard_finds_near_dup(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2).collect()}
    assert pairs[(0, 1)] == 1.0          # exact dup -> jaccard 1
    assert (0, 2) in pairs and 0.5 < pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_minhash_lsh_candidates_recall(spark, docs):
    cands = {(r["id_a"], r["id_b"])
             for r in minhash_lsh_candidates(docs, "doc_id", "text").collect()}
    assert (0, 1) in cands               # identical docs always collide
    # signatures of identical docs are identical
    sig = minhash_signatures(docs, "doc_id", "text").collect()
    by_id = {r["doc_id"]: tuple(r)[1:] for r in sig}
    assert by_id[0] == by_id[1]
    assert by_id[0] != by_id[3]


def test_simhash_properties(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash64(docs, "doc_id", "text").collect()}
    assert sh[0] == sh[1]
    ham02 = bin(sh[0] ^ sh[2]).count("1")
    ham03 = bin(sh[0] ^ sh[3]).count("1")
    assert ham02 < ham03, "near-dup must be closer in hamming than unrelated doc"
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_dup_pairs(docs, "doc_id", "text", max_hamming=6).collect()}
    assert pairs[(0, 1)] == 0


def test_text_quality_and_fingerprint(spark, docs):
    q = {r["doc_id"]: r for r in quality_features(docs, "doc_id", "text").collect()}
    assert q[0]["n_tokens"] == 14
    assert q[0]["n_distinct"] == 12  # 'the' x3 -> dedup
    assert 0 < q[0]["stopword_ratio"] < 1
    fps = docs.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect()
    by_id = {r["doc_id"]: r["fp"] for r in fps}
    assert by_id[0] == by_id[1] and by_id[0] != by_id[3]


def test_detect_language(spark, docs):
    langs = {r["doc_id"]: r["lang_guess"]
             for r in detect_language(docs, "doc_id", "text").collect()}
    assert langs[0] == "en"
    assert langs[4] == "de"
    assert langs[5] == "es"


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(42)
    base = rng.normal(size=(20, 16)).astype(np.float32)
    base[1] = base[0] + 0.01 * rng.normal(size=16).astype(np.float32)  # near-dup of 0
    rows = [(i, v.tolist()) for i, v in enumerate(base)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").persist()


def test_cosine_topk_exact(spark, vectors):
    out = cosine_topk(vectors, vectors.filter("vec_id = 0"), k=3).collect()
    assert len(out) == 3
    assert out[0]["neighbor_id"] == 1  # the planted near-dup wins
    assert out[0]["rank"] == 1 and out[0]["cos_sim"] > 0.99
    # oracle check with numpy
    rows = {r["vec_id"]: np.array(r["embedding"]) for r in vectors.collect()}
    v0 = rows[0]
    sims = {i: float(v0 @ v / (np.linalg.norm(v0) * np.linalg.norm(v)))
            for i, v in rows.items() if i != 0}
    want = sorted(sims, key=lambda i: (-round(sims[i], 6), i))[:3]
    assert [r["neighbor_id"] for r in out] == want


def test_embedding_near_dup_lsh_matches_exact(spark, vectors):
    """The banded-LSH near-dup path finds the planted pair, and its exact
    verify stage keeps precision 1.0 vs the brute-force oracle."""
    got = embedding_near_dup_pairs(
        vectors, "vec_id", "embedding", dim=16, threshold=0.99
    ).collect()
    want = embedding_cosine_dup_pairs_exact(
        vectors, "vec_id", "embedding", threshold=0.99
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {(0, 1)}
    assert {(r["id_a"], r["id_b"]) for r in got} <= {(r["id_a"], r["id_b"]) for r in want}


def test_embedding_near_dup_no_crossjoin(spark, vectors):
    """The scale path must never materialize an all-pairs product."""
    plan = embedding_near_dup_pairs(
        vectors, "vec_id", "embedding", dim=16, threshold=0.99
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "Join Cross" not in plan and "CartesianProduct" not in plan


def test_signlsh_finds_planted_neighbor(spark, vectors):
    out = signlsh_topk(
        vectors, vectors.filter("vec_id = 0"), k=3, num_planes=6, dim=16
    ).collect()
    assert out and out[0]["neighbor_id"] == 1  # near-identical vector shares every bucket


def test_signlsh_requires_dim(spark, vectors):
    with pytest.raises(ValueError, match="dim"):
        signlsh_topk(vectors, vectors, k=3)


def test_signlsh_wide_dim_plan_stays_small(spark):
    """At a real embedding dim (768) the plan must stay O(num_planes)
    nodes — the plane matrix ships as ONE literal, not 768x8 expression
    nodes (round-1 verdict scale hazard)."""
    from hypergraph_gpu_label_propagation_spark.operators.similarity import (
        signlsh_buckets,
    )

    rng = np.random.default_rng(7)
    rows = [(i, rng.normal(size=768).astype(np.float32).tolist()) for i in range(4)]
    wide = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = signlsh_buckets(wide, "vec_id", "embedding", num_planes=8, dim=768)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 200_000  # the old per-element tree printed ~30k nodes
    got = out.collect()
    assert len(got) == 4
    # buckets agree with a numpy recomputation of the same md5 planes
    from hypergraph_gpu_label_propagation_spark.operators.similarity import plane_matrix

    planes = np.array(plane_matrix(8, 768))
    for r in got:
        v = np.array(dict(rows)[r["vec_id"]], dtype=np.float64)
        want = sum(1 << p for p in range(8) if float(planes[p] @ v) > 0)
        assert r["bucket"] == want


def test_ann_recall_reporting(spark, vectors):
    from hypergraph_gpu_label_propagation_spark.operators.similarity import ann_recall

    queries = vectors.filter("vec_id < 4")
    exact = cosine_topk(vectors, queries, k=3)
    approx = signlsh_topk(vectors, queries, k=3, num_planes=6, dim=16)
    row = ann_recall(approx, exact).collect()[0]
    assert row["n_exact"] == 12
    assert 0.0 <= row["recall"] <= 1.0
    # unrelated gaussian vectors have ~0 cosine sim, so their "top-3" is
    # noise LSH rightly misses; the planted high-sim pair must be recovered
    hits = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert (0, 1) in hits and (1, 0) in hits
    assert row["n_hit"] >= 2


def test_multimodal_plumbing(spark):
    assets = synth_assets(spark, n=30)
    dec = decode_assets(assets).persist()
    assert dec.count() == 30
    vids = dec.filter("kind = 'video'")
    assert vids.filter("n_frames <= 0").count() == 0
    imgs = dec.filter("kind = 'image'")
    assert imgs.filter("n_frames != 1").count() == 0
    # deterministic across runs
    a = sorted(map(tuple, dec.collect()))
    b = sorted(map(tuple, decode_assets(synth_assets(spark, n=30)).collect()))
    assert a == b
    feats = extract_features(assets).collect()
    assert all(len(r["feature"]) == 16 for r in feats)
    plan = frame_sample_plan(dec, every_n=30)
    joined = plan.join(dec, "asset_id").filter(F.col("frame_idx") >= F.col("n_frames"))
    assert joined.count() == 0


def test_multimodal_real_decode_bmp_wav(spark):
    """REAL backend: genuine byte-level BMP/WAV decode (numpy + stdlib,
    no external codec) — metadata must match the synthesized payloads
    exactly, features must be normalized content histograms."""
    from hypergraph_gpu_label_propagation_spark.operators.multimodal import (
        synth_real_assets,
    )

    # +4 appended baseline JPEGs, +4 MP4 videos (container metadata)
    assets = synth_real_assets(spark, n=24)
    dec = decode_assets(assets, backend=DecodeBackend.REAL)
    rows = {r["asset_id"]: r for r in dec.collect()}
    meta = {r["asset_id"]: r["meta"] for r in assets.select("asset_id", "meta").collect()}
    assert len(rows) == 32
    assert sum(r["kind"] == "video" for r in rows.values()) == 4
    for aid, r in rows.items():
        m = meta[aid]
        if r["kind"] == "image":
            assert (r["width"], r["height"]) == (int(m["w"]), int(m["h"]))
            assert r["n_frames"] == 1 and r["sample_rate"] == 0
        elif r["kind"] == "audio":
            assert r["n_frames"] == int(m["n"]) and r["sample_rate"] == int(m["sr"])
            assert abs(r["duration_ms"] - 1000.0 * int(m["n"]) / int(m["sr"])) < 0.01
        else:  # video: MP4 box metadata, no codec involved
            assert (r["width"], r["height"]) == (int(m["w"]), int(m["h"]))
            assert r["n_frames"] == int(m["n"]) and r["sample_rate"] == 0
            assert r["duration_ms"] == (int(m["n"]) * 1000) // int(m["fps"])
    # video FEATURES need frame decode (codec) — excluded from REAL
    feats = extract_features(
        assets.filter("kind != 'video'"), backend=DecodeBackend.REAL
    ).collect()
    assert len(feats) == 28
    assert all(len(r["feature"]) == 16 for r in feats)
    assert all(abs(sum(r["feature"]) - 1.0) < 1e-5 for r in feats)
    # the frame-sample plan is now drivable end-to-end from REAL decode
    plan = frame_sample_plan(dec, every_n=10)
    got = {
        (r["asset_id"], r["frame_idx"]) for r in plan.collect()
    }
    expect = {
        (aid, fi)
        for aid, r in rows.items() if r["kind"] == "video"
        for fi in range(0, r["n_frames"], 10)
    }
    assert got == expect


def test_multimodal_real_backend_rejects_undecodable(spark):
    # non-BMP/WAV bytes and codec-requiring kinds fail loudly, not softly
    assets = synth_assets(spark, n=3)  # payloads are sha256 noise
    with pytest.raises(Exception, match="NotImplementedError|not a BMP|not a WAV|not an MP4"):
        decode_assets(assets, backend=DecodeBackend.REAL).collect()


def test_near_dup_pipeline_end_to_end(spark, docs):
    from hypergraph_gpu_label_propagation_spark.operators.dedup import near_dup_pairs

    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in near_dup_pairs(docs, "doc_id", "text", threshold=0.5).collect()}
    assert pairs.get((0, 1)) == 1.0          # exact dup recalled by LSH, verified exact
    assert all(j >= 0.5 for j in pairs.values())
    assert (0, 3) not in pairs


def test_regex_and_bpe_token_counts(spark):
    from hypergraph_gpu_label_propagation_spark.functions.text import (
        bpe_token_estimate,
        regex_tokens,
    )

    df = spark.createDataFrame(
        [(0, "Hello, world! x2"), (1, "internationalization")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["rt"], r["bpe"])
        for r in df.select(
            "doc_id",
            regex_tokens(F.col("text")).alias("rt"),
            bpe_token_estimate(F.col("text")).alias("bpe"),
        ).collect()
    }
    # 'hello' ',' 'world' '!' 'x2' -> 5 regex tokens
    assert rows[0][0] == ["hello", ",", "world", "!", "x2"]
    # ceil(5/4)+1+ceil(5/4)+1+ceil(2/4) = 2+1+2+1+1 = 7
    assert rows[0][1] == 7
    # one 20-char word -> ceil(20/4) = 5 subwords
    assert rows[1][1] == 5


def test_hash_split_and_sample_deterministic(spark, docs):
    from hypergraph_gpu_label_propagation_spark.functions.sampling import (
        hash_sample,
        hash_split,
    )

    s1 = {
        (r["doc_id"], r["split"])
        for r in hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    }
    s2 = {
        (r["doc_id"], r["split"])
        for r in hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    }
    assert s1 == s2 and len(s1) == 6  # pure function of (id, seed)
    assert {s for _, s in s1} <= {"train", "val", "test"}

    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.5, seed=7).collect()}
    b = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.5, seed=7).collect()}
    assert a == b
    # monotone: a smaller fraction keeps a subset of a larger one
    small = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2, seed=7).collect()}
    assert small <= a

    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, "doc_id", {"train": 0.5, "val": 0.1})
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(docs, "doc_id", 1.5)


def test_signlsh_large_query_set_non_broadcast_path(spark):
    """broadcast_queries=False (the |Q| ~ 10^4 batch path): the bucket
    join is shuffle-based (no BroadcastHashJoin anywhere in the plan —
    a broadcast of 10^4+ probe rows would OOM the driver at real |Q|),
    and the per-bucket-local-top-k + global-merge result is IDENTICAL
    to the broadcast path's."""
    from hypergraph_gpu_label_propagation_spark.operators.similarity import (
        signlsh_topk,
    )
    from hypergraph_gpu_label_propagation_spark.plans.inspect import (
        uses_broadcast_join,
    )

    emb = spark.range(10_000).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 7), "
            "d -> cast(pmod(hash(id, d), 1001) as double) / 500.0 - 1.0)"
        ).alias("embedding"),
    )
    kw = dict(k=3, num_planes=8, dim=8)
    shuffled = signlsh_topk(emb, emb, broadcast_queries=False, **kw)
    assert not uses_broadcast_join(shuffled), "large-|Q| path must not broadcast"
    broadcasted = signlsh_topk(emb, emb, broadcast_queries=True, **kw)
    assert uses_broadcast_join(broadcasted)
    got_s = {tuple(r) for r in shuffled.collect()}
    got_b = {tuple(r) for r in broadcasted.collect()}
    assert got_s == got_b and len(got_s) == 30_000


def test_approx_stats_within_tolerance_of_exact(spark):
    """Sketch forms (approx_percentile, HyperLogLog++) stay within the
    documented tolerances of the exact forms on a skewed synthetic
    (zipf-ish group sizes, heavy-tailed values) — the single-engine half
    of the approx_stats contract."""
    from hypergraph_gpu_label_propagation_spark.functions.stats import (
        approx_distinct,
        approx_quantiles,
        stats_with_tolerance,
    )

    df = spark.range(60_000).select(
        (F.col("id") % 3).alias("g"),
        # heavy tail: value = id mod a per-group-different modulus, cubed
        F.pow(F.pmod(F.hash("id"), F.lit(97)).cast("double"), 3.0).alias("v"),
        F.pmod(F.hash("id", F.lit(1)), (F.col("id") % 3 + 1) * 500).alias("k"),
    )
    out = stats_with_tolerance(
        df, ["g"], "v", "k", probs=(0.5, 0.9), abs_tol=5000.0, rel_tol=0.15
    ).collect()
    assert len(out) == 3
    for r in out:
        assert r["p50_ok"] == 1 and r["p90_ok"] == 1 and r["distinct_ok"] == 1, dict(r.asDict())

    # standalone sketch helpers return per-group rows with named columns
    aq = approx_quantiles(df, ["g"], "v", (0.5, 0.9)).collect()
    assert {r["g"] for r in aq} == {0, 1, 2} and "q50" in aq[0].asDict()
    ad = {r["g"]: r["approx_distinct"] for r in approx_distinct(df, ["g"], "k").collect()}
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.count_distinct("k").alias("n")).collect()
    }
    for g, n in exact.items():
        assert abs(ad[g] - n) <= 0.15 * n, (g, ad[g], n)


def test_decontaminate_flags_overlap(spark):
    from hypergraph_gpu_label_propagation_spark.operators.decontam import decontaminate

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps"),        # contains bench shingle
            (1, "totally different words here now"),  # clean
            (2, "short"),                             # < n tokens -> clean
            (3, "quick brown fox of doom"),           # shares 'quick brown fox'
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "we saw the quick brown fox yesterday")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in decontaminate(docs, bench, "doc_id", "text").collect()}
    assert rows[0]["contaminated"] == 1 and rows[0]["n_hit_shingles"] >= 2
    assert rows[1]["contaminated"] == 0 and rows[1]["n_hit_shingles"] == 0
    assert rows[2]["contaminated"] == 0
    assert rows[3]["contaminated"] == 1
    # non-broadcast path: identical answer
    rows2 = {
        r["doc_id"]: tuple(r)
        for r in decontaminate(
            docs, bench, "doc_id", "text", broadcast_benchmark=False
        ).collect()
    }
    assert rows2 == {k: tuple(v) for k, v in rows.items()}


def test_repetition_features(spark):
    from hypergraph_gpu_label_propagation_spark.functions.text import repetition_features

    docs = spark.createDataFrame(
        [
            (0, "a b c a b c a b c"),  # 7 3-grams, 3 distinct
            (1, "all words unique in this doc"),
            (2, "x y"),  # too short
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_features(docs, "doc_id", "text").collect()}
    assert (rows[0]["n_ngrams"], rows[0]["n_distinct_ngrams"]) == (7, 3)
    assert abs(rows[0]["dup_ngram_ratio"] - round(1 - 3 / 7, 6)) < 1e-9
    assert rows[1]["dup_ngram_ratio"] == 0.0
    assert (rows[2]["n_ngrams"], rows[2]["dup_ngram_ratio"]) == (0, 0.0)


def test_stratified_sample_rates_and_determinism(spark):
    from hypergraph_gpu_label_propagation_spark.functions.sampling import (
        stratified_sample,
    )

    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("rare")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )
    out = stratified_sample(df, "doc_id", "lang", {"en": 0.5, "de": 1.0}, seed=3)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts.get("de") == 1333          # rate 1.0 keeps every row
    assert "rare" not in counts              # default_rate 0 drops unlisted
    assert 560 <= counts.get("en", 0) <= 770  # ~50% of 1334
    # deterministic: same ids selected on re-run
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(df, "doc_id", "lang", {"en": 0.5, "de": 1.0}, seed=3).collect()
    )
    assert a == b
    with pytest.raises(ValueError):
        stratified_sample(df, "doc_id", "lang", {"en": 1.5})


def test_pipeline_op_properties(spark):
    """Property-style invariants of the round-4 pipeline operators over
    a generated corpus (one Spark pass per property; hypothesis-free so
    runtime stays bounded — the properties themselves are the point):

    - repetition: 0 <= dup_ratio < 1, distinct <= total, short docs 0;
    - stratified_sample: monotone in rate (rate r1 <= r2 -> selected(r1)
      is a subset of selected(r2) per stratum, same seed);
    - decontaminate: growing the benchmark never decreases any doc's
      hit count.
    """
    from hypergraph_gpu_label_propagation_spark.functions.sampling import (
        stratified_sample,
    )
    from hypergraph_gpu_label_propagation_spark.functions.text import (
        repetition_features,
    )
    from hypergraph_gpu_label_propagation_spark.operators.decontam import decontaminate

    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.element_at(
                    F.array(*[F.lit(w) for w in words]),
                    ((F.col("id") * (i + 3) + i * i) % 6 + 1).cast("int"),
                )
                for i in range(12)
            ],
        ).alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("es")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    ).localCheckpoint()

    rep = repetition_features(docs, "doc_id", "text")
    bad = rep.filter(
        (F.col("dup_ngram_ratio") < 0)
        | (F.col("dup_ngram_ratio") >= 1)
        | (F.col("n_distinct_ngrams") > F.col("n_ngrams"))
    )
    assert bad.count() == 0

    lo = stratified_sample(docs, "doc_id", "lang", {"en": 0.3, "de": 0.6}, seed=2)
    hi = stratified_sample(docs, "doc_id", "lang", {"en": 0.7, "de": 0.9}, seed=2)
    assert lo.join(hi, "doc_id", "left_anti").count() == 0  # lo ⊆ hi

    small_bench = docs.filter(F.col("doc_id") % 50 == 0)
    big_bench = docs.filter(F.col("doc_id") % 10 == 0)  # superset
    h_small = decontaminate(docs, small_bench, "doc_id", "text")
    h_big = decontaminate(docs, big_bench, "doc_id", "text")
    joined = h_small.alias("a").join(
        h_big.alias("b"), F.col("a.doc_id") == F.col("b.doc_id")
    )
    assert joined.filter(
        F.col("a.n_hit_shingles") > F.col("b.n_hit_shingles")
    ).count() == 0


def test_wav_decode_validates_fmt_chunk():
    """ADVICE r04: malformed WAV headers raise the INTENDED errors —
    channels=0 is a ValueError (not an incidental ZeroDivisionError),
    and a data chunk with no fmt chunk is a ValueError naming the
    missing chunk."""
    import struct

    import pytest

    from hypergraph_gpu_label_propagation_spark.operators.multimodal import (
        _decode_wav,
        make_wav,
    )

    good = make_wav(100, 8000, seed=1)
    # corrupt channels to 0 (fmt body: tag u16 @+0, channels u16 @+2;
    # fmt chunk body starts at byte 20 of the file)
    bad_ch = bytearray(good)
    struct.pack_into("<H", bad_ch, 22, 0)
    with pytest.raises(ValueError, match="channels"):
        _decode_wav(bytes(bad_ch))
    # data chunk but no fmt chunk
    samples = good[44:]
    no_fmt = (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(samples), b"WAVE")
        + struct.pack("<4sI", b"data", len(samples)) + samples
    )
    with pytest.raises(ValueError, match="fmt"):
        _decode_wav(no_fmt)


def test_png_decode_byte_exact_all_filters():
    """REAL PNG decode (r04 verdict #6): make_png cycles all five
    scanline filter types; the decoder must reconstruct the source
    pixel array BYTE-EXACTLY for gray, RGB, and RGBA, and reject
    unsupported depths/interlace with the intended errors."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from hypergraph_gpu_label_propagation_spark.operators.multimodal import (
        PNG_MAGIC,
        _decode_png,
        make_png,
    )

    for ct, nch in ((0, 1), (2, 3), (6, 4)):
        w, h = 13, 11  # >= 5 rows -> every filter type used; odd width
        data = make_png(w, h, seed=7 + ct, color_type=ct)
        gw, gh, px = _decode_png(data)
        assert (gw, gh) == (w, h) and px.shape == (h, w, 3)
        src = (
            np.random.default_rng(7 + ct)
            .integers(0, 256, size=(h, w * nch), dtype=np.uint8)
            .reshape(h, w, nch)
        )
        if ct == 0:
            expected = np.repeat(src, 3, axis=2)
        elif ct == 2:
            expected = src
        else:
            expected = src[:, :, :3]
        assert np.array_equal(px, expected), f"color_type={ct}"

    with pytest.raises(ValueError, match="not a PNG"):
        _decode_png(b"junkjunkjunk")
    # 16-bit depth -> NotImplementedError (codec plug point), built by
    # patching the IHDR depth byte and re-checksumming
    good = bytearray(make_png(8, 8, seed=1))
    ihdr_body = bytearray(good[16:29])
    ihdr_body[8] = 16  # depth byte (IHDR body offset 8)
    good[16:29] = ihdr_body
    good[29:33] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + bytes(ihdr_body)) & 0xFFFFFFFF
    )
    with pytest.raises(NotImplementedError, match="8-bit"):
        _decode_png(bytes(good))


def test_real_decode_assets_include_png(spark):
    """synth_real_assets now emits PNG payloads for every other image;
    the REAL mapInPandas decode must report their true dimensions."""
    from hypergraph_gpu_label_propagation_spark.operators.multimodal import (
        PNG_MAGIC,
        synth_real_assets,
    )

    assets = synth_real_assets(spark, n=24)
    raw = {r["asset_id"]: bytes(r["data"]) for r in assets.collect()}
    png_ids = {a for a, d in raw.items() if d[:8] == PNG_MAGIC}
    assert len(png_ids) >= 6  # half the images are PNGs
    dec = decode_assets(assets, backend=DecodeBackend.REAL)
    meta = {r["asset_id"]: r["meta"] for r in assets.select("asset_id", "meta").collect()}
    for r in dec.collect():
        if r["asset_id"] in png_ids:
            m = meta[r["asset_id"]]
            assert (r["width"], r["height"]) == (int(m["w"]), int(m["h"]))
    feats = extract_features(
        assets.filter("kind != 'video'"), backend=DecodeBackend.REAL
    ).collect()
    assert all(abs(sum(r["feature"]) - 1.0) < 1e-5 for r in feats)


def test_png_large_byte_exact_and_new_cap():
    """r07 (verdict #3): the Average/Paeth cap moved 1 MP -> 4 MP after
    the bytearray-scan rewrite (6.1x the numpy-scalar loop; the
    'vectorize on the channel axis' shape was MEASURED SLOWER, 0.7x —
    see multimodal.py census comment).  1200x1200 RGB (1.44 MP, above
    the old cap, cycling all five filter types) must reconstruct
    byte-exactly; above the new 4 MP cap still refuses."""
    import numpy as np
    import pytest

    from hypergraph_gpu_label_propagation_spark.operators.multimodal import (
        _PNG_MAX_PIXELS,
        _decode_png,
        make_png,
    )

    w = h = 1200
    data = make_png(w, h, seed=23, color_type=2)
    gw, gh, px = _decode_png(data)
    assert (gw, gh) == (w, h)
    src = (
        np.random.default_rng(23)
        .integers(0, 256, size=(h, w * 3), dtype=np.uint8)
        .reshape(h, w, 3)
    )
    assert np.array_equal(px, src)

    big = make_png(2100, 2100, seed=1, color_type=2)  # 4.41 MP > cap
    assert 2100 * 2100 > _PNG_MAX_PIXELS
    with pytest.raises(NotImplementedError, match="external codec"):
        _decode_png(big)


def test_dedup_clusters_transitive_and_singletons(spark, docs):
    """r07: fuzzy-dedup clustering — near-duplication is transitive in
    intent (A~B, B~C => one family even if A~C misses the threshold);
    clusters are CC over the verified pair graph, keeper = min id,
    untouched docs are singleton keepers.  On the fixture: 0~1 (exact)
    and 0~2 / 1~2 (near) form one {0,1,2} cluster kept by 0; 3/4/5 are
    singletons.  Also: passing a precomputed pairs frame must give the
    identical result (the board query's shared-computation path)."""
    from hypergraph_gpu_label_propagation_spark.operators.dedup import (
        dedup_clusters,
        near_dup_pairs,
    )

    out = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in dedup_clusters(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert out == {
        0: (0, True), 1: (0, False), 2: (0, False),
        3: (3, True), 4: (4, True), 5: (5, True),
    }
    pre = near_dup_pairs(docs, "doc_id", "text", threshold=0.5)
    out2 = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in dedup_clusters(docs, "doc_id", "text", pairs=pre).collect()
    }
    assert out2 == out


def test_shard_assignment_and_export_roundtrip(spark, tmp_path):
    """r07: deterministic training-shard export.  shard and within-
    shard order are pure functions of (id, seed) — verified choice-by-
    choice against a python md5 replica (repo convention); the export
    lays out shard=<k> dirs with a LAST-written manifest and the
    reader refuses a layout without one (both-or-neither)."""
    import hashlib
    import os

    import pytest

    from hypergraph_gpu_label_propagation_spark.functions.sampling import (
        export_shards,
        read_shards,
        shard_assignment,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    out = shard_assignment(df, "doc_id", num_shards=4, seed=9).collect()

    def bucket(i):
        return int(hashlib.md5(f"{i}:9".encode()).hexdigest()[:15], 16) % 1_000_000

    def rank_h(i):
        return hashlib.md5(f"{i}:r:9".encode()).hexdigest()

    expect_shard = {i: bucket(i) % 4 for i in range(200)}
    assert {r["doc_id"]: r["shard"] for r in out} == expect_shard
    for k in range(4):
        ids = sorted(
            (i for i in range(200) if expect_shard[i] == k),
            key=lambda i: (rank_h(i), i),
        )
        got = sorted(
            ((r["shard_rank"], r["doc_id"]) for r in out if r["shard"] == k)
        )
        assert [d for _, d in got] == ids          # exact seeded order
        assert [r for r, _ in got] == list(range(1, len(ids) + 1))  # dense

    path = str(tmp_path / "shards")
    manifest = export_shards(df, path, "doc_id", num_shards=4, seed=9)
    assert manifest["total_rows"] == 200
    assert sum(manifest["rows_per_shard"].values()) == 200
    assert os.path.exists(os.path.join(path, "_manifest.json"))
    back = read_shards(spark, path)
    assert back.count() == 200
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == set(range(200))

    os.remove(os.path.join(path, "_manifest.json"))
    with pytest.raises(ValueError, match="manifest"):
        read_shards(spark, path)


def test_unigram_logprob_ranks_gibberish_below_common(spark):
    """r07: unigram LM-filter signal.  Exact contract vs a python
    replica of the same add-k unigram model (to 1e-9 — log2/avg FP
    only), plus the semantic point: a document of corpus-common tokens
    scores strictly above rare-token gibberish, and empty docs are
    unscored (NULL, 0 tokens)."""
    import math

    from hypergraph_gpu_label_propagation_spark.functions.text import (
        unigram_logprob,
    )

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the cat"),
        (2, "zyx qwv jkl pqr"),          # rare-token gibberish
        (3, ""),                          # nothing to score
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in unigram_logprob(df, "doc_id", "text").collect()}

    # python replica (k = 0.5)
    toks = {i: [t for t in s.split(" ") if t] for i, s in rows}
    from collections import Counter

    cnt = Counter(t for ts in toks.values() for t in ts)
    n, v = sum(cnt.values()), len(cnt)
    lp = {t: math.log2((c + 0.5) / (n + 0.5 * v)) for t, c in cnt.items()}
    for i in (0, 1, 2):
        expect = round(sum(lp[t] for t in toks[i]) / len(toks[i]), 6)
        assert abs(got[i]["lm_logprob"] - expect) < 1e-9, (i, got[i], expect)
        assert got[i]["n_scored_tokens"] == len(toks[i])
    assert got[3]["lm_logprob"] is None and got[3]["n_scored_tokens"] == 0
    assert got[0]["lm_logprob"] > got[2]["lm_logprob"]
    assert got[1]["lm_logprob"] > got[2]["lm_logprob"]


def test_export_shards_empty_corpus(spark, tmp_path):
    """r07 second review: an empty corpus must still commit a valid
    zero-count manifest (the read-back count uses an explicit schema —
    inference has no part files to work with), and the reader names
    the emptiness instead of failing schema inference."""
    import pytest

    from hypergraph_gpu_label_propagation_spark.functions.sampling import (
        export_shards,
        read_shards,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    path = str(tmp_path / "empty_shards")
    m = export_shards(empty, path, "doc_id", num_shards=4)
    assert m["total_rows"] == 0
    assert m["rows_per_shard"] == {str(k): 0 for k in range(4)}
    with pytest.raises(ValueError, match="EMPTY"):
        read_shards(spark, path)


def test_new_r07_ops_plan_shapes(spark):
    """r07 plan pins for the new pipeline ops' scale properties:
    shard_assignment's rank window partitions by shard (an
    unpartitioned Window would plan a SinglePartition exchange);
    unigram_logprob's two joins are broadcasts with no cartesian
    fallback (the corpus-sized token stream is never shuffled on the
    join key by the vocabulary side)."""
    from hypergraph_gpu_label_propagation_spark.functions.sampling import (
        shard_assignment,
    )
    from hypergraph_gpu_label_propagation_spark.functions.text import (
        unigram_logprob,
    )

    df = spark.createDataFrame(
        [(i, f"tok{i % 7} common words here") for i in range(64)],
        "doc_id long, text string",
    )
    shard_plan = (
        shard_assignment(df, "doc_id", num_shards=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in shard_plan

    lm_plan = (
        unigram_logprob(df, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in lm_plan
    # exactly ONE BroadcastNestedLoopJoin: the documented one-row
    # totals crossJoin (the repo's scalar-frame pattern) — any second
    # one would be an accidental cartesian on real data
    assert lm_plan.count("BroadcastNestedLoopJoin") == 1
    assert "BroadcastHashJoin" in lm_plan  # the vocab score join
