"""Training-data text prep: PII scrubbing, whitespace normalization,
document chunking + sequence packing — exact expectations against
pure-Python replicas, plus plan-shape guards (no UDF, no
SinglePartition window)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hypergraph_gpu_label_propagation_spark.functions.chunking import (
    chunk_documents,
    pack_chunks,
)
from hypergraph_gpu_label_propagation_spark.functions.text import (
    normalize_ws,
    scrub_pii,
)


def test_scrub_pii_shapes(spark):
    rows = [
        (0, "mail me at jane.doe+x@corp.example.com or call 415-555-2671"),
        (1, "server 10.0.255.7 logged ssn 123-45-6789 and card 4111 1111 1111 1111"),
        (2, "versions 1.2.3 and 10.20 stay; room 101 stays; +1 650.555.0199 goes"),
        (3, "plain prose with the number 42 and year 2024 untouched"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", scrub_pii("text").alias("s")).collect()
    }
    assert got[0] == "mail me at <EMAIL> or call <PHONE>"
    assert got[1] == "server <IP> logged ssn <SSN> and card <CARD>"
    # 1.2.3 is not a valid IPv4 shape (needs 4 octets); 10.20 neither.
    # r06 ADVICE: the '+' branch uses \B (space|'+' is not a word
    # boundary), so '+1 650.555.0199' scrubs as ONE token, no stray '+'
    assert got[2] == "versions 1.2.3 and 10.20 stay; room 101 stays; <PHONE> goes"
    assert got[3] == rows[3][1]
    # r06 review: an unanchored phone pattern scrubbed the TAIL of longer
    # digit runs (invoices, ISBNs) — the leading \b forbids mid-run starts
    df2 = spark.createDataFrame(
        [(0, "invoice 1234 567 8901 total"), (1, "ISBN 978-316-1484-100")],
        "doc_id long, text string",
    )
    got2 = {
        r["doc_id"]: r["s"]
        for r in df2.select("doc_id", scrub_pii("text").alias("s")).collect()
    }
    assert got2[0] == "invoice 1234 567 8901 total"
    # known limit: an ISBN's 3-3-4 PREFIX at a word boundary is
    # genuinely phone-shaped; excluding it needs lookahead, which RE2
    # (the DuckDB oracle engine) lacks — scrubbing it is the accepted
    # recall-over-precision side
    assert got2[1] == "ISBN <PHONE>-100"


def test_normalize_ws(spark):
    df = spark.createDataFrame(
        [(0, "  a\t\tb \n\n\n\n c\x00d\x07 \n e  ")], "doc_id long, text string"
    )
    got = df.select(normalize_ws("text").alias("t")).collect()[0]["t"]
    assert got == "a b\n\ncd\ne"  # control chars STRIP (c\x00d fuses)


def _py_chunks(text: str, size: int, overlap: int):
    toks = text.split()
    if not toks:
        return []
    stride = size - overlap
    # last start = first one whose window reaches the end (no tail
    # window fully contained in its predecessor)
    last = -(-max(0, len(toks) - size) // stride) * stride
    return [
        (i, min(size, len(toks) - s), " ".join(toks[s : s + size]))
        for i, s in enumerate(range(0, last + 1, stride))
    ]


@pytest.mark.parametrize("size,overlap", [(8, 0), (8, 3), (5, 4), (128, 32)])
def test_chunk_documents_matches_python_replica(spark, size, overlap):
    texts = [
        " ".join(f"w{i}" for i in range(n)) for n in (0, 1, 4, 8, 9, 37, 200)
    ] + ["   ", "\n\nlead newline doc\n", "\n \t "]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = sorted(
        map(tuple, chunk_documents(df, size=size, overlap=overlap).collect())
    )
    want = sorted(
        (i, ci, nt, ch)
        for i, t in enumerate(texts)
        for ci, nt, ch in _py_chunks(t, size, overlap)
    )
    assert got == want


def test_no_redundant_tail_chunks(spark):
    """r06 review: a 100-token doc at size=128/overlap=32 must yield ONE
    chunk (the old start sequence ran to n-1 and emitted a tail window
    fully contained in its predecessor — duplicated text that inflates
    downstream dedup/repetition statistics)."""
    df = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(100)))], "doc_id long, text string"
    )
    rows = chunk_documents(df, size=128, overlap=32).collect()
    assert len(rows) == 1 and rows[0]["n_tokens"] == 100
    # and at n just past the stride the tail chunk must ADD tokens
    df2 = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(130)))], "doc_id long, text string"
    )
    rows2 = sorted(map(tuple, chunk_documents(df2, size=128, overlap=32).collect()))
    assert [r[1:3] for r in rows2] == [(0, 128), (1, 34)]  # 96..129 in chunk 1


def test_chunk_documents_validates_params(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, size=4, overlap=4)
    with pytest.raises(ValueError, match="size"):
        chunk_documents(df, size=0)
    from hypergraph_gpu_label_propagation_spark.functions.chunking import pack_chunks

    with pytest.raises(ValueError, match="num_shards"):
        pack_chunks(df.limit(0), num_shards=0)


def test_chunking_plan_has_no_udf_or_python(spark):
    df = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    plan = (
        chunk_documents(df, size=2, overlap=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pack_chunks_budget_and_determinism(spark):
    texts = [(i, " ".join(f"t{j}" for j in range(50))) for i in range(40)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    chunks = chunk_documents(df, size=12, overlap=0)
    packed = pack_chunks(chunks, budget=30, num_shards=8)
    rows = packed.collect()
    # all of a doc's chunks share its shard
    shard_of = {}
    for r in rows:
        shard_of.setdefault(r["doc_id"], r["shard"])
        assert shard_of[r["doc_id"]] == r["shard"]
    # bins respect the budget up to the documented < one-chunk overfill
    from collections import defaultdict

    bins = defaultdict(int)
    for r in rows:
        bins[(r["shard"], r["bin_id"])] += min(r["n_tokens"], 30)
    assert all(v < 30 + 12 for v in bins.values())
    # deterministic across runs
    again = sorted(map(tuple, pack_chunks(chunks, budget=30, num_shards=8).collect()))
    assert sorted(map(tuple, rows)) == again
    # plan: the window partitions by shard, never a single global order
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_chunks_compose_with_near_dup_pipeline(spark):
    """End-to-end composition: chunk_documents output feeds the dedup
    family directly — duplicated documents are recalled as chunk-level
    exact near-dups (jaccard 1.0 on every aligned chunk pair), which is
    how a real corpus pipeline finds partial-overlap plagiarism that
    doc-level hashing misses."""
    from hypergraph_gpu_label_propagation_spark.operators.dedup import (
        near_dup_pairs,
    )

    body = " ".join(f"tok{i % 37}x{(7 * i) % 11}" for i in range(64))
    df = spark.createDataFrame(
        [(0, body), (1, body), (2, " ".join(f"other{i}" for i in range(64)))],
        "doc_id long, text string",
    )
    chunks = chunk_documents(df, size=24, overlap=4).select(
        # one flat id per chunk so the pair output is unambiguous
        (F.col("doc_id") * 100 + F.col("chunk_idx")).alias("doc_id"),
        F.col("chunk").alias("text"),
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in near_dup_pairs(chunks, "doc_id", "text", threshold=0.9).collect()
    }
    n_chunks = 3  # 64 tokens, size 24, stride 20 -> starts 0,20,40
    assert n_chunks == 1 + -(-(64 - 24) // 20)
    # every aligned chunk pair of the duplicated doc is recalled exactly
    for ci in range(n_chunks):
        assert pairs.get((0 * 100 + ci, 1 * 100 + ci)) == 1.0
    # nothing pairs with the unrelated doc
    assert not any(a >= 200 or b >= 200 for a, b in pairs)
