"""Benchmark decontamination for training corpora.

The standard leakage guard in LLM data pipelines (cf. GPT-3 appendix /
Gopher §A.4): a training document is *contaminated* if it shares any
n-token shingle with an evaluation/benchmark document, and must be
dropped (or flagged) before training.  Relational form:

    train shingles  ⋈  benchmark shingles  →  per-doc hit count

Scale shape: the benchmark side is tiny relative to the corpus (eval
sets are thousands of docs vs billions), so its distinct shingle set is
broadcast and the corpus side streams through a map-side hash join —
no shuffle of the 100 TB side at all.  Set ``broadcast_benchmark=False``
for oversized benchmark sets (falls back to a shuffle equi-join on the
shingle key, still never a cross product).

No reference counterpart (the reference is a graph engine); this is
part of the prompt-mandated training-data pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hypergraph_gpu_label_propagation_spark.operators.dedup import doc_shingles


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(id, n_hit_shingles, contaminated) for every row of ``docs``.

    ``n_hit_shingles`` counts the doc's DISTINCT n-gram shingles that
    appear anywhere in the benchmark; ``contaminated`` = 1 iff > 0.
    Docs shorter than ``n`` tokens have no shingles and are clean.
    """
    doc_sh = doc_shingles(docs, id_col, text_col, n)
    bench_sh = doc_shingles(benchmark, id_col, text_col, n).select("shingle").distinct()
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    hits = (
        doc_sh.join(bench_sh, "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_shingles"))
    )
    return docs.select(id_col).join(hits, id_col, "left").select(
        id_col,
        F.coalesce("n_hit_shingles", F.lit(0)).cast("long").alias("n_hit_shingles"),
        (F.coalesce("n_hit_shingles", F.lit(0)) > 0).cast("int").alias("contaminated"),
    )
