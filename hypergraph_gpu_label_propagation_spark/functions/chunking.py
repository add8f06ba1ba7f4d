"""Document chunking for LLM training / retrieval prep.

Splits long documents into fixed-size token-window chunks with overlap
— the standard pre-tokenization shaping step (context-window packing,
RAG indexing).  Spark-first: ONE projection per document using
``split`` + a ``sequence`` of window starts + ``slice``/``array_join``
inside a ``transform`` — no UDF, no explode-then-window regroup (an
explode to one-row-per-token would shuffle tokens_per_doc x docs rows
only to reassemble them; the array form keeps each document's tokens
in its own row until the final one-row-per-chunk posexplode).

Scale notes: output is (doc_id, chunk_idx, n_tokens, chunk) with
chunking arithmetic fully JVM-side; the only data growth is the
overlap factor (size/stride).  Degenerate inputs: empty/whitespace
docs produce zero chunks (not one empty chunk); stride must be >= 1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """(id, chunk_idx, n_tokens, chunk): whitespace-token windows of
    ``size`` tokens every ``size - overlap`` tokens.  The final window
    is the tail (may be shorter than ``size``); a window fully contained
    in the previous one never materializes (the last start is the FIRST
    one whose window reaches the end of the document), so a document of
    ``size`` tokens or fewer yields exactly one chunk.  Tokenization is
    whitespace — a configurable pattern was removed (r06 review): the
    strip/empty-doc guards are whitespace-specific, so a different
    pattern silently produced empty boundary tokens."""
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if not 0 <= overlap < size:
        raise ValueError(f"overlap must be in [0, size), got {overlap}")
    stride = size - overlap

    # split once into an array column; reuse it via a named projection
    # (inlining the split in every lambda re-evaluates it per element —
    # the 45x round-2 gotcha).  Strip ALL leading/trailing whitespace
    # first — trim() is space-only, and a leading newline would
    # otherwise produce an empty first token
    stripped = F.regexp_replace(F.col(text_col), r"^\s+|\s+$", "")
    base = df.select(
        F.col(id_col),
        F.when(stripped == "", F.array().cast("array<string>"))
        .otherwise(F.split(stripped, r"\s+"))
        .alias("_toks"),
    )
    n = F.size("_toks")
    # window starts: 0, stride, ..., last, where last is the first start
    # whose window reaches the document end — ceil(max(0, n-size)/stride)
    # strides (running starts to n-1 emitted tail windows fully contained
    # in their predecessor: a pure duplicate suffix; r06 review)
    extra = F.greatest(F.lit(0), n - size)
    last = (F.floor((extra + (stride - 1)) / stride) * stride).cast("int")
    starts = F.when(n <= 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), last, F.lit(stride))
    )
    chunks = F.transform(
        starts,
        # slice() is 1-indexed; clamp length at the tail automatically
        lambda s: F.struct(
            F.least(F.lit(size), n - s).alias("n_tokens"),
            F.array_join(F.slice("_toks", s + 1, size), " ").alias("chunk"),
        ),
    )
    return base.select(
        id_col, F.posexplode(chunks).alias("chunk_idx", "_c")
    ).select(
        id_col,
        "chunk_idx",
        F.col("_c.n_tokens").alias("n_tokens"),
        F.col("_c.chunk").alias("chunk"),
    )


def pack_chunks(
    chunks: DataFrame,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    budget: int = 2048,
    num_shards: int = 256,
) -> DataFrame:
    """Pack chunks into training-sequence bins of <= ``budget`` tokens:
    adds (shard, bin_id) where bins fill in deterministic (doc_id,
    chunk_idx) order WITHIN a doc-hash shard.

    Scale shape: a single global packing order would be a
    SinglePartition window (the repo-banned barrier) and is also
    pointless for training — batches need deterministic, well-filled
    bins, not one global sequence.  So docs are hash-sharded
    (xxhash64 % num_shards, all chunks of a doc stay together) and the
    prefix-sum window partitions by shard: num_shards independent
    scans, each shuffle-partition-sized.  bin_id = floor(prefix_before
    / budget) is the standard prefix-division packing: a bin may
    overfill by less than one chunk at its boundary (chunks are
    budget-capped in the sum), the accepted training-packing tradeoff
    vs a sequential first-fit pass."""
    from pyspark.sql import Window

    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if num_shards < 1:
        # pmod(x, 0) is NULL -> every row lands in ONE null shard and
        # the window degrades to the global barrier this function exists
        # to avoid (r06 review)
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_shards)).alias("shard")
    sharded = chunks.select("*", shard)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col, "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = F.least(F.col(n_tokens_col), F.lit(budget))
    prefix = F.sum(tok).over(w) - tok
    return sharded.withColumn("bin_id", (prefix / F.lit(budget)).cast("long"))
