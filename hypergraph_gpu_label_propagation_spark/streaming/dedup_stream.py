"""Streaming near-dup detection against a durable corpus band index.

The 100 TB deployment shape for dedup is INCREMENTAL: the corpus is a
standing asset and new documents arrive continuously (a fresh crawl, a
new dump).  Re-running pairwise dedup over the whole corpus per
delivery is quadratic waste — the production pattern is:

- maintain a durable MinHash BAND INDEX of everything accepted so far:
  ``(band, bucket, doc_id, sig)`` rows, the same banded-LSH layout
  ``minhash_lsh_candidates`` builds transiently (dedup.py:167), but
  persisted once and appended per delivery — write-once like the
  bucketed LP layouts and the IVF inverted file;
- per micro-batch: band the NEW docs, equi-join their buckets against
  the index (candidates come from bucket collisions — no corpus scan,
  no all-pairs), verify candidates by SIGNATURE AGREEMENT, emit
  verified duplicate links, then append the new docs' bands to the
  index so later deliveries (and later docs in the SAME batch) dedup
  against them.

Verification semantics: the index stores the ``num_hashes``-component
MinHash signature, not the text, so the verifier is the standard
unbiased Jaccard ESTIMATOR est_j = matching-components / num_hashes
(Broder 1997) — at index scale the text is not available for an exact
shingle join without a corpus lookup, and the estimator's resolution
(1/num_hashes) is the documented contract (``est_jaccard`` column).
The batch path (near_dup_pairs) keeps exact verification; the pytest
pins stream == the arrival-ordered batch twin under the SAME estimator.

Crash safety / replay idempotence: each batch's index append goes to
its own ``delivery=<batch_id>`` subdirectory via the two-rename
``atomic_swap_write`` protocol — a foreachBatch replay after a crash
re-swaps identical content instead of double-appending (the parquet
``mode("append")`` alternative would duplicate rows on replay).

No reference counterpart (the reference is batch-only); composes the
engine's dedup primitives with Structured Streaming.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hypergraph_gpu_label_propagation_spark.operators.dedup import (
    minhash_signatures,
)
from hypergraph_gpu_label_propagation_spark.streaming.events import (
    atomic_swap_write,
)

DOC_STREAM_SCHEMA = "doc_id long, text string"


def banded_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """(doc_id, band, bucket, sig): one row per (doc, band), carrying
    the full signature for join-time verification.  Same band/bucket
    derivation as ``minhash_lsh_candidates`` (md5 over the band's
    signature components) so an index built here collides with the
    batch path's buckets."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    sig = sig.select(
        F.col(id_col).alias("doc_id"),
        F.array(*[F.col(f"mh{i}") for i in range(num_hashes)]).alias("sig"),
        *[
            F.md5(
                F.concat_ws(
                    ",", *[F.col(f"mh{j * r + t}").cast("string") for t in range(r)]
                )
            ).alias(f"_b{j}")
            for j in range(bands)
        ],
    )
    banded = None
    for j in range(bands):
        row = sig.select(
            "doc_id", F.lit(j).alias("band"), F.col(f"_b{j}").alias("bucket"), "sig"
        )
        banded = row if banded is None else banded.unionByName(row)
    return banded


def est_jaccard(sig_a, sig_b, num_hashes: int):
    """Column: fraction of agreeing MinHash components — the unbiased
    Jaccard estimator, resolution 1/num_hashes."""
    return F.round(
        F.aggregate(
            F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, m: acc + m,
        )
        / F.lit(float(num_hashes)),
        6,
    )


_DELIVERY_RE = re.compile(r"^delivery=(\d+)$")


def delivery_ids(root: str) -> list[int]:
    """Sorted ids of deliveries present under ``root`` — committed
    bases plus crash-between-renames ``.old`` snapshots (which ARE the
    committed data, just mid-rename); in-flight ``.tmp`` dirs are NOT
    deliveries and are never counted."""
    if not os.path.isdir(root):
        return []
    names = set(os.listdir(root))
    ids = set()
    for name in names:
        base = name[:-4] if name.endswith(".old") else name
        m = _DELIVERY_RE.match(base)
        if m:
            ids.add(int(m.group(1)))
    return sorted(ids)


def check_checkpoint_not_reset(root: str, batch_id: int) -> None:
    """Refuse a batch id BEHIND existing deliveries: a reset/rewound
    stream checkpoint over persisting state dirs would silently hide
    the standing state behind the replay guard AND overwrite its
    delivery dirs.  A genuine replay re-runs the LAST batch, so only
    ids <= batch_id can legitimately exist.  Shared by every
    delivery-dir stream writer (r07 reviews)."""
    ahead = [d for d in delivery_ids(root) if d > batch_id]
    if ahead:
        raise ValueError(
            f"stream checkpoint is behind the delivery state (batch "
            f"{batch_id} but deliveries {ahead} exist under {root}) — "
            "the checkpoint was reset while state persists; restore "
            "the checkpoint or clear the state dir"
        )


def read_deliveries(
    spark: SparkSession, root: str, before_id: int | None = None
) -> DataFrame | None:
    """Union of all committed ``delivery=<id>`` subdirs under ``root``
    (the band index, IVF postings, or the emitted links); None when
    empty.  One multi-path ``spark.read.parquet`` — a per-delivery
    read + O(n) union tree would re-plan n scans on every micro-batch
    of a long-lived stream (r07 second review).

    Crash-shape handling (r07 reviews):
    - ``delivery=<id>.old`` with NO base = a crash between the swap's
      two renames; the ``.old`` IS the committed snapshot and is
      restored by rename.  (Only the reader or the crashed writer's
      retry can observe this state — no live writer swaps the same
      delivery concurrently.)
    - ``delivery=<id>.tmp`` = an IN-FLIGHT or crashed write; never
      read, never counted, and — unlike a blanket ``recover_swap`` —
      NEVER deleted here: a nominally read-only probe must not rmtree
      a concurrent appender's tmp mid-write (the writer's own next
      ``atomic_swap_write`` cleans its stale tmp).
    - a base WITHOUT ``_SUCCESS`` is foreign/corrupt state → refused,
      mirroring lp_stream's state-reader contract.

    ``before_id`` (exclusive) restricts to earlier deliveries — the
    foreachBatch REPLAY guard: a replayed batch must not read its own
    already-committed output (it would self-collide and emit reversed
    pairs)."""
    if not os.path.isdir(root):
        return None
    names = set(os.listdir(root))
    bases: dict[int, str] = {}
    for name in names:
        m = _DELIVERY_RE.match(name)
        if m:
            bases[int(m.group(1))] = name
    for name in names:
        if not name.endswith(".old"):
            continue
        base = name[:-4]
        m = _DELIVERY_RE.match(base)
        if m and base not in names:
            try:
                os.rename(os.path.join(root, name), os.path.join(root, base))
            except FileNotFoundError:
                # a concurrent reader healed the same .old first — the
                # base now exists (or will, via its rename); a lost
                # race is already-healed, not an error (r07 ADVICE)
                pass
            bases[int(m.group(1))] = base
    paths = []
    for did in sorted(bases):
        if before_id is not None and did >= before_id:
            continue
        sub = os.path.join(root, bases[did])
        if not os.path.exists(os.path.join(sub, "_SUCCESS")):
            raise ValueError(
                f"band-index delivery {sub} has no _SUCCESS marker — "
                "foreign or corrupt state; refusing a partial index"
            )
        paths.append(sub)
    if not paths:
        return None
    return spark.read.parquet(*paths)


@dataclass
class StreamDedupResult:
    links: DataFrame          # (new_id, dup_of, est_jaccard)
    num_batches: int
    links_per_batch: list[int] = field(default_factory=list)


def run_stream_dedup(
    spark: SparkSession,
    stream_path: str,
    state_dir: str,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
) -> StreamDedupResult:
    """Consume ``stream_path`` (a directory parquet document files
    arrive in) with availableNow semantics.  Per batch: candidates from
    the band index + within-batch self-collisions, signature-estimator
    verification at ``threshold``, links appended under
    ``state_dir/links/delivery=<id>``, new bands committed under
    ``state_dir/index/delivery=<id>`` — both via the two-rename swap,
    so a replayed batch overwrites itself (idempotent).

    Link orientation: ``dup_of`` is the EARLIER document (index hit, or
    lower doc_id within a batch); each (new, earlier) pair is emitted
    exactly once, in the batch where ``new`` arrived.
    """
    os.makedirs(state_dir, exist_ok=True)
    index_dir = os.path.join(state_dir, "index")
    links_dir = os.path.join(state_dir, "links")
    os.makedirs(index_dir, exist_ok=True)
    os.makedirs(links_dir, exist_ok=True)
    counts: list[int] = []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        check_checkpoint_not_reset(index_dir, batch_id)
        new_bands = banded_signatures(
            batch_df, "doc_id", "text", n, num_hashes, bands
        ).localCheckpoint(eager=True)  # referenced 3x below — one compute
        # before_id: a REPLAYED batch must not read its own committed
        # delivery (self-collisions + reversed pairs; r07 review)
        idx = read_deliveries(spark, index_dir, before_id=batch_id)

        nb = new_bands.select(
            F.col("doc_id").alias("new_id"),
            "band",
            "bucket",
            F.col("sig").alias("new_sig"),
        )
        cands = None
        if idx is not None:
            hit = idx.select(
                F.col("doc_id").alias("dup_of"),
                "band",
                "bucket",
                F.col("sig").alias("old_sig"),
            )
            cands = nb.join(hit, ["band", "bucket"]).select(
                "new_id", "dup_of", "new_sig", "old_sig"
            )
        # within-batch: later doc (higher id) links to the earlier one
        ob = new_bands.select(
            F.col("doc_id").alias("dup_of"),
            "band",
            "bucket",
            F.col("sig").alias("old_sig"),
        )
        intra = (
            nb.join(ob, ["band", "bucket"])
            .filter(F.col("new_id") > F.col("dup_of"))
            .select("new_id", "dup_of", "new_sig", "old_sig")
        )
        cands = intra if cands is None else cands.unionByName(intra)
        links = (
            cands.distinct()
            .withColumn(
                "est_jaccard", est_jaccard(F.col("new_sig"), F.col("old_sig"), num_hashes)
            )
            .filter(F.col("est_jaccard") >= threshold)
            .select("new_id", "dup_of", "est_jaccard")
        )
        atomic_swap_write(links, os.path.join(links_dir, f"delivery={batch_id}"))
        atomic_swap_write(
            new_bands.select("doc_id", "band", "bucket", "sig"),
            os.path.join(index_dir, f"delivery={batch_id}"),
        )
        counts.append(
            spark.read.parquet(os.path.join(links_dir, f"delivery={batch_id}")).count()
        )

    q = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .parquet(stream_path)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(state_dir, "_stream_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    links = read_deliveries(spark, links_dir)
    if links is None:
        links = spark.createDataFrame(
            [], "new_id long, dup_of long, est_jaccard double"
        )
    return StreamDedupResult(
        links=links, num_batches=len(counts), links_per_batch=counts
    )
