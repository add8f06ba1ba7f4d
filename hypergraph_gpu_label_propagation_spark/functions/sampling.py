"""Deterministic corpus sampling / splitting for training-data pipelines.

Both ops key on a 60-bit md5-derived uniform hash of the row's id (the
same cross-engine primitive the dedup family uses), NOT on rand(): the
assignment is a pure function of (id, seed), so it is reproducible
across runs, engines, partitionings, and retries — the property a
training pipeline actually needs from "random" sampling at 100 TB
(rand() changes under task retry; hashes don't).

DuckDB twin of the hash: ('0x' || substr(md5(...), 1, 15))::BIGINT.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_BUCKETS = 1_000_000


def _bucket_hash(id_col: Column, seed: int) -> Column:
    """Uniform integer bucket in [0, 1e6) from md5(id:seed) — 60-bit
    prefix, identical in any engine with md5.  Thresholds compare as
    INTEGERS (fraction * 1e6, rounded) so boundaries are exact: float
    cumulative sums like 0.1 + 0.8 land a hair off 0.9 and would flip
    rows whose hash sits exactly on the boundary."""
    h = F.conv(
        F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(f":{seed}"))), 1, 15),
        16,
        10,
    ).cast("long")
    return h % _HASH_BUCKETS


def _threshold(fraction: float) -> int:
    return int(round(fraction * _HASH_BUCKETS))


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen deterministically by id hash.
    Stable under re-runs, retries, and engine changes (unlike df.sample)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(_bucket_hash(F.col(id_col), seed) < F.lit(_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    seed: int = 42,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the language/source
    rebalancing step of a training-data pipeline (e.g. downsample
    over-represented English, keep all of a rare language).  Each
    stratum keeps ~``rates[stratum]`` of its rows by id hash; strata
    not listed keep ``default_rate``.  Same id+seed → same decision,
    on any engine/partitioning/retry."""
    for k, v in rates.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"rate for stratum {k!r} must be in [0, 1], got {v}")
    thr = None
    for name in sorted(rates):
        cond = F.col(stratum_col) == name
        t = F.lit(_threshold(rates[name]))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = (
        F.lit(_threshold(default_rate))
        if thr is None
        else thr.otherwise(F.lit(_threshold(default_rate)))
    )
    return df.filter(_bucket_hash(F.col(id_col), seed) < thr)


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Assign each row a split label ('train'/'val'/'test'/...) from
    cumulative ``weights`` (must sum to ~1) over the id hash — the
    standard leakage-free dataset split (same id always lands in the
    same split, regardless of when or where it is processed)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1 (got {total})")
    h = _bucket_hash(F.col(id_col), seed)
    expr = None
    acc = 0.0
    names = sorted(weights)  # deterministic boundary order
    for name in names[:-1]:
        acc += weights[name]
        cond = h < F.lit(_threshold(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out_col, expr)


def shard_assignment(
    df: DataFrame, id_col: str, num_shards: int, seed: int = 42
) -> DataFrame:
    """+ (shard, shard_rank): deterministic training-shard assignment
    and a seeded within-shard shuffle order.  shard = id-hash mod
    ``num_shards``; shard_rank = row's rank by an INDEPENDENT rank
    hash (salted ``:r`` so shard and order don't correlate), ties by
    id.  A pure function of (id, seed) — retry/engine/partitioning
    stable, like every sampler in this module; the window partitions
    by shard, never SinglePartition."""
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    from pyspark.sql import Window

    rank_h = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(f":r:{seed}"))
    )
    return (
        df.withColumn(
            "shard", (_bucket_hash(F.col(id_col), seed) % num_shards).cast("int")
        )
        .withColumn("_rh", rank_h)
        .withColumn(
            "shard_rank",
            F.row_number().over(
                Window.partitionBy("shard").orderBy(F.col("_rh"), F.col(id_col))
            ),
        )
        .drop("_rh")
    )


def export_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    num_shards: int,
    seed: int = 42,
) -> dict:
    """The training-data pipeline's LAST stage: write the corpus as
    ``num_shards`` parquet shards in a deterministic seeded-shuffle
    order, with a commit manifest.

    Layout: ``path/shard=<k>/`` one sorted parquet file per shard (the
    trainer streams shards sequentially; within-shard order is the
    seeded hash shuffle from :func:`shard_assignment`), plus
    ``path/_manifest.json`` — per-shard row counts, the config, and a
    total — written LAST, so a reader that requires the manifest gets
    both-or-neither semantics (the bucketed-layout / IVF-index commit
    protocol).  At 100 TB: one hash-partition exchange + a per-shard
    sort, no global order-by, no driver materialization beyond the
    num_shards-row count frame.  Returns the manifest dict."""
    import json
    import os

    assigned = shard_assignment(df, id_col, num_shards, seed)
    (
        assigned.repartition(num_shards, "shard")
        .sortWithinPartitions("shard", "shard_rank")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
    # manifest counts come from the parquet just written, NOT from the
    # assignment lineage — recomputing it would be a second full corpus
    # pass (md5 hash + exchange) for numbers the materialized data
    # already holds (r07 review)
    # explicit schema: an EMPTY corpus writes only _SUCCESS (no part
    # files, no partition dirs) and schema inference would fail — the
    # empty export must still commit a valid zero-count manifest
    # (r07 second review)
    counts = {
        int(r["shard"]): int(r["n"])
        for r in df.sparkSession.read.schema(assigned.schema)
        .parquet(path)
        .groupBy("shard")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    manifest = {
        "num_shards": num_shards,
        "seed": seed,
        "id_col": id_col,
        "rows_per_shard": {str(k): counts.get(k, 0) for k in range(num_shards)},
        "total_rows": sum(counts.values()),
    }
    tmp = os.path.join(path, "_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, sort_keys=True)
    os.replace(tmp, os.path.join(path, "_manifest.json"))
    return manifest


def read_shards(spark, path: str) -> DataFrame:
    """Read an :func:`export_shards` layout, refusing one whose
    manifest is absent (half-written export) or whose row count
    disagrees with the manifest (foreign writes)."""
    import json
    import os

    mpath = os.path.join(path, "_manifest.json")
    if not os.path.exists(mpath):
        raise ValueError(
            f"shard layout {path} has no _manifest.json — half-written "
            "export (the manifest commits last); re-export or delete"
        )
    with open(mpath) as f:
        manifest = json.load(f)
    if manifest["total_rows"] == 0:
        # an empty export holds no part files to infer a schema from;
        # the committed manifest is the authority that zero is correct
        raise ValueError(
            f"shard layout {path} is a committed EMPTY export "
            "(total_rows=0) — nothing to read"
        )
    out = spark.read.parquet(path)
    n = out.count()
    if n != manifest["total_rows"]:
        raise ValueError(
            f"shard layout {path} holds {n} rows but the manifest "
            f"committed {manifest['total_rows']} — refusing inconsistent state"
        )
    return out
