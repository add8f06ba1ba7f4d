"""Explicit skew handling for hot keys (monorepo-sized hyperedges).

Three layers of defense, in the order the engine applies them:

1. **Map-side partial aggregation** — the majority/min/sum kernels are
   algebraic, so Catalyst's partial agg compresses a hot key to one row
   per map partition BEFORE the shuffle (operators/majority.py).  This
   is exact and free; it is why the gather aggregations never need
   salting.
2. **AQE skew-join splitting** — ``spark.sql.adaptive.skewJoin.enabled``
   (on in session.py) splits oversized shuffle partitions of the
   per-superstep joins at runtime.
3. **Explicit salted join** (this module) — for the one shape AQE can't
   fix in a single pass: a shuffle join where ONE key's rows exceed an
   executor (the 10^12-file monorepo edge joined against edge_labels).
   Replicate the small side S ways, scatter the big side by
   ``hash(row) % S``; exact for any 1-row-per-key small side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` (skewed on ``key``) with ``small`` (unique per key),
    spreading each hot key over ``salt`` shuffle partitions.

    ``small`` is replicated ``salt`` times (explode over the salt range)
    so every (key, salt_value) bucket of ``big`` finds its match without
    concentrating a hot key on one reducer.  Exact: each big row joins
    exactly the one small row for its key.

    Only ``inner`` and ``left`` are exact: the replication trick would
    surface each *unmatched* small-side row ``salt`` times under right /
    full outer joins, so those are rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only (got {how!r}); "
            "right/full outer would duplicate unmatched small-side rows "
            "salt times"
        )
    salted_big = big.withColumn(
        "_salt", (F.xxhash64(*[F.col(c) for c in big.columns]) % salt + salt) % salt
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_big.join(salted_small, [key, "_salt"], how).drop("_salt")


def top_hot_keys(df: DataFrame, key: str, n: int = 10) -> DataFrame:
    """Diagnostic: the n heaviest keys and their row counts."""
    return df.groupBy(key).agg(F.count("*").alias("rows")).orderBy(F.desc("rows")).limit(n)
