"""Distribution statistics: exact and approximate (sketch) forms.

WHICH TO USE AT 100 TB:

- ``exact`` forms (``percentile()``, ``COUNT(DISTINCT)``) are a full
  per-group sort / a full shuffle of the distinct key set.  Right for
  oracle checks, small groups, and final reporting where the group
  cardinality is known-bounded.  These are what the DuckDB twins verify
  value-exactly (``quantiles`` contract query).
- ``approx`` forms are one-pass, fixed-size, MERGEABLE sketches — the
  only shapes that survive a 100 TB groupBy without spilling:
  * :func:`approx_quantiles` — ``approx_percentile`` (Greenwald-Khanna
    variant); rank error <= n/accuracy per group, memory O(accuracy).
  * :func:`approx_distinct` — ``approx_count_distinct`` (HyperLogLog++);
    relative error ~ rsd (default 0.05), memory O(1/rsd^2) ~ KB.
  Both are deterministic functions of the data (no rand()), so results
  are stable across retries/partitionings — but their values are
  engine-specific (Spark GK/HLL++ != DuckDB t-digest/HLL), so the
  cross-engine contract is a TOLERANCE check against the exact forms,
  not value equality (see ``__spark_entry__.q_approx_stats``).

Reference scope note: the reference engine has no statistics surface;
this module serves the training-data-pipeline checklist (corpus
profiling: token-count quantiles, per-shard distinct doc counts).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probs: Sequence[float],
    accuracy: int = 10000,
    prefix: str = "q",
) -> DataFrame:
    """Per-group approximate quantiles: one sketch pass, columns
    ``{prefix}{int(100p)}`` per requested probability ``p``."""
    arr = "array(" + ", ".join(f"{p!r}D" for p in probs) + ")"
    agg = F.expr(
        f"approx_percentile({value_col}, {arr}, {accuracy})"
    ).alias("_aq")
    out = df.groupBy(*group_cols).agg(agg)
    return out.select(
        *group_cols,
        *[
            F.element_at("_aq", i + 1).alias(f"{prefix}{int(round(p * 100))}")
            for i, p in enumerate(probs)
        ],
    )


def approx_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    rsd: float = 0.05,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Per-group HyperLogLog++ distinct count of ``key_col``."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(key_col, rsd).alias(out_col)
    )


def _within_abs(a: Column, b: Column, tol: float) -> Column:
    return (F.abs(a - b) <= F.lit(tol)).cast("int")


def _within_rel(approx: Column, exact: Column, rel: float) -> Column:
    return (F.abs(approx - exact) <= F.lit(rel) * exact).cast("int")


def stats_with_tolerance(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    key_col: str,
    probs: Sequence[float] = (0.5, 0.9),
    accuracy: int = 10000,
    rsd: float = 0.05,
    abs_tol: float = 1.0,
    rel_tol: float = 0.15,
) -> DataFrame:
    """Exact AND approx statistics side by side, plus per-group
    ``*_ok`` flags asserting the approx forms are within tolerance of
    the exact ones (``abs_tol`` on quantile values; ``rel_tol``
    relative on distinct counts, 3-sigma for the default rsd=0.05).

    This is the cross-engine contract shape: the exact columns are
    value-hash-checked by the DuckDB twin, the flags certify the
    sketches against them inside ONE engine (sketch internals are
    engine-specific, so cross-engine value equality is undefined).
    """
    parr = "array(" + ", ".join(f"{p!r}D" for p in probs) + ")"
    agg = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, {parr})").alias("_xq"),
        F.expr(f"approx_percentile({value_col}, {parr}, {accuracy})").alias("_aq"),
        F.count_distinct(F.col(key_col)).alias("n_distinct"),
        F.approx_count_distinct(key_col, rsd).alias("_ad"),
    )
    cols = [*group_cols]
    for i, p in enumerate(probs):
        name = f"p{int(round(p * 100))}"
        cols.append(F.round(F.element_at("_xq", i + 1), 6).alias(name))
        cols.append(
            _within_abs(
                F.element_at("_aq", i + 1).cast("double"),
                F.element_at("_xq", i + 1),
                abs_tol,
            ).alias(f"{name}_ok")
        )
    cols.append(F.col("n_distinct").cast("long"))
    cols.append(
        _within_rel(
            F.col("_ad").cast("double"), F.col("n_distinct").cast("double"), rel_tol
        ).alias("distinct_ok")
    )
    return agg.select(*cols)
