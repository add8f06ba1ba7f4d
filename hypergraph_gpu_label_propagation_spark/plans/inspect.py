"""Plan-inspection helpers: assert the physical plan has the shape the
engine is designed for (pushdown reached the scan, joins broadcast when
they should, whole-stage codegen covers the hot expressions).

Used by tests/test_plans.py and ad-hoc tuning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.org.apache.spark.sql.execution.ExplainUtils.processPlan(  # type: ignore[attr-defined]
        df._jdf.queryExecution().executedPlan(), None
    )


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def has_pushed_filters(df: DataFrame) -> bool:
    return "PushedFilters: [" in explain_str(df, "formatted") and not (
        "PushedFilters: []" in explain_str(df, "formatted")
    )


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column lists of every parquet scan's ReadSchema — verifies column
    pruning (a 2-column projection must not scan 16 columns)."""
    out = []
    for line in explain_str(df, "formatted").splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            cols = line.split("struct<", 1)[-1].rstrip(">")
            out.append([c.split(":")[0] for c in cols.split(",") if c])
    return out


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan — the scale currency."""
    return explain_str(df, "simple").count("Exchange hashpartitioning")


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def codegen_stage_count(df: DataFrame) -> int:
    return explain_str(df, "simple").count("WholeStageCodegen")
