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


def stats_size_bits(df: DataFrame) -> int:
    """Bit length of the optimized plan's ``sizeInBytes`` estimate.

    This is the observable for the round-5 planning pathology:
    ``localCheckpoint`` (LogicalRDD) PRESERVES its origin plan's
    sizeInBytes, and Catalyst's SizeInBytesOnlyStatsPlanVisitor
    MULTIPLIES join children's sizes as arbitrary-precision BigInt — so
    an iterative round shape that references the state frame on BOTH
    sides of an (inner/outer) join squares the estimate every round,
    DOUBLING this bit length per round, until the driver spins minutes
    per round inside BigInteger.multiply during planning (940 s observed
    before the kcore fix, BENCH_SCALING.md round 5).  A LINEAR round
    shape (state referenced once per multiplied path; left_semi/
    left_anti take only the left side's stats) grows this by a constant
    number of bits per round instead.
    """
    jstats = df._jdf.queryExecution().optimizedPlan().stats()
    try:
        # py4j maps the scala BigInt straight to a Python int
        return int(jstats.sizeInBytes()).bit_length()
    except Exception:
        # py4j's primitive conversion gives up somewhere past 2^8192 —
        # count the digits of the decimal rendering instead (already
        # deep inside the pathological regime by then)
        import math

        digits = len(jstats.sizeInBytes().toString().lstrip("-"))
        return max(1, math.ceil((digits - 1) * math.log2(10)))


# generous static budget: real frames estimate well under 2^200 bytes;
# a squaring round shape blows past this within ~8 rounds from any
# starting point, while a linear shape stays below it for thousands
STATS_BITS_BUDGET = 2048


def assert_linear_state_refs(df: DataFrame, max_bits: int = STATS_BITS_BUDGET,
                             context: str = "") -> int:
    """Assert the frame's size estimate hasn't entered the exponential
    stats-squaring regime (see :func:`stats_size_bits`).  Call on the
    per-round state AFTER a few iterations — a squaring shape is
    unmistakable by round ~10 at any data size, because the growth rate
    is a property of the PLAN SHAPE, not the data.  Returns the bit
    length so tests can also assert growth-per-round deltas."""
    bits = stats_size_bits(df)
    if bits > max_bits:
        raise AssertionError(
            f"optimizedPlan sizeInBytes is a {bits}-bit number "
            f"(budget {max_bits}){' in ' + context if context else ''}: "
            f"the iterative round shape is referencing checkpointed "
            f"state on both sides of a stats-multiplied join — see "
            f"plans/inspect.py::stats_size_bits and the kcore fused-"
            f"steps comment for the linearization rules"
        )
    return bits
