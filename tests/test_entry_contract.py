"""Driver-contract self-checks: structural guarantees of
__spark_entry__ that regressions must not break (the value-level checks
live in tools/validate_entry.py, run against DuckDB)."""

from __future__ import annotations

import __spark_entry__ as entry


def test_every_oracle_has_a_query():
    qs = entry.queries()
    for name in entry.oracle_sql():
        assert name in qs, f"oracle_sql has {name} but queries() does not"


def test_query_callables_and_names():
    qs = entry.queries()
    assert len(qs) >= 20
    # the driver's correctness gate records at most 50 rows
    # (CORRECTNESS_r03 dropped entries 51-53) — never exceed it again
    assert len(qs) <= 50, "driver gate caps at 50 entries; merge queries"
    for name, fn in qs.items():
        assert callable(fn), name
        assert name.replace("_", "").isalnum()


def test_entry_runs_on_sf0001(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == ["vertex_id", "label"]


def test_sql_oracles_parse_in_duckdb():
    """Every oracle must at least parse+plan in DuckDB against the real
    tables (cheap guard against dialect typos; value parity is checked
    by validate_entry)."""
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        )
    for name, sql in entry.oracle_sql().items():
        con.sql(f"EXPLAIN {sql}")  # raises on parse/bind errors
