"""Column-level function library (text analysis, hashing) — all built-in
pyspark.sql.functions compositions, JVM-side, no Python UDFs."""
