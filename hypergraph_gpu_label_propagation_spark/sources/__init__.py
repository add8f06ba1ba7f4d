"""Sources and sinks: deterministic generators, JSON loaders (both
reference schemas), the synthetic source_files table, COO ingest, and
the HGR1 binary interop util."""
