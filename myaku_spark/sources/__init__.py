"""Sources: the `pages` input table (Iceberg-shaped; parquet in sandbox)
and deterministic synthetic page generation for tests/benchmarks."""
