"""Sources/sinks: bucketed table IO (Parquet now, Iceberg-ready call
sites) and the deterministic synthetic corpus generator."""
