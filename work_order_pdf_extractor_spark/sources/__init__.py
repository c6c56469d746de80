"""Sources/sinks: transcripts table (Iceberg-or-parquet), reference keys."""
