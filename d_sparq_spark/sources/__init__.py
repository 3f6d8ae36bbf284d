"""Data sources and sinks: parquet table IO, N-Triples parsing, triple-store
layout writers (bucketed-by-subject + partitioned-by-predicate copies)."""
