"""Column-level functions for the LLM-data-pipeline operators: text
analysis, similarity math, fingerprinting. Everything here returns Spark
Column expressions built from pyspark.sql.functions — JVM-side, codegen-
able, no Python UDFs in hot paths."""
