"""Registered harness queries — one module per SURVEY.md §2 group.

Importing this package populates the registry (each submodule registers its
queries at import time via @register).
"""

from d_sparq_spark.queries import (  # noqa: F401
    corpus_quality,
    corpus_sampling,
    coverage_extra,
    events_windows,
    flagship,
    graph_analytics,
    llm_ops,
    rdf_core,
    relational_aggs,
    relational_joins,
    relational_scalars,
    relational_scan,
    relational_setops,
    relational_windows,
    sparql_paths,
    sparql_queries,
    tpch_rest,
)
