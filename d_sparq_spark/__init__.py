"""d_sparq_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the D-SPARQ distributed RDF/SPARQL engine
(raghavam/d-sparq; R. Mutharaju et al., "D-SPARQ: Distributed, Scalable and
Efficient RDF Query Engine", ISWC 2013 Posters & Demos).

The reference is a Java/MapReduce/MongoDB/METIS query-shipping engine; this
package re-expresses its semantics Spark-first:

- the triple store is a columnar Parquet-backed DataFrame (bucketed by
  subject; a second copy partitioned by predicate = the S2RDF "vertical
  partitioning" layout), replacing MongoDB subject-grouped documents,
- METIS graph partitioning + boundary replication are subsumed by Spark's
  shuffle / bucketing / broadcast joins,
- star and path joins are co-partitioned equi-joins planned from
  per-predicate statistics, then optimized by Catalyst + AQE,
- SPARQL is parsed by a small recursive-descent parser (plans/sparql.py)
  and translated to DataFrame operations — zero custom Catalyst rules.

Subpackages:
  operators/  — relational + RDF operators (joins, aggs, windows, stars)
  sources/    — N-Triples parser, parquet table IO, triple-store writer
  functions/  — text analysis, similarity, dedup column functions
  plans/      — SPARQL parser, IR, planner (BGP -> join tree)
  streaming/  — structured-streaming variants of the event operators
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
