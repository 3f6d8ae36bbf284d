"""SPARQL front end: tokenizer/parser (parser.py), algebra IR (ast.py),
algebra -> DataFrame translation (translate.py).

The reference parses SPARQL with Jena ARQ and plans star-decomposed Mongo
lookups (SURVEY.md §3 entry point 2). Here: a ~500-line recursive-descent
parser (rdflib is not available in this environment) produces a small
algebra tree; the translator turns BGPs into star-grouped join chains
(operators/rdf_patterns.py) and everything else into stock DataFrame ops,
then Catalyst/AQE do the physical planning.
"""
