"""Engine operators: dictionary encoding, triple-pattern matching, star and
path joins, statistics — plus the LLM-pipeline operators (dedup,
similarity, text analysis)."""
