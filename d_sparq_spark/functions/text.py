"""Text-analysis column functions (SURVEY §2.C LLM-pipeline ops): token
counting (whitespace + BPE-ish regex), quality scoring, language ID
heuristic, document fingerprinting (rolling hash).

All pure Column expressions — they run inside whole-stage codegen and scale
linearly with the scan; a 100 TB corpus pays zero Python/serialization tax.
Each has an exactly-equivalent SQL form for the DuckDB oracle (no
engine-specific hash functions — the rolling hash uses only arithmetic,
length() and ascii()).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish word/number/punct segmentation: runs of letters, runs of
# digits, or single non-space symbols. The whitespace class is EXPLICIT —
# Java's \s includes vertical tab (\x0B) while DuckDB/RE2's does not
# (review r4), so a bare \s silently forks the token count across
# engines on a VT character.
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# tiny marker lexicons for the language-ID heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "die", "und", "ist"),
    "es": ("el", "la", "los", "es"),
    "fr": ("le", "la", "les", "est"),
    "zh": ("de", "shi", "le", "he"),
}

FP_PRIME = 1_000_000_007
FP_BASE = 131


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def n_tokens_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text)).cast("long")


def n_tokens_bpe(text: Column) -> Column:
    """BPE-ish segment count via regexp."""
    return F.regexp_count(text, F.lit(BPE_RE)).cast("long")


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double")
    return hits / F.size(toks).cast("double")


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII letters or spaces. Empty
    text -> NULL explicitly: Spark's non-ANSI 0.0/0.0 is NULL but
    DuckDB's is NaN, so the unguarded division forks the oracle
    comparison on one empty document (review r4)."""
    stripped = F.regexp_replace(text, r"[^A-Za-z ]", "")
    return F.when(
        F.length(text) > 0,
        F.length(stripped).cast("double") / F.length(text).cast("double"),
    )


def avg_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return total.cast("double") / F.size(toks).cast("double")


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]-ish: favors mid-length docs
    with a natural stopword ratio and alphabetic content. Deterministic,
    SQL-mirrorable (round to 6dp to pin the float result)."""
    length_term = F.least(F.length(text).cast("double") / F.lit(500.0), F.lit(1.0))
    return F.round(
        0.4 * length_term + 0.3 * stopword_ratio(text) + 0.3 * alpha_ratio(text), 6
    )


def _isin_filter(markers):
    # NB: pyspark HOF lambdas must take exactly the declared arity — a
    # `lambda t, m=markers:` default-arg closure is read as the (x, i)
    # two-arg form and the "default" receives the array INDEX column.
    return lambda t: t.isin(*markers)


def lang_id(text: Column) -> Column:
    """Marker-token language guess; 'und' when no lexicon hits. A real
    deployment would swap in fastText/CLD3 behind the same column contract."""
    toks = tokens(text)
    scores = {
        lang: F.size(F.filter(toks, _isin_filter(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # deterministic tie-break: first lang in sorted order wins
    for lang in sorted(scores, reverse=True):
        out = F.when((scores[lang] > 0) & (scores[lang] == best), lang).otherwise(out)
    return out


def fingerprint(text: Column) -> Column:
    """Rolling polynomial hash over the token stream:
    h = fold(tokens, 0, (acc, t) -> (acc*131 + 7*len(t) + ascii(t[0])) % p).
    Order-sensitive (it is a sequence fingerprint, not a bag), engine-
    agnostic (arithmetic only), collision rate ~n^2/p."""
    toks = tokens(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (
            acc * FP_BASE + 7 * F.length(t).cast("long") + F.ascii(t).cast("long")
        ) % FP_PRIME,
    )


# ---- SQL mirrors (DuckDB) ----

SQL_N_TOKENS_WS = "CAST(len(string_split({c}, ' ')) AS BIGINT)"
SQL_N_TOKENS_BPE = f"CAST(len(regexp_extract_all({{c}}, '{BPE_RE}')) AS BIGINT)"
_SW = ", ".join(f"'{w}'" for w in STOPWORDS)
SQL_STOPWORD_RATIO = (
    "CAST(len(list_filter(string_split({c}, ' '), t -> t IN (" + _SW + "))) AS DOUBLE)"
    " / CAST(len(string_split({c}, ' ')) AS DOUBLE)"
)
SQL_ALPHA_RATIO = (
    "CASE WHEN length({c}) > 0 THEN "
    "CAST(length(regexp_replace({c}, '[^A-Za-z ]', '', 'g')) AS DOUBLE)"
    " / CAST(length({c}) AS DOUBLE) END"
)
SQL_AVG_TOKEN_LEN = (
    "CAST(list_sum(list_transform(string_split({c}, ' '), t -> length(t))) AS DOUBLE)"
    " / CAST(len(string_split({c}, ' ')) AS DOUBLE)"
)
SQL_QUALITY = (
    "round(0.4 * least(CAST(length({c}) AS DOUBLE) / 500.0, 1.0)"
    f" + 0.3 * ({SQL_STOPWORD_RATIO})"
    f" + 0.3 * ({SQL_ALPHA_RATIO}), 6)"
)
# (no SQL_FINGERPRINT mirror: DuckDB has no fold aggregate — the tested
# oracle is the list_reduce form built inline in queries/llm_ops.py)
