"""ExtVP — extended vertical partitioning (S2RDF, VLDB 2016; SURVEY.md §4
names this as the only contemplated post-v1 optimizer addition).

Idea: for a pair of predicates (p1, p2) that co-occur in query shapes,
pre-materialize the SEMI-JOIN REDUCTION of p1's triples against p2:

    SS:  triples(p1) where subject also occurs as subject of p2
         (what a subject-star query over {p1, p2} will actually touch)
    OS:  triples(p1) where object  also occurs as subject of p2
         (what a path join p1 -> p2 will actually touch)

At query time a star/path over {p1, p2} scans the reduction instead of
the full VP slice — the selectivity factor (reduction size / slice size)
is often 0.01-0.3 on real RDF, which is the whole S2RDF speedup. The
reductions are plain DataFrames/parquet — no Catalyst rules, exactly the
"plain jobs, not rules" stance of SURVEY §4.

Correctness invariant (tested): star/path join over the reduction ==
over the full store, because semi-join reduction never removes a row
that has a join partner.
"""

from __future__ import annotations

import json
import os
from itertools import permutations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ss_reduction(triples: DataFrame, p1: object, p2: object) -> DataFrame:
    """Subject-subject reduction: p1-triples whose subject also has p2."""
    left = triples.filter(F.col("p") == F.lit(p1))
    right = triples.filter(F.col("p") == F.lit(p2)).select("s").distinct()
    return left.join(right, "s", "left_semi")


def os_reduction(triples: DataFrame, p1: object, p2: object) -> DataFrame:
    """Object-subject reduction: p1-triples whose object is a p2 subject."""
    left = triples.filter(F.col("p") == F.lit(p1))
    right = (
        triples.filter(F.col("p") == F.lit(p2))
        .select(F.col("s").alias("o"))
        .distinct()
    )
    return left.join(right, "o", "left_semi")


def iter_reductions(
    triples: DataFrame,
    predicates: list | None = None,
    min_selectivity: float = 0.9,
    pairs: list | None = None,
    sizes: dict | None = None,
):
    """Yield (kind, p1, p2, reduction_df, ratio) for every genuinely
    reducing SS/OS pair (size ratio < min_selectivity — a reduction that
    keeps ~everything is wasted storage; S2RDF uses the same threshold
    idea). Pair count is |P|^2 — RDF predicate vocabularies are small
    (SURVEY §1.2), and each reduction is one semi-join job. SHARED by the
    parquet materializer below and StoreCatalog.add_extvp (review r4: the
    two copies of this loop had already drifted on ratio rounding).
    ``pairs`` restricts the enumeration to an explicit (p1, p2) list —
    the incremental refresh path (refresh_extvp) recomputes only pairs a
    delta touched."""
    explicit_sizes = sizes is not None
    if pairs is None:
        if predicates is None:
            predicates = [r["p"] for r in triples.select("p").distinct().collect()]
        pairs = permutations(predicates, 2)
    if sizes is None:
        sizes = {
            r["p"]: r["n"]
            for r in triples.groupBy("p").agg(F.count(F.lit(1)).alias("n")).collect()
        }
    for p1, p2 in pairs:
        if explicit_sizes and p1 not in sizes:
            # Fail closed: a zero denominator would make ratio 0.0 — the
            # pair would always look maximally reducing and a bogus 0.0
            # would win smallest-first routing from the manifest.
            raise KeyError(
                f"iter_reductions: predicate {p1!r} missing from the "
                "explicitly-passed sizes dict"
            )
        for kind, fn in (("ss", ss_reduction), ("os", os_reduction)):
            red = fn(triples, p1, p2)
            n = red.count()
            # internally-computed sizes cover every predicate in triples;
            # an absent p1 there means red is empty and the n>0 guard skips
            sz = sizes.get(p1, 0)
            ratio = n / sz if sz else 0.0
            if 0 < n and ratio < min_selectivity:
                yield kind, p1, p2, red, round(ratio, 4)


def materialize_extvp(
    triples: DataFrame,
    store_path: str,
    predicates: list | None = None,
    min_selectivity: float = 0.9,
) -> dict:
    """Materialize the reducing SS/OS pairs (iter_reductions) as parquet.
    Returns {(kind, p1, p2): ratio} for what was written."""
    written: dict = {}
    for kind, p1, p2, red, ratio in iter_reductions(
        triples, predicates, min_selectivity
    ):
        red.write.mode("overwrite").parquet(_red_path(store_path, kind, p1, p2))
        written[(kind, p1, p2)] = ratio
    # manifest so StoreCatalog.load_extvp can enumerate reductions (and
    # their ratios, which drive smallest-first selection) without listing
    # the object store.
    os.makedirs(os.path.join(store_path, "extvp"), exist_ok=True)
    with open(os.path.join(store_path, "extvp", "manifest.json"), "w") as f:
        json.dump(
            [
                {"kind": k, "p1": p1, "p2": p2, "ratio": r}
                for (k, p1, p2), r in written.items()
            ],
            f,
        )
    return written


def refresh_extvp(
    triples: DataFrame,
    store_path: str,
    touched: list,
    min_selectivity: float = 0.9,
    sizes: dict | None = None,
) -> dict:
    """Incremental re-materialization after an append (review r7): only
    pairs involving a TOUCHED predicate can have changed, so recompute
    exactly those; untouched pairs keep their parquet files and manifest
    entries verbatim. A recomputed pair that stopped reducing (ratio >=
    threshold, or emptied) simply drops out of the manifest — its stale
    files are unreferenced and harmless. Falls back to the full
    materializer when no manifest exists. ``sizes`` (per-predicate counts,
    e.g. read from the store's freshly-merged stats/ parquet) supplies
    both the ratio denominators and the predicate universe, so the
    refresh runs no full-store aggregation at all (review r7 round 2)."""
    manifest = os.path.join(store_path, "extvp", "manifest.json")
    if not os.path.exists(manifest):
        return materialize_extvp(triples, store_path, min_selectivity=min_selectivity)
    with open(manifest) as f:
        old_entries = json.load(f)
    touched_set = set(touched)
    kept = [
        e
        for e in old_entries
        if e["p1"] not in touched_set and e["p2"] not in touched_set
    ]
    if sizes is not None:
        all_preds = list(sizes)
    else:
        all_preds = [r["p"] for r in triples.select("p").distinct().collect()]
    pairs = [
        (p1, p2)
        for p1, p2 in permutations(all_preds, 2)
        if p1 in touched_set or p2 in touched_set
    ]
    written: dict = {}
    for kind, p1, p2, red, ratio in iter_reductions(
        triples, min_selectivity=min_selectivity, pairs=pairs, sizes=sizes
    ):
        red.write.mode("overwrite").parquet(_red_path(store_path, kind, p1, p2))
        written[(kind, p1, p2)] = ratio
    with open(manifest, "w") as f:
        json.dump(
            kept
            + [
                {"kind": k, "p1": p1, "p2": p2, "ratio": r}
                for (k, p1, p2), r in written.items()
            ],
            f,
        )
    return written


def _red_path(store_path: str, kind: str, p1: object, p2: object) -> str:
    # COLLISION-FREE encoding (review r4: ':'/'/'->'_' mapped distinct
    # predicates like ex/a_b and ex/a/b onto one path, and the '__' pair
    # delimiter was ambiguous — one reduction silently overwrote another
    # and the substituted scan returned EMPTY answers). percent-encoding
    # is bijective, and '@' always encodes to %40, so '@@' can never occur
    # inside an encoded part — the delimiter is unambiguous. Stores
    # materialized under the old scheme need re-materializing.
    from urllib.parse import quote

    def safe(x):
        return quote(str(x), safe="")

    return os.path.join(store_path, "extvp", kind, f"{safe(p1)}@@{safe(p2)}")


def read_reduction(
    spark: SparkSession, store_path: str, kind: str, p1: object, p2: object
) -> DataFrame | None:
    from pyspark.errors import AnalysisException

    path = _red_path(store_path, kind, p1, p2)
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        # not materialized -> caller falls back to the full slice; any
        # OTHER error (corrupt files, permissions) must propagate rather
        # than silently degrade a manifest-listed reduction (review r4)
        return None
