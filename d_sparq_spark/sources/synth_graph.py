"""Deterministic synthetic edge sets for benching the path-closure
operators on a NON-TOY graph (VERDICT r3 #5: every closure bench ran on a
25-node derived chain where driver rounds dominate).

Design constraints:

- ~1.18M edges at sf0.1, scaling with the dataset (n_blocks = 3x the
  events row count; events is 100k rows at sf0.1 -> 300k blocks), so the
  driver's per-round bench exercises real shuffle volume while the sf0.01
  correctness gate stays cheap.
- Pure INTEGER arithmetic end to end (multiplicative hashing mod 2^31,
  shift-based power-law-ish chain lengths): DuckDB regenerates the exact
  same edge set from the same formulas, which makes the 1M-edge closure
  ORACLE-CHECKABLE (recursive CTE) instead of rows-only. No float pow —
  a 1-ulp libm difference would silently fork the graphs.
- Shape: blocks of up to 16 nodes form chains ("n<id>" -> "n<id+1>") with
  block length 16 >> (h % 7) — a log-uniform (heavy-tail-ish) length mix
  from 16 down to 1 — plus hash-selected skip links 2..6 nodes ahead
  inside the chain (extra join fan without changing reachability).
  Expected ~3.9 edges / ~22 closure pairs per block.
- ~1 block in 2560 is marked as a SEED (chain head carries an ex:seed
  triple): the small bound set the seeded frontier closure should win on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BLOCK = 16
SEED_MOD = 2560  # ~100 seed blocks at 1M edges

# integer hash laws — mirrored verbatim in synth_closure_oracle_sql()
_HB = "((b * 2654435761 + 40503) % 2147483648)"
_HI = "((id * 1103515245 + 12345) % 2147483648)"
_LEN = f"greatest(1, shiftright({BLOCK}, cast({_HB} % 7 as int)))"


def _id_frame(spark: SparkSession, n_blocks: int) -> DataFrame:
    """(id, b, p, ln, hi): every node with its block, in-block position,
    chain length, and per-id hash — the shared base of the edge and seed
    derivations."""
    ids = spark.range(n_blocks * BLOCK).select(
        F.col("id"),
        F.expr(f"id div {BLOCK}").alias("b"),
        F.expr(f"id % {BLOCK}").alias("p"),
    )
    return ids.withColumn("ln", F.expr(_LEN)).withColumn("hi", F.expr(_HI))


def synth_chain_edges_int(spark: SparkSession, n_blocks: int) -> DataFrame:
    """(src, dst) LONG edges — the same graph as synth_chain_triples
    before string formatting. The integer closure twin runs on this: an
    8-byte join key vs the lexical engine's 'n<id>' strings (measured
    0.76x at 1.18M edges, BASELINE.md) — the quantified reason the
    encoded engine's dictionary ids matter for iterative operators."""
    ids = _id_frame(spark, n_blocks)
    chain = ids.filter(F.col("p") < F.col("ln") - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    skip = ids.filter(
        (F.col("p") <= F.col("ln") - 3)
        & (F.col("hi") % 11 == 0)
        & (F.col("p") + 2 + F.col("hi") % 5 <= F.col("ln") - 1)
    ).select(F.col("id").alias("src"), (F.col("id") + 2 + F.col("hi") % 5).alias("dst"))
    return chain.unionByName(skip)


def synth_chain_triples(spark: SparkSession, n_blocks: int) -> DataFrame:
    """(s, p, o) string triples: ex:next chain/skip edges + ex:seed marks."""
    ids = _id_frame(spark, n_blocks)
    edges = synth_chain_edges_int(spark, n_blocks).select(
        F.concat(F.lit("n"), F.col("src")).alias("s"),
        F.lit("ex:next").alias("p"),
        F.concat(F.lit("n"), F.col("dst")).alias("o"),
    )
    # seed marks land on SHORT chains (len <= 8): the seeded walk's cost is
    # then bounded by seed-reachable depth while the unbound closure still
    # pays for the full depth-16 graph — the asymmetry the seeded frontier
    # operator exists for (block 0 is always a seed; its length is 8).
    seeds = (
        ids.filter(
            (F.col("p") == 0)
            & (F.col("ln") <= 8)
            & ((F.expr(_HB) % SEED_MOD == 0) | (F.col("b") == 0))
        )
        .select(
            F.concat(F.lit("n"), F.col("id")).alias("s"),
            F.lit("ex:seed").alias("p"),
            F.lit("y").alias("o"),
        )
    )
    return edges.unionByName(seeds)


def synth_blocks_for(spark: SparkSession, sf_dir: str) -> int:
    """Graph size follows the dataset: 3x the events row count (a parquet
    footer count — no scan). sf0.1 -> 300k blocks ≈ 1.18M edges."""
    return 3 * spark.read.parquet(f"{sf_dir}/events.parquet").count()


# DuckDB spellings of the same integer laws (>> operator, // int div)
_SQL_LEN = f"greatest(1, {BLOCK} >> CAST({_HB} % 7 AS INT))"

_ORACLE_EDGES = f"""
nums AS (SELECT row_number() OVER () - 1 AS r FROM events),
blocks AS (
  SELECT r + i * (SELECT COUNT(*) FROM events) AS b
  FROM nums CROSS JOIN range(0, 3) t(i)
),
ids AS (
  SELECT b * {BLOCK} + p AS id, b, p
  FROM blocks CROSS JOIN range(0, {BLOCK}) t(p)
),
lens AS (SELECT id, b, p, {_SQL_LEN} AS ln, {_HI} AS hi FROM ids),
edges AS (
  SELECT id AS src, id + 1 AS dst FROM lens WHERE p < ln - 1
  UNION ALL
  SELECT id AS src, id + 2 + hi % 5 AS dst FROM lens
  WHERE p <= ln - 3 AND hi % 11 = 0 AND p + 2 + hi % 5 <= ln - 1
),
seeds AS (
  SELECT id FROM lens
  WHERE p = 0 AND ln <= 8 AND (({_HB}) % {SEED_MOD} = 0 OR b = 0)
)
"""


def synth_closure_oracle_sql(seeded: bool) -> str:
    """Recursive-CTE oracle over the SAME integer-generated edge set.
    Unbound: per-block closure pair counts. Seeded: the full (x, y) pairs
    reachable from the seed heads."""
    if seeded:
        return f"""
WITH RECURSIVE
{_ORACLE_EDGES},
sreach AS (
  SELECT s.id AS sid, e.dst FROM seeds s JOIN edges e ON e.src = s.id
  UNION
  SELECT r.sid, e.dst FROM sreach r JOIN edges e ON e.src = r.dst
)
SELECT 'n' || CAST(sid AS VARCHAR) AS x, 'n' || CAST(dst AS VARCHAR) AS y FROM sreach
"""
    return f"""
WITH RECURSIVE
{_ORACLE_EDGES},
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
)
SELECT src // {BLOCK} AS blk, COUNT(*) AS n_pairs
FROM reach GROUP BY src // {BLOCK}
"""


def synth_closure_closed_sql(seeded: bool) -> str:
    """NON-RECURSIVE closed form of synth_closure_oracle_sql (r9, VERDICT
    r8 #8 — the per-block recurrence device): edges never leave a 16-node
    block and the consecutive chain makes reachability exactly
    {(i, j): i < j < ln}, so the per-block pair count is C(ln, 2) and the
    seeded pair set is the seed head's chain suffix. Pure integer
    arithmetic, O(n_blocks), no recursion — this is what lets the sf0.1
    oracle lap verify the 1.18M-edge closures where the RECURSIVE oracle
    spills DuckDB. Cross-validated against the recursive oracle at
    sf0.001 and sf0.01 (tests/test_sparql_paths.py)."""
    base = f"""
nums AS (SELECT row_number() OVER () - 1 AS r FROM events),
blocks AS (
  SELECT r + i * (SELECT COUNT(*) FROM events) AS b
  FROM nums CROSS JOIN range(0, 3) t(i)
),
lens AS (SELECT b, {_SQL_LEN} AS ln FROM blocks)"""
    if seeded:
        return f"""
WITH {base},
seeds AS (
  SELECT b, ln FROM lens
  WHERE ln <= 8 AND ({_HB} % {SEED_MOD} = 0 OR b = 0)
)
SELECT 'n' || CAST(b * {BLOCK} AS VARCHAR) AS x,
       'n' || CAST(b * {BLOCK} + k AS VARCHAR) AS y
FROM seeds CROSS JOIN range(1, {BLOCK}) t(k) WHERE k < ln
"""
    return f"""
WITH {base}
SELECT b AS blk, CAST(ln * (ln - 1) // 2 AS BIGINT) AS n_pairs
FROM lens WHERE ln >= 2
"""


# --- hub / power-law variant (r5, VERDICT r4 #4) ----------------------------
#
# The chain graph never triggers the stride growth cap (paths.py: deepening
# stops when the composed hop relation blows past 8x|E|) because chain
# 2-paths grow linearly. This variant is hub-shaped: n_hubs star centers,
# each with S_j in-spokes and S_j out-spokes where S_j = 64 >> (hash(j) % 5)
# — a log-uniform degree mix from 64 down to 4 (power-law-ish, skewed join
# keys). Every in-spoke reaches every out-spoke through its hub, so pairs
# at distance <= 2 are sum S_j^2 ~ 22x|E| — the composition blows past the
# 8x cap on the FIRST doubling and the cap branch must discard it. Same
# oracle discipline as the chain graph: pure integer laws DuckDB replays
# exactly, so the closure is hash-checkable, not rows-only.

BLOCKH = 129  # hub slot: 1 hub + up to 64 in-spokes + up to 64 out-spokes
S_MAX = 64

_HJ = "((j * 2654435761 + 40503) % 2147483648)"
_SJ = f"greatest(1, shiftright({S_MAX}, cast({_HJ} % 5 as int)))"
_HID = "((id * 1103515245 + 12345) % 2147483648)"


def synth_hubs_for(spark: SparkSession, sf_dir: str) -> int:
    """Hub count follows the dataset: events/250 (footer count, no scan).
    sf0.1 -> 400 hubs (~20k edges, ~450k closure pairs); sf0.01 -> 40."""
    return max(4, spark.read.parquet(f"{sf_dir}/events.parquet").count() // 250)


def _hub_frame(spark: SparkSession, n_hubs: int) -> DataFrame:
    return (
        spark.range(n_hubs)
        .select(F.col("id").alias("j"))
        .withColumn("s", F.expr(_SJ))
    )


def synth_hub_edges_int(spark: SparkSession, n_hubs: int) -> DataFrame:
    """(src, dst) LONG edges of the bipartite hub graph. Node layout per
    hub j (fixed slot width 129 regardless of realized degree):
    hub = j*129, in-spokes j*129+1 .. +s, out-spokes j*129+65 .. +64+s."""
    hubs = _hub_frame(spark, n_hubs)
    spokes = hubs.select(
        "j", F.explode(F.sequence(F.lit(0), F.col("s") - 1)).alias("i")
    )
    inb = spokes.select(
        (F.col("j") * BLOCKH + 1 + F.col("i")).alias("src"),
        (F.col("j") * BLOCKH).alias("dst"),
    )
    outb = spokes.select(
        (F.col("j") * BLOCKH).alias("src"),
        (F.col("j") * BLOCKH + 1 + S_MAX + F.col("i")).alias("dst"),
    )
    return inb.unionByName(outb)


def synth_hub_triples(spark: SparkSession, n_hubs: int) -> DataFrame:
    """(s, p, o) string triples: ex:next hub edges + ex:seed marks on a
    hash-selected ~1% of in-spokes (in-spoke 1 of hub 0 is always a seed
    so the bound walk is non-vacuous at every scale)."""
    edges = synth_hub_edges_int(spark, n_hubs).select(
        F.concat(F.lit("n"), F.col("src")).alias("s"),
        F.lit("ex:next").alias("p"),
        F.concat(F.lit("n"), F.col("dst")).alias("o"),
    )
    hubs = _hub_frame(spark, n_hubs)
    seeds = (
        hubs.select(
            "j", F.explode(F.sequence(F.lit(0), F.col("s") - 1)).alias("i")
        )
        .select((F.col("j") * BLOCKH + 1 + F.col("i")).alias("id"))
        .filter((F.expr(_HID) % 97 == 0) | (F.col("id") == 1))
        .select(
            F.concat(F.lit("n"), F.col("id")).alias("s"),
            F.lit("ex:seed").alias("p"),
            F.lit("y").alias("o"),
        )
    )
    return edges.unionByName(seeds)


_SQL_SJ = f"greatest(1, {S_MAX} >> CAST({_HJ} % 5 AS INT))"

_ORACLE_HUB_EDGES = f"""
nums AS (SELECT row_number() OVER () - 1 AS j FROM events),
hubs AS (
  SELECT j, {_SQL_SJ} AS s FROM nums
  WHERE j < greatest(4, (SELECT COUNT(*) FROM events) // 250)
),
spokes AS (
  SELECT j, s, i FROM hubs CROSS JOIN range(0, {S_MAX}) t(i) WHERE i < s
),
edges AS (
  SELECT j * {BLOCKH} + 1 + i AS src, j * {BLOCKH} AS dst FROM spokes
  UNION ALL
  SELECT j * {BLOCKH} AS src, j * {BLOCKH} + 1 + {S_MAX} + i AS dst FROM spokes
),
seeds AS (
  SELECT j * {BLOCKH} + 1 + i AS id FROM spokes
  WHERE ((((j * {BLOCKH} + 1 + i) * 1103515245 + 12345) % 2147483648) % 97 = 0)
     OR j * {BLOCKH} + 1 + i = 1
)
"""


def synth_hub_closure_oracle_sql(seeded: bool) -> str:
    """Recursive-CTE oracle over the same hub edges. Unbound: closure pair
    counts per hub slot. Seeded: exact (x, y) pairs from the seed spokes."""
    if seeded:
        return f"""
WITH RECURSIVE
{_ORACLE_HUB_EDGES},
sreach AS (
  SELECT s.id AS sid, e.dst FROM seeds s JOIN edges e ON e.src = s.id
  UNION
  SELECT r.sid, e.dst FROM sreach r JOIN edges e ON e.src = r.dst
)
SELECT 'n' || CAST(sid AS VARCHAR) AS x, 'n' || CAST(dst AS VARCHAR) AS y FROM sreach
"""
    return f"""
WITH RECURSIVE
{_ORACLE_HUB_EDGES},
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
)
SELECT src // {BLOCKH} AS hub, COUNT(*) AS n_pairs
FROM reach GROUP BY src // {BLOCKH}
"""


def synth_hub_closure_closed_sql(seeded: bool) -> str:
    """NON-RECURSIVE closed form of synth_hub_closure_oracle_sql (r9):
    the hub graph is bipartite per slot — every in-spoke reaches the hub
    and all s out-spokes (s + 1 targets each), the hub reaches its s
    out-spokes — so the per-slot pair count is s*(s+1) + s = s^2 + 2s and
    the seeded pair set is each seed spoke's {hub} ∪ out-spokes. Same
    cross-validation discipline as synth_closure_closed_sql."""
    base = f"""
nums AS (SELECT row_number() OVER () - 1 AS j FROM events),
hubs AS (
  SELECT j, {_SQL_SJ} AS s FROM nums
  WHERE j < greatest(4, (SELECT COUNT(*) FROM events) // 250)
)"""
    if not seeded:
        return f"""
WITH {base}
SELECT j AS hub, CAST(s * s + 2 * s AS BIGINT) AS n_pairs FROM hubs
"""
    return f"""
WITH {base},
spokes AS (
  SELECT j, s, i FROM hubs CROSS JOIN range(0, {S_MAX}) t(i) WHERE i < s
),
seeds AS (
  SELECT j, s, j * {BLOCKH} + 1 + i AS id FROM spokes
  WHERE ((((j * {BLOCKH} + 1 + i) * 1103515245 + 12345) % 2147483648) % 97 = 0)
     OR j * {BLOCKH} + 1 + i = 1
)
SELECT 'n' || CAST(id AS VARCHAR) AS x,
       'n' || CAST(j * {BLOCKH} AS VARCHAR) AS y
FROM seeds
UNION ALL
SELECT 'n' || CAST(id AS VARCHAR),
       'n' || CAST(j * {BLOCKH} + 1 + {S_MAX} + i AS VARCHAR)
FROM seeds CROSS JOIN range(0, {S_MAX}) t(i) WHERE i < s
"""
