"""Deduplication operators (SURVEY §2.C LLM-pipeline ops): exact,
MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the whole point of these at 100 TB):
- exact dedup is a single hash groupBy on a 64-hex digest — shuffle keyed
  on the digest, never on the document text;
- MinHash/LSH: signature computation is a linear scan (one string hash
  per shingle + num_hashes long re-hashes, all JVM-side); banding explodes each doc into
  n_bands rows and self-joins on (band_idx, band_hash) — candidate
  pairs ~ true-dup pairs, not n^2; the final Jaccard verification touches
  candidates only. This is the standard shingle->minhash->band->bucket
  pipeline (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch.3);
- SimHash: 64-bit sign-aggregated token hashes; near-dups = equal
  simhash (or small Hamming distance via band-rotation);
- n-gram Jaccard: exact pairwise within a blocking key — quadratic per
  block, use only after LSH-style blocking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text; deterministic representative = min id.
    Returns (id_col, text_col, n_copies). The groupBy KEY is the sha256
    digest, not the text (the module's stated design): at corpus scale
    the shuffle keys are 64 hex chars however long the documents are,
    and map-side combine collapses same-partition duplicates so at most
    one text copy per (digest, partition) crosses the wire. min(text)
    over a digest group is the text itself (collision odds ~2^-128)."""
    return (
        docs.groupBy(F.sha2(F.col(text_col), 256).alias("_dg"))
        .agg(
            F.min(id_col).alias(id_col),
            F.min(text_col).alias(text_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(id_col, text_col, "n_copies")
    )


def sha_digest(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stable 256-bit content digest — dedup/shuffle key for 100 TB corpora
    (64-byte key instead of full documents)."""
    return docs.withColumn("digest", F.sha2(F.col(text_col), 256))


def shingles(text: F.Column, k: int = 3) -> F.Column:
    """Word k-shingles as strings ('a b c'). Sliding window via transform
    over token indices — JVM-side, no UDF."""
    toks = F.split(text, " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n >= k, F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def minhash_signature(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_k: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Adds 'signature': array of num_hashes minima of xxhash64(seed, xxhash64(shingle)).

    Shape matters: explode shingles ONCE, hash each shingle string once,
    derive the num_hashes functions from that long, then groupBy(min). The tempting
    all-higher-order-function form (array_min(transform(shingles, ...)) x32)
    re-inlines the shingle construction into every hash via projection
    collapse — measured 32x slower. Here partial aggregation (map-side
    combine) shrinks the shuffle to one row of num_hashes longs per doc
    regardless of document length — the right shape at 100 TB too.
    xxhash64 is deterministic across runs/executors/engines."""
    return docs.join(_signatures(docs, text_col, num_hashes, shingle_k, id_col), id_col)


def _signatures(
    docs: DataFrame, text_col: str, num_hashes: int, shingle_k: int, id_col: str
) -> DataFrame:
    """(id, signature) only — no join back to the document row. The LSH
    banding stage needs nothing else, so the near-dup pipeline never
    shuffles document bodies."""
    sh = docs.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), shingle_k)).alias("_sh")
    ).select(id_col, F.xxhash64("_sh").alias("_h"))
    # hash family: the variable-length shingle string is hashed ONCE; the
    # num_hashes functions then re-hash that single LONG (fixed-width
    # xxhash64 fast path). Same min-wise-independent family quality, but
    # the per-row work no longer re-encodes the string num_hashes times —
    # measured 2x on the first (codegen-compiling) run, the one the
    # benchmark and any fresh session pays.
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("_h"))).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    return (
        sh.groupBy(id_col)
        .agg(*aggs)
        .select(
            F.col(id_col),
            F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("signature"),
        )
    )


def band_signature_rows(
    with_sig: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """(id, signature) -> (id, band, band_hash) rows, one per band — the
    LSH bucket keys. Shared by the batch self-join (lsh_candidate_pairs)
    and the streaming band-store pipeline (streaming/near_dedup.py), which
    persists exactly these rows between microbatches. Carries the same
    per-row too-narrow-signature guard as lsh_candidate_pairs (see there
    for why it is per-row, not an eager probe)."""
    needed = num_bands * rows_per_band
    if needed <= 0:
        # the per-row guard below fails OPEN here: size(sig) >= 0 always
        # holds, every band slice is empty, and the join degenerates to
        # the all-pairs blowup silently (review r4)
        raise ValueError(
            f"band_signature_rows: num_bands={num_bands} x "
            f"rows_per_band={rows_per_band} must be positive"
        )
    guarded_id = F.when(F.size("signature") >= needed, F.col(id_col)).otherwise(
        F.raise_error(
            F.lit(
                f"lsh_candidate_pairs: signature narrower than {num_bands} "
                f"bands x {rows_per_band} rows — empty band slices would "
                "hash every document into one bucket (all-pairs blowup)"
            )
        )
    )
    return with_sig.withColumn(id_col, guarded_id).select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )


def lsh_candidate_pairs(
    with_sig: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """Band the signature, bucket-join on (band, band_hash): returns
    candidate (a, b) id pairs with a < b. Shuffle is keyed on band hashes —
    cardinality ~ n_docs * num_bands, never n^2.

    The signature must hold at least num_bands * rows_per_band hashes:
    a band slicing past the array end hashes an EMPTY slice, which puts
    every document in one bucket and silently degenerates the join to
    all-pairs. Guarded HERE per row at zero plan cost (review r4: the
    static check in minhash_near_dups could not protect direct callers;
    an eager head() probe cost a whole extra partial run of the
    signature pipeline — measured +1.5s on q_dedup_near): a too-narrow
    signature raises at execution instead of silently blowing up."""
    needed = num_bands * rows_per_band
    if needed <= 0:
        # the per-row guard below fails OPEN here: size(sig) >= 0 always
        # holds, every band slice is empty, and the join degenerates to
        # the all-pairs blowup silently (review r4)
        raise ValueError(
            f"lsh_candidate_pairs: num_bands={num_bands} x "
            f"rows_per_band={rows_per_band} must be positive"
        )
    banded = band_signature_rows(
        with_sig, id_col=id_col, num_bands=num_bands, rows_per_band=rows_per_band
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("a"), F.col(f"b.{id_col}").alias("b"))
        .distinct()
    )


# --- cross-engine-deterministic MinHash (q_minhash_recall) ------------------
#
# The production MinHash above hashes with xxhash64 — fast, JVM-side, but
# not reproducible in DuckDB, so its queries are rows-only. This variant
# swaps ONLY the hash family for engine-agnostic integer arithmetic (the
# q_fingerprint atoms: 7*len(token) + ascii(first char), rolled with
# FP_BASE mod FP_PRIME; affine (a*s + b) mod FP_PRIME per hash function;
# band equality on the raw signature slices instead of a band hash), so
# the candidate set — and therefore the measured recall — is EXACTLY
# reproducible in generated SQL. Same shingle semantics, same band/bucket
# structure, same explode->groupBy(min) shuffle shape as the production
# path; only the metric query uses it.

DET_MINHASH_PRIME = 1_000_000_007  # == functions.text.FP_PRIME
DET_MINHASH_BASE = 131  # == functions.text.FP_BASE


def det_minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Fixed (a_j, b_j) affine coefficients, LCG-derived from seed 42 —
    shared verbatim by the Spark operator and the generated DuckDB oracle
    so both engines evaluate the identical hash family."""
    a, c, x, out = 1_103_515_245, 12_345, 42, []
    for _ in range(num_hashes):
        x = (a * x + c) % DET_MINHASH_PRIME
        aj = x or 1  # a_j must be nonzero mod P
        x = (a * x + c) % DET_MINHASH_PRIME
        out.append((aj, x))
    return out


DET_MINHASH_TOKBASE = 1_000_003  # multiplier combining token hashes


def det_shingle_hashes(text: F.Column, k: int = 1) -> F.Column:
    """array<bigint> of engine-agnostic hashes, one per word k-shingle
    (same shingle extent as shingles(); documents shorter than k hash the
    whole token list as one shingle). Each TOKEN is hashed over its full
    character sequence (codepoint rolling polynomial — a weak len/first-
    char atom collided enough to wreck the minhash similarity estimate),
    then a shingle combines its tokens' hashes with a second multiplier.
    k=1 estimates token-SET Jaccard — the measure the near-dup verify
    stage thresholds on."""

    def char_roll(t: F.Column) -> F.Column:
        return F.aggregate(
            F.split(t, ""),
            F.lit(0).cast("long"),
            lambda acc, ch: (acc * DET_MINHASH_BASE + F.ascii(ch).cast("long"))
            % DET_MINHASH_PRIME,
        )

    def roll(sl: F.Column) -> F.Column:  # combine a shingle's token hashes
        return F.aggregate(
            sl,
            F.lit(0).cast("long"),
            lambda acc, h: (acc * DET_MINHASH_TOKBASE + h) % DET_MINHASH_PRIME,
        )

    toks = F.split(text, " ")
    th = F.transform(toks, char_roll)
    if k == 1:
        return th
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(
        n >= k, F.transform(idx, lambda i: roll(F.slice(th, i + 1, k)))
    ).otherwise(F.array(roll(th)))


def det_band_signature_rows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    num_bands: int = 8,
    shingle_k: int = 1,
) -> DataFrame:
    """(id, band, bs) rows of the deterministic MinHash — the band key is
    the raw signature SLICE (array<bigint>), reproducible in generated
    SQL. Shared by det_lsh_candidate_pairs and the streaming near-dup's
    oracle-checked variant (q_stream_near_dedup)."""
    if num_hashes % num_bands:
        raise ValueError(
            f"det_band_signature_rows: num_bands={num_bands} must divide "
            f"num_hashes={num_hashes} evenly"
        )
    rows = num_hashes // num_bands
    sh = docs.select(
        F.col(id_col),
        F.explode(det_shingle_hashes(F.col(text_col), shingle_k)).alias("_s"),
    )
    coeffs = det_minhash_coeffs(num_hashes)
    sig = sh.groupBy(id_col).agg(
        *[
            F.min((F.lit(a) * F.col("_s") + F.lit(b)) % F.lit(DET_MINHASH_PRIME)).alias(
                f"_h{j}"
            )
            for j, (a, b) in enumerate(coeffs)
        ]
    )
    bands = F.array(
        *[
            F.array(*[F.col(f"_h{b * rows + i}") for i in range(rows)])
            for b in range(num_bands)
        ]
    )
    return sig.select(F.col(id_col), F.posexplode(bands).alias("band", "bs"))


def det_lsh_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    num_bands: int = 8,
    shingle_k: int = 1,
) -> DataFrame:
    """Candidate (a, b) pairs (a < b) from the deterministic MinHash:
    signature minima via the same explode -> groupBy(min) shape as the
    production pipeline, banding joins on the raw signature SLICE (array
    equality) so no band hash enters the cross-engine contract. The
    divisibility guard lives in det_band_signature_rows (called next)."""
    banded = det_band_signature_rows(
        docs, text_col, id_col, num_hashes, num_bands, shingle_k
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bs") == F.col("b.bs"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("a"), F.col(f"b.{id_col}").alias("b"))
        .distinct()
    )


def jaccard_tokens(left_text: F.Column, right_text: F.Column) -> F.Column:
    """Exact token-set Jaccard similarity (engine-agnostic arithmetic)."""
    lt = F.array_distinct(F.split(left_text, " "))
    rt = F.array_distinct(F.split(right_text, " "))
    inter = F.size(F.array_intersect(lt, rt)).cast("double")
    union = F.size(F.array_union(lt, rt)).cast("double")
    return inter / union


def minhash_near_dups(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 32,
    num_bands: int = 8,
) -> DataFrame:
    """Full pipeline: signatures -> LSH candidates -> exact Jaccard verify.
    Returns (a, b, jaccard) pairs with jaccard >= threshold."""
    if num_hashes < num_bands:
        raise ValueError(
            f"minhash_near_dups: num_hashes={num_hashes} cannot fill "
            f"num_bands={num_bands} bands (empty band slices would hash "
            "every document into one bucket — the all-pairs blowup)"
        )
    sig = _signatures(docs, text_col, num_hashes, 3, id_col)
    pairs = lsh_candidate_pairs(sig, id_col, num_bands, num_hashes // num_bands)
    lt = docs.select(F.col(id_col).alias("a"), F.col(text_col).alias("_ta"))
    rt = docs.select(F.col(id_col).alias("b"), F.col(text_col).alias("_tb"))
    return (
        pairs.join(lt, "a")
        .join(rt, "b")
        .withColumn("jaccard", jaccard_tokens(F.col("_ta"), F.col("_tb")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def simhash(text: F.Column, bits: int = 64) -> F.Column:
    """Sign-aggregated token-hash fingerprint: bit i of the result is 1 iff
    the sum over tokens of sign(bit i of xxhash64(token)) is positive.
    Near-duplicate bags of tokens get small Hamming distances. The vote
    runs over the token BAG (review r4: an array_distinct here silently
    computed a set fingerprint — repeated-token frequency, the signal
    separating near-dups from merely overlapping vocabularies, never
    reached the votes)."""
    # hash each token ONCE into a long array, then vote over the
    # precomputed hashes: the 64 per-bit aggregates are separate lambda
    # trees, so an xxhash64(t) inside each would re-hash every token 64x
    # (review r4; same hash-once discipline as _signatures above)
    hashes = F.transform(F.split(text, " "), lambda t: F.xxhash64(t))

    def vote(bit_idx: int):
        return lambda a, h: a + F.when(
            F.shiftright(h, bit_idx).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for i in range(bits):
        votes = F.aggregate(hashes, F.lit(0).cast("long"), vote(i))
        bit = F.when(votes > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        out = out.bitwiseOR(F.shiftleft(bit, i))
    return out


# --- cross-engine-deterministic SimHash (q_simhash_recall) -------------------
#
# Same rationale as the deterministic MinHash above: the production
# simhash() votes over xxhash64 token hashes, not reproducible in DuckDB,
# so its queries are rows-only. This variant swaps ONLY the token hash for
# the q_minhash_recall character-rolling family, so the fingerprint — and
# therefore the banded Hamming candidate set and the measured recall — is
# EXACTLY reproducible in generated SQL. 24 bits: the rolling hash ranges
# over [0, FP_PRIME) < 2^30, so higher bit positions carry no entropy.

DET_SIMHASH_BITS = 24
DET_SIMHASH_BAND_BITS = 4  # 6 bands of 4 bits


def det_simhash(text: F.Column, bits: int = DET_SIMHASH_BITS) -> F.Column:
    """simhash() with det_shingle_hashes' per-token rolling hash as the
    vote source — identical bit-vote semantics (token BAG, sum of signs),
    engine-agnostic arithmetic."""
    hashes = det_shingle_hashes(text, 1)

    def vote(bit_idx: int):
        return lambda a, h: a + F.when(
            F.shiftright(h, bit_idx).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for i in range(bits):
        votes = F.aggregate(hashes, F.lit(0).cast("long"), vote(i))
        bit = F.when(votes > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        out = out.bitwiseOR(F.shiftleft(bit, i))
    return out


def det_simhash_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = DET_SIMHASH_BITS,
    band_bits: int = DET_SIMHASH_BAND_BITS,
) -> DataFrame:
    """Candidate (a, b) pairs (a < b) whose deterministic SimHash
    fingerprints agree on at least one band of ``band_bits`` contiguous
    bits — the standard banded small-Hamming-distance blocking: a pair at
    Hamming distance h misses only if every band contains a flipped bit,
    so near-dups (small h) are caught with probability ~ 1-(h*bb/bits)^nb.
    Bucket join on (band index, band value); never all-pairs."""
    if bits % band_bits:
        raise ValueError(
            f"det_simhash_candidate_pairs: band_bits={band_bits} must "
            f"divide bits={bits} evenly"
        )
    nb = bits // band_bits
    mask = (1 << band_bits) - 1
    sim = docs.select(
        F.col(id_col), det_simhash(F.col(text_col), bits).alias("_sim")
    )
    bands = F.array(
        *[
            F.shiftright(F.col("_sim"), b * band_bits).bitwiseAND(F.lit(mask))
            for b in range(nb)
        ]
    )
    banded = sim.select(F.col(id_col), F.posexplode(bands).alias("band", "bv"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("a"), F.col(f"b.{id_col}").alias("b"))
        .distinct()
    )


def remove_duplicated_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """EXACT substring-level dedup ("Deduplicating Training Data Makes
    Language Models Better", Lee et al. 2022 — the fixed-window form):
    every token covered by a k-token window that also occurs verbatim in
    ANOTHER document is removed; the survivors re-join into kept_text.
    This is the REMOVAL step on top of the q_dup_span_ratio signal: a
    corpus pass that strips boilerplate/templates document-level dedup
    can never catch.

    Returns (id, n_tokens, n_removed, kept_text).

    Scale shape: one shingle explode, one count-distinct by gram over
    xxhash64-encoded grams (16 bytes shuffled per gram instead of the
    ~40-byte string; a 64-bit collision marking a false duplicate needs
    ~2^32 distinct grams in one corpus — the same accepted tradeoff as
    det_lsh's rolling hashes), covered positions fold back per document
    as a collect_set bounded by the document's own length, and the token
    filter is a higher-order function — no Python in the hot path.

    The shingle explode multiplies per-row work ~n_tokens-fold, so the
    input is re-spread to the session parallelism when it arrives in
    fewer partitions (a single small parquet file otherwise serializes
    the whole gram build into one task — measured 1.6 s of a 4.9 s
    total at sf0.1); inputs already at/above cluster parallelism are
    left untouched."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    ts = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ts) - (k - 1)),
        lambda i: F.struct(
            i.alias("i"),
            F.xxhash64(F.array_join(F.slice(ts, i, k), " ")).alias("g"),
        ),
    )
    sh = (
        docs.filter(F.size(ts) >= k)
        .select(F.col(id_col), F.explode(grams).alias("w"))
        .select(id_col, F.col("w.i").alias("i"), F.col("w.g").alias("g"))
    )
    dup = (
        sh.groupBy("g")
        .agg(F.count_distinct(id_col).alias("_nd"))
        .filter(F.col("_nd") > 1)
        .select("g")
    )
    removed = (
        sh.join(dup, "g")
        .select(id_col, F.explode(F.sequence("i", F.col("i") + (k - 1))).alias("p"))
        .groupBy(id_col)
        .agg(F.collect_set("p").alias("_ps"))
    )
    idx = F.zip_with(
        ts, F.sequence(F.lit(1), F.size(ts)),
        lambda t, i: F.struct(t.alias("t"), i.alias("i")),
    )
    kept = F.filter(
        idx, lambda s: ~F.array_contains(F.coalesce("_ps", F.array()), s["i"])
    )
    return (
        docs.join(removed, id_col, "left")
        .select(
            id_col,
            F.size(ts).cast("long").alias("n_tokens"),
            F.coalesce(F.size("_ps"), F.lit(0)).cast("long").alias("n_removed"),
            F.array_join(
                F.transform(kept, lambda s: s["t"]), " "
            ).alias("kept_text"),
        )
    )
