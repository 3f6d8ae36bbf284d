"""Unit tests for dedup / similarity / multimodal operators beyond the
oracle harness: LSH recall against exact Jaccard, quantized-vs-float
cosine agreement, simhash locality, Arrow batch plumbing."""

from pyspark.sql import functions as F

from d_sparq_spark.operators import dedup as D
from d_sparq_spark.operators import multimodal as M
from d_sparq_spark.operators import similarity as S


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
        (3, "completely different text about spark engines"),
        (4, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (5, "spark engines about completely different text"),  # token-bag permutation of 3
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_min_id(spark):
    out = {r["text"]: (r["doc_id"], r["n_copies"]) for r in D.exact_dedup(_docs(spark)).collect()}
    assert out["the quick brown fox jumps over the lazy dog"] == (1, 2)
    assert len(out) == 4


def test_minhash_finds_near_dup_pair(spark):
    pairs = {(r["a"], r["b"]) for r in D.minhash_near_dups(_docs(spark), threshold=0.5).collect()}
    assert (1, 4) in pairs            # identical docs always collide
    assert (1, 2) in pairs or (2, 4) in pairs  # near-dup should be caught
    assert all(a < b for a, b in pairs)


def test_minhash_deterministic_across_runs(spark):
    docs = _docs(spark)
    s1 = D.minhash_signature(docs).select("doc_id", "signature").collect()
    s2 = D.minhash_signature(docs).select("doc_id", "signature").collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))


def test_simhash_locality(spark):
    df = _docs(spark).select("doc_id", D.simhash(F.col("text"), bits=16).alias("h"))
    h = {r["doc_id"]: r["h"] for r in df.collect()}
    assert h[1] == h[4]                       # identical text -> identical hash
    assert h[3] == h[5]                       # same token bag -> identical hash
    ham_near = bin(h[1] ^ h[2]).count("1")
    ham_far = bin(h[1] ^ h[3]).count("1")
    assert ham_near < ham_far                 # locality

def test_cosine_float_vs_quantized_agree(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r["qid"], r["rn"]): r["cid"]
        for r in S.cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=3).collect()
    }
    quant = {
        (r["qid"], r["rn"]): r["cid"]
        for r in S.scaled_int_cosine_topk(emb, F.col("vec_id") < 3, k=3).collect()
    }
    assert exact == quant


def test_ann_subset_of_exact_candidates(spark):
    import random

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") < 2)
    ann = S.ann_cosine_topk(emb, q, k=5, n_planes=2)
    rows_ann = ann.collect()
    assert len(rows_ann) > 0
    # every ANN hit must be a genuine same-bucket pair with a valid score
    assert all(-1.0001 <= r["cos"] <= 1.0001 for r in rows_ann)


def test_multimodal_batch_plumbing(spark):
    docs = _docs(spark)
    with_media = M.attach_media(docs, F.encode(F.col("text"), "UTF-8"), "image")
    feats = M.extract_features(with_media).collect()
    assert len(feats) == 5
    assert all(r["is_fake"] for r in feats)
    assert all(r["kind"] == "image" for r in feats)
    assert all(16 <= r["width"] < 80 and 16 <= r["height"] < 80 for r in feats)
    # identical content -> identical digest and identical fake features
    by_digest = {}
    for r in feats:
        by_digest.setdefault(r["digest"], set()).add((r["width"], r["height"], r["byte_len"]))
    assert all(len(v) == 1 for v in by_digest.values())


def test_ivf_ann_agrees_with_brute_force_on_probe_all(spark):
    import random

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") < 2)
    # probing ALL cells makes IVF exact -> must equal brute force
    ivf = {
        (r["qid"], r["rn"]): r["cid"]
        for r in S.ivf_cosine_topk(emb, q, k=3, n_centroids=4, n_probe=4).collect()
    }
    exact = {
        (r["qid"], r["rn"]): r["cid"]
        for r in S.cosine_topk(emb, q, k=3).collect()
    }
    assert ivf == exact


def test_multimodal_resize_and_frame_sample_stubs(spark):
    docs = _docs(spark)
    with_media = M.attach_media(docs, F.encode(F.col("text"), "UTF-8"), "video")
    resized = M.resize_stub(with_media).collect()
    assert len(resized) == 5 and all(r["resized_bytes"] == 64 * 64 * 3 for r in resized)
    frames = M.frame_sample_stub(with_media, every_n=10).collect()
    assert len(frames) >= 5 and all(r["frame_idx"] % 10 == 0 for r in frames)


def _emb(spark, n=40, dim=64, seed=7):
    import random

    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
    # plant a near-duplicate of vector 0
    rows.append((n, [x + rng.uniform(-0.01, 0.01) for x in rows[0][1]]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_near_dup_finds_planted_pair(spark):
    emb = _emb(spark)
    pairs = {(r["a"], r["b"]) for r in S.embedding_near_dup_pairs(emb, threshold=0.95).collect()}
    assert (0, 40) in pairs and all(a < b for a, b in pairs)


def test_embedding_lsh_subset_and_degenerate_equality(spark):
    emb = _emb(spark)
    exact = {(r["a"], r["b"]) for r in S.embedding_near_dup_pairs(emb, threshold=0.3).collect()}
    lsh = {(r["a"], r["b"]) for r in S.embedding_near_dups_lsh(emb, threshold=0.3, n_planes=3).collect()}
    assert lsh <= exact
    one_bucket = {
        (r["a"], r["b"]) for r in S.embedding_near_dups_lsh(emb, threshold=0.3, n_planes=0).collect()
    }
    assert one_bucket == exact
    # the planted near-identical pair must survive LSH blocking
    assert (0, 40) in lsh


def test_chunk_text_edges(spark):
    from d_sparq_spark.queries.llm_ops import chunk_text

    rows_in = [(1, "x" * 10), (2, "y" * 200), (3, "z" * 201), (4, "w" * 350)]
    df = spark.createDataFrame(rows_in, "doc_id long, text string")
    out = (
        df.select("doc_id", F.explode(chunk_text(F.col("text"))).alias("c"))
        .select("doc_id", "c.chunk_idx", "c.chunk")
        .collect()
    )
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], len(r["chunk"])))
    assert by_doc[1] == [(0, 10)]          # short doc -> one whole chunk
    assert by_doc[2] == [(0, 200)]         # exactly size -> one chunk, no tail
    assert by_doc[3] == [(0, 200), (1, 51)]   # one char past -> overlap tail
    assert by_doc[4] == [(0, 200), (1, 200)]  # window 1 covers 151..350


# --- connected components / duplicate clusters (operators/graph.py) -----------


def test_connected_components_chain_and_singleton(spark):
    # chain 1-2-3-4 (diameter 3, exercises >1 round), pair 10-11, isolated 99
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 10, 11, 99)], "node long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "u long, v long"
    )
    from d_sparq_spark.operators.graph import connected_components

    got = {r["node"]: r["comp"] for r in connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 99: 99}


def test_connected_components_cycle_and_reversed_edges(spark):
    # cycle with edges in arbitrary orientation; labels must still converge
    nodes = spark.createDataFrame([(i,) for i in (5, 6, 7, 8)], "node long")
    edges = spark.createDataFrame([(6, 5), (7, 6), (5, 8), (8, 7)], "u long, v long")
    from d_sparq_spark.operators.graph import connected_components

    got = {r["node"]: r["comp"] for r in connected_components(nodes, edges).collect()}
    assert got == {5: 5, 6: 5, 7: 5, 8: 5}


def test_dedup_clusters_sizes(spark):
    from d_sparq_spark.operators.graph import dedup_clusters

    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5)], "doc_id long")
    edges = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    rows = {r["doc_id"]: (r["component"], r["cluster_size"])
            for r in dedup_clusters(docs, edges).collect()}
    assert rows == {1: (1, 3), 2: (1, 3), 3: (1, 3), 4: (4, 1), 5: (5, 1)}


def test_lsh_cluster_edges_subset_of_exact(spark):
    """q_dup_clusters_lsh composition property: every LSH-verified edge is
    a true exact-Jaccard edge (verify step guarantees precision; LSH only
    affects recall), so LSH clusters only ever SPLIT exact clusters —
    never merge documents an exact clustering would keep apart."""
    from d_sparq_spark.operators import graph as G

    docs = _docs(spark)
    lsh_pairs = D.minhash_near_dups(docs, threshold=0.5)
    got = {(r["a"], r["b"]) for r in lsh_pairs.collect()}
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    import itertools

    def jac(x, y):
        sx, sy = set(x.split()), set(y.split())
        return len(sx & sy) / len(sx | sy)

    exact = {
        (a, b)
        for a, b in itertools.combinations(sorted(rows), 2)
        if jac(rows[a], rows[b]) >= 0.5
    }
    assert got <= exact
    assert (1, 4) in got  # exact dup must be recalled by LSH
    cc = G.dedup_clusters(docs, lsh_pairs)
    comp = {r["doc_id"]: r["component"] for r in cc.collect()}
    assert comp[1] == comp[4]  # dup pair clustered together
    assert comp[1] != comp[3]  # unrelated docs stay apart


def test_pagerank_empty_edges(spark):
    # ADVICE r2: n == 0 must yield an empty (node, rank_ppt) frame, not a
    # ZeroDivisionError
    from d_sparq_spark.operators.graph import pagerank

    empty = spark.createDataFrame([], "src string, dst string")
    out = pagerank(empty, n_iter=3)
    assert out.columns == ["node", "rank_ppt"]
    assert out.count() == 0


def test_add_extvp_absent_predicate(spark):
    # ADVICE r2: a requested predicate absent from the store must not
    # KeyError — it simply yields no reductions
    from d_sparq_spark.plans.catalog import StoreCatalog

    t = spark.createDataFrame(
        [("a", "ex:p", "b"), ("b", "ex:q", "c")], "s string, p string, o string"
    )
    cat = StoreCatalog().add_extvp(t, predicates=["ex:p", "ex:nope"])
    assert all(p1 != "ex:nope" for _, p1, _ in cat._extvp)


def test_pagerank_matches_integer_reference(spark):
    """pagerank == a pure-Python reference doing the SAME integer
    arithmetic — exact equality, no float tolerance."""
    from d_sparq_spark.operators.graph import pagerank

    EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["node"]: r["rank_ppt"] for r in pagerank(df, n_iter=10).collect()}

    SCALE, D = 10**12, 85
    nodes = sorted({x for e in EDGES for x in e})
    n = len(nodes)
    base = SCALE * (100 - D) // 100 // n
    out = {u: [v for uu, v in EDGES if uu == u] for u in nodes}
    r = {u: SCALE // n for u in nodes}
    for _ in range(10):
        in_sum = {u: 0 for u in nodes}
        for u in nodes:
            if out[u]:
                c = r[u] // len(out[u])
                for v in out[u]:
                    in_sum[v] += c
        r = {u: base + in_sum[u] * D // 100 for u in nodes}
    assert got == r
    # sink-heavy node c must outrank everything
    assert max(r, key=r.get) == "c"


def test_similarity_ops_handle_non64_dims(spark):
    # review r3: dim was hardcoded to 64 — with 8-dim vectors every
    # projection went null, every vector landed in bucket 0, and k-means
    # collapsed to one garbage centroid
    import numpy as np

    rng = np.random.RandomState(2)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.uniform(-1, 1, 8)]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    buckets = {
        r.b
        for r in emb.select(
            S.hyperplane_bucket(F.col("embedding"), 4, 8).alias("b")
        ).collect()
    }
    assert len(buckets) > 1  # projections are real, not all-null->bucket 0
    cents = S.kmeans_centroids(emb, k=3, iters=2).collect()
    assert len(cents) == 3
    assert all(len(r.c) == 8 and all(x is not None for x in r.c) for r in cents)
    ann = S.ann_cosine_topk(emb, emb.filter(F.col("vec_id") < 2), k=2)
    assert ann.count() > 0


def test_ann_recall_floor_and_determinism(spark):
    """r4 (VERDICT r3 #6): recall@3 of the multi-table quantized-int LSH
    against the exact quantized top-3 is a deterministic number (fixed
    plane matrix, integer math) — assert a floor on it, not just rows."""
    from d_sparq_spark.queries.llm_ops import q_ann_recall
    from tests.conftest import SF_SMOKE

    out = {r["qid"]: r["recall"] for r in q_ann_recall(spark, SF_SMOKE).collect()}
    assert len(out) == 5
    mean = sum(out.values()) / len(out)
    assert mean >= 0.6  # measured 0.667 at sf0.001 (0.6 at sf0.01), deterministic
    rerun = {r["qid"]: r["recall"] for r in q_ann_recall(spark, SF_SMOKE).collect()}
    assert rerun == out


def test_minhash_recall_floor_and_determinism(spark):
    """r7 (VERDICT r6 #2): MinHash-LSH recall vs the exact lang-blocked
    Jaccard >= 0.5 pair set is a deterministic number (engine-agnostic
    hash family) — assert a floor AND non-vacuity, not just rows."""
    from d_sparq_spark.queries.llm_ops import q_minhash_recall
    from tests.conftest import SF_SMOKE

    row = q_minhash_recall(spark, SF_SMOKE).collect()[0]
    assert row["n_true"] > 0  # vacuity guard (truth set non-empty)
    # measured 0.987 at sf0.001 and sf0.01; theory floor at J=0.5 with
    # 8 bands x 2 rows is 1-(1-0.25)^8 = 0.90 per pair
    assert row["recall"] >= 0.9
    rerun = q_minhash_recall(spark, SF_SMOKE).collect()[0]
    assert rerun == row


def test_simhash_recall_floor_and_determinism(spark):
    """r8 (VERDICT r7 #6): SimHash banded-Hamming recall vs the exact
    lang-blocked Jaccard >= 0.5 pair set is a deterministic number
    (engine-agnostic hash family) — assert a floor AND non-vacuity.
    SimHash estimates token-frequency COSINE, not set Jaccard, so its
    recall against a Jaccard truth set is genuinely lower than MinHash's
    0.987 — that gap is exactly what the metric is for."""
    from d_sparq_spark.queries.llm_ops import q_simhash_recall
    from tests.conftest import SF_SMOKE

    row = q_simhash_recall(spark, SF_SMOKE).collect()[0]
    assert row["n_true"] > 0  # vacuity guard (truth set non-empty)
    # measured 0.834 at sf0.001 and 0.858 at sf0.01, deterministic
    assert row["recall"] >= 0.8
    rerun = q_simhash_recall(spark, SF_SMOKE).collect()[0]
    assert rerun == row


def test_det_simhash_candidates_catch_exact_dups(spark):
    """An exact duplicate has an identical fingerprint (every band
    matches); disjoint vocabularies should separate."""
    from d_sparq_spark.operators.dedup import det_simhash_candidate_pairs

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"),
         (3, "zq xv jk wpl mnb vcx qaz")],
        "doc_id int, text string",
    )
    got = {(r["a"], r["b"]) for r in det_simhash_candidate_pairs(docs).collect()}
    assert (1, 2) in got


def test_det_lsh_candidates_catch_exact_dups(spark):
    """An exact duplicate shares every band; disjoint texts share none."""
    from d_sparq_spark.operators.dedup import det_lsh_candidate_pairs

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"),
         (3, "entirely different words here now")],
        "doc_id int, text string",
    )
    got = {(r["a"], r["b"]) for r in det_lsh_candidate_pairs(docs).collect()}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_scaled_int_ann_one_table_zero_planes_is_exact(spark):
    """n_planes=0, n_tables=1 degenerates to a single bucket == the exact
    operator (the same guarantee the float LSH path is unit-tested for)."""
    import numpy as np

    rng = np.random.RandomState(7)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.uniform(-1, 1, 8)]) for i in range(25)],
        "vec_id long, embedding array<float>",
    )
    pred = F.col("vec_id") < 3
    ann = {
        (r["qid"], r["cid"], r["rn"])
        for r in S.scaled_int_ann_topk(emb, pred, k=2, n_planes=0, n_tables=1).collect()
    }
    exact = {
        (r["qid"], r["cid"], r["rn"])
        for r in S.scaled_int_cosine_topk(emb, pred, k=2).collect()
    }
    assert ann == exact


def test_text_fns_empty_and_vt_cross_engine(spark):
    """Review r4: alpha_ratio/quality on EMPTY text must be NULL on both
    engines (Spark 0.0/0.0=NULL vs DuckDB NaN forked the oracle), and the
    BPE regex's explicit whitespace class must count a vertical-tab
    document identically in Spark and DuckDB."""
    import duckdb

    from d_sparq_spark.functions import text as T

    rows = [(1, ""), (2, "ab\x0bcd"), (3, "hello the world!")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["ar"], r["q"], r["nb"])
        for r in df.select(
            "doc_id",
            T.alpha_ratio(F.col("text")).alias("ar"),
            T.quality_score(F.col("text")).alias("q"),
            T.n_tokens_bpe(F.col("text")).alias("nb"),
        ).collect()
    }
    assert got[1][0] is None and got[1][1] is None  # empty text -> NULL, not NaN
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            f"SELECT doc_id, {T.SQL_ALPHA_RATIO.format(c='text')},"
            f" {T.SQL_QUALITY.format(c='text')},"
            f" {T.SQL_N_TOKENS_BPE.format(c='text')} FROM t"
        ).fetchall()
    }
    assert got == want


def test_lsh_candidate_pairs_rejects_narrow_signature(spark):
    """Review r4: a signature narrower than bands x rows must raise (at
    execution, via the zero-cost per-row guard) instead of silently
    hashing every document into one bucket (all-pairs blowup)."""
    import pytest

    sig = D.minhash_signature(_docs(spark), num_hashes=16)
    with pytest.raises(Exception, match="signature narrower"):
        D.lsh_candidate_pairs(sig, num_bands=8, rows_per_band=4).collect()


def test_ivf_recall_floor_and_probe_all_is_exact(spark):
    """r5 (VERDICT r4 #5): IVF recall@3 vs the exact quantized top-3 is a
    deterministic checked metric; probing ALL cells must reproduce the
    exact result set (the IVF twin degenerates to brute force)."""
    from d_sparq_spark.queries.llm_ops import q_ivf_recall
    from tests.conftest import SF_SMOKE

    out = {r["qid"]: r["recall"] for r in q_ivf_recall(spark, SF_SMOKE).collect()}
    assert len(out) == 5
    mean = sum(out.values()) / len(out)
    assert mean >= 0.8  # measured 0.933 at sf0.001 AND sf0.01, deterministic
    rerun = {r["qid"]: r["recall"] for r in q_ivf_recall(spark, SF_SMOKE).collect()}
    assert rerun == out

    from d_sparq_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    n_cells = 4
    exact = {
        (r["qid"], r["cid"], r["rn"])
        for r in S.scaled_int_cosine_topk(emb, F.col("vec_id") < 3, k=3).collect()
    }
    probe_all = {
        (r["qid"], r["cid"], r["rn"])
        for r in S.ivf_int_topk(
            emb, F.col("vec_id") < 3, k=3, n_centroids=n_cells, n_probe=n_cells
        ).collect()
    }
    assert probe_all == exact and len(exact) == 9


def test_remove_duplicated_spans_fixture(spark):
    """r8: exact substring-level dedup — tokens covered by a cross-doc
    8-token window are stripped; unique and short docs pass through."""
    from d_sparq_spark.operators.dedup import remove_duplicated_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "a b c d e f g h x y"),
            (3, "z1 z2 z3 z4 z5 z6 z7 z8 z9"),
            (4, "short text"),
        ],
        "doc_id long, text string",
    )
    got = sorted(map(tuple, remove_duplicated_spans(docs).collect()))
    assert got == [
        (1, 10, 8, "i j"),
        (2, 10, 8, "x y"),
        (3, 9, 0, "z1 z2 z3 z4 z5 z6 z7 z8 z9"),
        (4, 2, 0, "short text"),
    ]
