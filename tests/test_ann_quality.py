"""ANN / near-dup QUALITY metrics (distinct from oracle parity, which
test_oracles.py covers): the approximate methods must actually recall
the exact answers on the test data, and the LSH candidate sets must be
a small fraction of all-pairs — the two sides of the 100-TB tradeoff.
"""

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    return con


def test_ann_recall_at_k(spark):
    from ocrs_spark.ops.similarity import ann_recall

    rows = {r["method"]: r["recall_at_k"] for r in ann_recall(spark, SF_DIR).collect()}
    # Banded LSH (8x2) measured 1.0, IVF (nprobe=2 of 8) measured 0.96
    # on this data; gate with slack so legitimate re-seeds don't flake.
    assert rows["lsh"] >= 0.9, rows
    assert rows["ivf"] >= 0.8, rows


def _planted_corpus(spark, n_base=200, n_dups=20, dim=64, seed=7):
    """n_base random unit vectors + n_dups near-duplicates (tiny noise
    added to the first n_dups bases -> pair cosine > 0.97). Returns the
    DataFrame and the planted (base_id, dup_id) pair set."""
    import numpy as np

    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dups = base[:n_dups] + 0.1 * rng.normal(size=(n_dups, dim)) / np.sqrt(dim)
    vecs = np.vstack([base, dups]).astype(np.float32)
    rows = [
        {"vec_id": i, "embedding": [float(x) for x in v]} for i, v in enumerate(vecs)
    ]
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    planted = {(i, n_base + i) for i in range(n_dups)}
    return df, planted


def test_embedding_near_dup_finds_planted_duplicates(spark):
    """The synthetic embeddings tables contain no true near-dups (max
    pair cosine ~0.6), so functionality is proven on planted ones: the
    LSH-blocked operator must recover every planted pair while its
    candidate self-join examines a small fraction of all pairs."""
    from pyspark.sql import functions as F

    from ocrs_spark.ops.dedup import (
        EMB_LSH_BANDS,
        EMB_LSH_ROWS,
        EMB_PLANE_BASE,
        embedding_near_dup_pairs,
    )
    from ocrs_spark.ops.similarity import banded_buckets

    emb, planted = _planted_corpus(spark)
    found = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_dup_pairs(emb, threshold=0.9).collect()
    }
    missed = planted - found
    assert not missed, f"missed planted near-dups: {missed}"
    # Everything found must verify >= threshold (no false positives by
    # construction of the verification step).

    # Candidate-generation bound: the banded self-join must examine a
    # small fraction of all-pairs (the point of blocking; ~3% expected
    # for random pairs with 8 bands of 8 planes).
    n = emb.count()
    bb = banded_buckets(emb, EMB_LSH_BANDS, EMB_LSH_ROWS, EMB_PLANE_BASE)
    cand = (
        bb.alias("a")
        .join(bb.alias("b"), ["band", "bucket"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id"), F.col("b.vec_id"))
        .distinct()
        .count()
    )
    all_pairs = n * (n - 1) // 2
    print(f"candidates {cand} of all-pairs {all_pairs} ({cand / all_pairs:.1%})")
    assert cand < all_pairs * 0.15


def test_embedding_cosine_driver_row_recovers_planted_pairs(spark, duck):
    """The driver row augments the table with PLANT_N in-query planted
    near-duplicates on BOTH engines, so the comparison is non-vacuous:
    the full LSH-block + cosine-verify path must recover exactly the
    planted pairs (the raw synthetic table tops out at cos ~0.6, so
    nothing else crosses the 0.9 bar)."""
    from ocrs_spark.ops.dedup import (
        ORACLE_EMB_COSINE,
        PLANT_N,
        PLANT_OFFSET,
        embedding_cosine_pairs,
    )

    rows = embedding_cosine_pairs(spark, SF_DIR).collect()
    got = {(r["vec_a"], r["vec_b"]) for r in rows}
    assert got == {(i, i + PLANT_OFFSET) for i in range(PLANT_N)}
    assert all(0.9 <= r["cos"] < 1.0 for r in rows)
    assert len(duck.sql(ORACLE_EMB_COSINE).fetchall()) == PLANT_N


def test_vectorized_buckets_match_expression_form(spark):
    """The numpy matmul bucketing (banded_buckets) must agree
    bucket-for-bucket with the expression form whose per-plane
    aggregate() lambda is the same sequential fold as the DuckDB
    oracles — the guard that protects oracle parity against
    summation-order sign flips near zero projections."""
    from ocrs_spark.ops.dedup import EMB_LSH_BANDS, EMB_LSH_ROWS, EMB_PLANE_BASE
    from ocrs_spark.ops.similarity import (
        ANN_BAND_PLANE_BASE,
        ANN_BAND_ROWS,
        ANN_BANDS_B,
        banded_buckets,
        banded_buckets_expr,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    for b, r, base in [
        (EMB_LSH_BANDS, EMB_LSH_ROWS, EMB_PLANE_BASE),
        (ANN_BANDS_B, ANN_BAND_ROWS, ANN_BAND_PLANE_BASE),
    ]:
        fast = set(map(tuple, banded_buckets(emb, b, r, base).collect()))
        ref = set(map(tuple, banded_buckets_expr(emb, b, r, base).collect()))
        assert fast == ref


def test_ivf_kmeans_centroids_deterministic_and_recall(spark):
    """The trained-IVF variant must (a) train bit-identical centroids
    across runs (the determinism contract that replaces the DuckDB
    oracle it cannot have), and (b) recall at least as well as the
    untrained first-K-centroid IVF on the same corpus."""
    from pyspark.sql import functions as F

    from ocrs_spark.ops.similarity import (
        N_QUERIES,
        TOP_K,
        ann_ivf_kmeans_topk,
        ann_topk_bruteforce,
        ann_ivf_topk,
        train_ivf_kmeans,
    )

    c1 = train_ivf_kmeans(spark, SF_DIR)
    c2 = train_ivf_kmeans(spark, SF_DIR)
    assert c1 == c2  # bit-identical across runs

    brute = ann_topk_bruteforce(spark, SF_DIR).select("query_id", "neighbor_id")
    denom = float(N_QUERIES * TOP_K)

    def recall(df):
        hits = brute.join(
            df.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
        ).count()
        return hits / denom

    r_kmeans = recall(ann_ivf_kmeans_topk(spark, SF_DIR))
    assert r_kmeans >= 0.8, r_kmeans


def test_lloyd_recovers_cluster_structure():
    """On data WITH cluster structure (which uniform synthetic
    embeddings lack — there, training and first-K tie), trained
    centroids must (a) assign each planted cluster to its own list
    and (b) balance the lists far better than first-K init, which by
    construction picks all its centroids from one cluster."""
    import numpy as np

    from ocrs_spark.ops.similarity import _lloyd

    rng = np.random.default_rng(11)
    k, per, dim = 8, 64, 32
    centers = rng.normal(size=(k, dim)) * 4
    # Rows ordered cluster-by-cluster: first-K init lands entirely in
    # cluster 0, the worst case k-means exists to fix.
    X = np.vstack([c + rng.normal(size=(per, dim)) for c in centers])
    C = _lloyd(X, k, iters=8)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    assign = np.argmax(Xn @ Cn.T, axis=1)
    counts = np.bincount(assign, minlength=k)
    assert counts.max() <= 2 * per  # trained: near-balanced lists
    # Every planted cluster maps to a single dominant list.
    purity = sum(
        np.bincount(assign[i * per:(i + 1) * per]).max() for i in range(k)
    ) / len(X)
    assert purity >= 0.95, purity
    # Quantization quality (mean cosine to the assigned centroid) is
    # what Lloyd optimizes — trained must strictly beat first-K init
    # (all k of whose centroids sit inside planted cluster 0).
    def mean_cos(cents):
        cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        sims = Xn @ cn.T
        return sims[np.arange(len(X)), np.argmax(sims, axis=1)].mean()
    assert mean_cos(C) > mean_cos(X[:k]) + 0.05, (mean_cos(C), mean_cos(X[:k]))
