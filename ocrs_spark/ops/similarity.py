"""Similarity search over the embeddings table.

- brute-force cosine top-k (the exactness baseline): broadcast the tiny
  query set against all vectors, rank with a deterministic total order;
- LSH-bucketed ANN (the scale path): random-hyperplane signatures built
  from seeded md5-derived pseudo-random planes; candidates share a
  bucket, ranked within bucket. At 100 TB the bucket join replaces the
  full cross product; the bucketing is a plain groupBy/join on a hashed
  key so it scales like any hash shuffle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load_tables

TOP_K = 5
N_QUERIES = 5
LSH_PLANES = 6  # 2^6 = 64 buckets

_DOT = "aggregate(zip_with(qe, ne, (x, y) -> cast(x AS double) * cast(y AS double)), cast(0 AS double), (acc, v) -> acc + v)"
_NQ = "sqrt(aggregate(qe, cast(0 AS double), (acc, x) -> acc + cast(x AS double) * cast(x AS double)))"
_NN = "sqrt(aggregate(ne, cast(0 AS double), (acc, x) -> acc + cast(x AS double) * cast(x AS double)))"


def ann_topk_bruteforce(spark, sf_dir):
    """Exact top-k cosine neighbors for the first N_QUERIES vectors."""
    (emb,) = load_tables(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    n = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    scored = (
        F.broadcast(q)
        .crossJoin(n)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(F.expr(f"({_DOT}) / (({_NQ}) * ({_NN}))"), 3))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


ORACLE_ANN_BRUTE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}),
n AS (SELECT vec_id AS neighbor_id, embedding AS ne FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         round(
           list_sum(list_transform(list_zip(qe, ne), z -> z[1]::DOUBLE * z[2]::DOUBLE))
           / (sqrt(list_sum(list_transform(qe, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(ne, x -> x::DOUBLE * x::DOUBLE)))),
         3) AS cos
  FROM q CROSS JOIN n WHERE query_id != neighbor_id
)
SELECT query_id, neighbor_id, rank, cos
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
      FROM scored)
WHERE rank <= {TOP_K}
"""


def _plane_expr(dim: int, plane: int) -> str:
    """Deterministic pseudo-random hyperplane component weights: for
    element i of the embedding, weight = +1 if a seeded md5 bit is set
    else -1. Same closed form on both engines."""
    # sign_i = bit0 of md5(f"{plane}:{i}") parsed as hex.
    return (
        f"aggregate(zip_with(embedding, sequence(0, {dim - 1}),"
        f" (x, i) -> cast(x AS double) * (CASE WHEN (conv(substring(md5(concat('{plane}:', i)), 1, 2), 16, 10) % 2) = 1 THEN 1.0 ELSE -1.0 END)),"
        " cast(0 AS double), (acc, v) -> acc + v)"
    )


def ann_lsh_buckets(spark, sf_dir):
    """Random-hyperplane LSH bucketing: each vector's bucket id is the
    sign pattern of LSH_PLANES seeded hyperplane projections. Returns
    bucket occupancy (the candidate-generation structure); exact rank
    within buckets is what a full ANN query would compute."""
    (emb,) = load_tables(spark, sf_dir, "embeddings")
    dim = 64
    bucket = None
    for p in range(LSH_PLANES):
        bit = F.when(F.expr(_plane_expr(dim, p)) > 0, F.lit(2 ** p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return (
        emb.withColumn("bucket", bucket.cast("long"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
    )


def _duck_plane(plane: int) -> str:
    return (
        "list_sum(list_transform(list_zip(embedding, range(0, 64)),"
        f" z -> z[1]::DOUBLE * (CASE WHEN (('0x' || substr(md5('{plane}:' || z[2]::VARCHAR), 1, 2))::BIGINT % 2) = 1 THEN 1.0 ELSE -1.0 END)))"
    )


ORACLE_ANN_LSH = (
    "SELECT bucket, count(*) AS n_vectors, min(vec_id) AS min_vec_id FROM (SELECT vec_id, ("
    + " + ".join(
        f"(CASE WHEN ({_duck_plane(p)}) > 0 THEN {2 ** p} ELSE 0 END)"
        for p in range(LSH_PLANES)
    )
    + ")::BIGINT AS bucket FROM embeddings) GROUP BY bucket"
)


IVF_CENTROIDS = 8  # deterministic "training": first K vectors are centroids
IVF_NPROBE = 2


def _cos_expr(a: str, b: str) -> str:
    dot = f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x AS double) * cast(y AS double)), cast(0 AS double), (acc, v) -> acc + v)"
    na = f"sqrt(aggregate({a}, cast(0 AS double), (acc, x) -> acc + cast(x AS double) * cast(x AS double)))"
    nb = f"sqrt(aggregate({b}, cast(0 AS double), (acc, x) -> acc + cast(x AS double) * cast(x AS double)))"
    return f"({dot}) / (({na}) * ({nb}))"


def ann_ivf_topk(spark, sf_dir):
    """IVF-style ANN: assign every vector to its nearest of K fixed
    centroids (deterministically the first K vectors), then answer each
    query by scanning only its IVF_NPROBE nearest centroid lists. At
    corpus scale the centroid assignment is a narrow broadcast pass and
    the probe is a partition-pruned scan instead of a full cross join.
    Output includes the probed-list rank (approximate by construction —
    recall vs brute force is a quality metric, not a correctness bug)."""
    (emb,) = load_tables(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < IVF_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    # Assign each vector to its nearest centroid (broadcast K rows).
    scored = (
        emb.crossJoin(F.broadcast(cent))
        .withColumn("ccos", F.expr(_cos_expr("embedding", "ce")))
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("centroid_id"))
    assigned = (
        scored.withColumn("arank", F.row_number().over(w_assign))
        .filter(F.col("arank") == 1)
        .select("vec_id", "centroid_id", "embedding")
    )
    # Queries probe their IVF_NPROBE nearest centroid lists.
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    qprobe = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cent))
        .withColumn("qcos", F.expr(_cos_expr("qe", "ce")))
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("centroid_id"))
    probes = (
        qprobe.withColumn("prank", F.row_number().over(w_probe))
        .filter(F.col("prank") <= IVF_NPROBE)
        .select("query_id", "qe", "centroid_id")
    )
    cands = (
        probes.join(assigned, "centroid_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("cos", F.round(F.expr(_cos_expr("qe", "embedding")), 3))
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank", "cos")
    )


_DUCK_COS = (
    "list_sum(list_transform(list_zip({a}, {b}), z -> z[1]::DOUBLE * z[2]::DOUBLE))"
    " / (sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))"
    " * sqrt(list_sum(list_transform({b}, x -> x::DOUBLE * x::DOUBLE))))"
)

ORACLE_ANN_IVF = f"""
WITH cent AS (SELECT vec_id AS centroid_id, embedding AS ce FROM embeddings WHERE vec_id < {IVF_CENTROIDS}),
assigned AS (
  SELECT vec_id, centroid_id, embedding FROM (
    SELECT e.vec_id, c.centroid_id, e.embedding,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_DUCK_COS.format(a='e.embedding', b='c.ce')} DESC,
                                       c.centroid_id ASC) AS arank
    FROM embeddings e CROSS JOIN cent c
  ) WHERE arank = 1
),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}),
probes AS (
  SELECT query_id, qe, centroid_id FROM (
    SELECT q.query_id, q.qe, c.centroid_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_DUCK_COS.format(a='q.qe', b='c.ce')} DESC,
                                       c.centroid_id ASC) AS prank
    FROM q CROSS JOIN cent c
  ) WHERE prank <= {IVF_NPROBE}
),
cands AS (
  SELECT p.query_id, a.vec_id,
         round({_DUCK_COS.format(a='p.qe', b='a.embedding')}, 3) AS cos
  FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id
  WHERE p.query_id != a.vec_id
)
SELECT query_id, vec_id AS neighbor_id, rank, cos
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
      FROM cands)
WHERE rank <= {TOP_K}
"""


QUERIES = {
    "ann_topk_bruteforce": ann_topk_bruteforce,
    "ann_lsh_buckets": ann_lsh_buckets,
    "ann_ivf_topk": ann_ivf_topk,
}

ORACLES = {
    "ann_topk_bruteforce": ORACLE_ANN_BRUTE,
    "ann_lsh_buckets": ORACLE_ANN_LSH,
    "ann_ivf_topk": ORACLE_ANN_IVF,
}
