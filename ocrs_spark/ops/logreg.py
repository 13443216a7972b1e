"""Distributed logistic regression by full-batch gradient descent —
the canonical iterative-ML-training plan shape (the quality-classifier
trainer of a curation pipeline, FastText/CCNet-style, reduced to its
distributed core): each iteration is ONE full scan that partially
aggregates the per-feature gradient map-side and ships exactly one row
to the driver, the driver applies the O(D) weight update, and the next
iteration's predicate is a literal-weight expression — the same
collect-the-model-only contract MLlib's `treeAggregate` loop makes.
Nothing row-shaped ever reaches the driver; at 10^12 rows per
iteration cost is a scan + map-side combine + one tiny all-reduce.

Model: y = 1 iff label < 5 (binarized from the 10-class embedding
labels), features = first D embedding dims + intercept, w init 0,
LEARNING_RATE * mean-gradient updates for ITERATIONS rounds. Floats:
features are float32 widened to float64 (exact) on BOTH engines;
intermediates run full double precision; only the OUTPUT rounds to 6
dp, far above the ~1e-12 fold-order noise of a mean over the corpus.

Output: one row per model coefficient plus the final-model training
log-loss and accuracy (constant across rows — the model card), so the
oracle pins weights AND the loss surface the weights imply.

The DuckDB oracle unrolls both gradient steps as chained CTEs over
the identical arithmetic — the honest way to oracle an iterative
numeric algorithm when the iterate count is a fixed hyperparameter.
"""

from __future__ import annotations

from pyspark.sql import functions as F

D = 4  # leading embedding dims used as features
ITERATIONS = 2
LEARNING_RATE = 4.0


def _features(spark, sf_dir: str):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cols = [
        F.element_at("embedding", j + 1).cast("double").alias(f"x{j}")
        for j in range(D)
    ]
    return emb.select(
        *cols, (F.col("label") < 5).cast("double").alias("y")
    )


def _sigmoid(z):
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def _z(w):
    z = F.lit(w[D])
    for j in range(D):
        z = z + F.lit(w[j]) * F.col(f"x{j}")
    return z


def train_logreg(spark, sf_dir: str):
    """(feature_idx, weight, train_loss, accuracy): the GD-trained
    logistic model over the leading embedding dims. feature_idx D is
    the intercept."""
    x = _features(spark, sf_dir)
    w = [0.0] * (D + 1)
    for _ in range(ITERATIONS):
        err = _sigmoid(_z(w)) - F.col("y")
        grads = x.agg(
            *[F.avg(err * F.col(f"x{j}")).alias(f"g{j}") for j in range(D)],
            F.avg(err).alias(f"g{D}"),
        ).collect()[0]
        w = [w[j] - LEARNING_RATE * grads[f"g{j}"] for j in range(D + 1)]
    p = _sigmoid(_z(w))
    metrics = x.agg(
        F.avg(
            -F.col("y") * F.log(p) - (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - p)
        ).alias("loss"),
        F.avg(((p >= 0.5).cast("double") == F.col("y")).cast("double")).alias("acc"),
    ).collect()[0]
    rows = [
        (j, round(w[j], 6), round(metrics["loss"], 6), round(metrics["acc"], 6))
        for j in range(D + 1)
    ]
    return spark.createDataFrame(
        rows, "feature_idx int, weight double, train_loss double, accuracy double"
    )


def _sql_z(w_alias: str) -> str:
    terms = " + ".join(f"{w_alias}.w{j} * x{j}" for j in range(D))
    return f"({terms} + {w_alias}.w{D})"


def _sql_grad_cte(name: str, w_alias: str) -> str:
    p = f"1.0 / (1.0 + exp(-{_sql_z(w_alias)}))"
    gs = ",\n         ".join(
        f"avg(({p} - y) * x{j}) AS g{j}" for j in range(D)
    )
    return (
        f"{name} AS (\n  SELECT {gs},\n         avg({p} - y) AS g{D}\n"
        f"  FROM x, {w_alias}\n)"
    )


def _oracle() -> str:
    feats = ", ".join(f"embedding[{j+1}]::DOUBLE AS x{j}" for j in range(D))
    w1 = ", ".join(
        f"0.0 - {LEARNING_RATE} * g{j} AS w{j}" for j in range(D + 1)
    )
    w2 = ", ".join(
        f"w1.w{j} - {LEARNING_RATE} * g{j} AS w{j}" for j in range(D + 1)
    )
    p = f"1.0 / (1.0 + exp(-{_sql_z('w2')}))"
    unnest = ", ".join(
        f"struct_pack(f := {j}, w := w2.w{j})" for j in range(D + 1)
    )
    return f"""
WITH x AS (
  SELECT {feats},
         (CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END) AS y
  FROM embeddings
),
w0 AS (SELECT {', '.join(f'0.0 AS w{j}' for j in range(D + 1))}),
{_sql_grad_cte('g1', 'w0')},
w1 AS (SELECT {w1} FROM g1),
{_sql_grad_cte('g2', 'w1')},
w2 AS (SELECT {w2} FROM g2, w1),
m AS (
  SELECT avg(-y * ln({p}) - (1.0 - y) * ln(1.0 - {p})) AS loss,
         avg(CASE WHEN (CASE WHEN {p} >= 0.5 THEN 1.0 ELSE 0.0 END) = y
                  THEN 1.0 ELSE 0.0 END) AS acc
  FROM x, w2
)
SELECT u.f AS feature_idx,
       round(u.w, 6) AS weight,
       round(m.loss, 6) AS train_loss,
       round(m.acc, 6) AS accuracy
FROM w2, m, UNNEST([{unnest}]) AS t(u)
ORDER BY feature_idx
"""


ORACLE_LOGREG = _oracle()

QUERIES = {"train_logreg_gd": train_logreg}
ORACLES = {"train_logreg_gd": ORACLE_LOGREG}
