"""Join-size estimation from per-side key histograms: the exact
cardinality of ``orders ⋈ lineitem`` is Σ_k c_o(k)·c_l(k) — computable
from two key-count aggregates WITHOUT running the join, which is how
a planner (or an engineer sizing shuffle partitions) prices an
expensive join before paying for it. The same histogram product also
names the HOT keys: the keys whose per-key output would dominate a
task — the skew-advisory complement to ops/skewadvisor's report on
joins you already ran.

Output: one summary row per top-K hot key (key, left_rows,
right_rows, out_rows) plus the totals repeated on every row
(predicted_rows, distinct_join_keys) — and the prediction is EXACT,
not an estimate, because the full histograms are aggregated (at 100
TB you'd histogram a sample for the same decision; the operator shape
is identical — two groupBys bounded by distinct keys, one hash join
of the count tables, TakeOrdered top-K).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables

TOP_K = 10


def join_size_estimate(spark, sf_dir: str):
    """(key, left_rows, right_rows, out_rows, predicted_rows,
    distinct_join_keys) — top-K hot keys of orders ⋈ lineitem on
    orderkey, totals repeated per row."""
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    co = orders.groupBy(
        F.col("o_orderkey").alias("key")
    ).agg(F.count("*").cast("long").alias("left_rows"))
    cl = lineitem.groupBy(
        F.col("l_orderkey").alias("key")
    ).agg(F.count("*").cast("long").alias("right_rows"))
    prod = co.join(cl, "key").select(
        "key",
        "left_rows",
        "right_rows",
        (F.col("left_rows") * F.col("right_rows")).alias("out_rows"),
    )
    tot = prod.agg(
        F.sum("out_rows").cast("long").alias("predicted_rows"),
        F.count("*").cast("long").alias("distinct_join_keys"),
    )
    top = prod.orderBy(
        F.col("out_rows").desc(), F.col("key").asc()
    ).limit(TOP_K)
    return top.crossJoin(F.broadcast(tot)).select(
        F.col("key").cast("long").alias("key"),
        "left_rows",
        "right_rows",
        "out_rows",
        "predicted_rows",
        "distinct_join_keys",
    )


ORACLE_JOINSIZE = f"""
WITH co AS (
  SELECT o_orderkey AS key, count(*)::BIGINT AS left_rows
  FROM orders GROUP BY 1
),
cl AS (
  SELECT l_orderkey AS key, count(*)::BIGINT AS right_rows
  FROM lineitem GROUP BY 1
),
prod AS (
  SELECT key, left_rows, right_rows,
         (left_rows * right_rows)::BIGINT AS out_rows
  FROM co JOIN cl USING (key)
),
tot AS (
  SELECT sum(out_rows)::BIGINT AS predicted_rows,
         count(*)::BIGINT AS distinct_join_keys
  FROM prod
)
SELECT p.key::BIGINT AS key, p.left_rows, p.right_rows, p.out_rows,
       t.predicted_rows, t.distinct_join_keys
FROM prod p, tot t
ORDER BY p.out_rows DESC, p.key ASC
LIMIT {TOP_K}
"""


QUERIES = {"join_size_estimate": join_size_estimate}
ORACLES = {"join_size_estimate": ORACLE_JOINSIZE}
