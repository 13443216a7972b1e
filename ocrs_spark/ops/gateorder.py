"""Cost-based gate ordering — the database-classic predicate-ordering
rule applied to a curation cascade: independent filters minimize
expected evaluation cost when run in DECREASING rejection-rate-per-
cost order (the exchange argument: swapping any adjacent out-of-order
pair strictly lowers cost). ops/gatewaterfall.py reports what a FIXED
cascade does; this op computes the order the cascade SHOULD run in,
and prices the difference.

Corpus-scale work is ONE conditional aggregation (per-gate solo
rejection counts — the same single-scan shape as the waterfall). The
4-row gate model is collected (bounded-model house shape) and the
ordering/expected-volume arithmetic runs in exact Python integers:
docs entering the k-th gate, in milli-docs, is
1000 * Π pass_j div N^(k-2) under the documented independence
assumption; total expected cost milli = Σ cost_k × entering_k. The
DuckDB oracle unrolls the same pivot + explicit products in SQL —
no float product aggregate anywhere.

Per-gate costs are fixed constants (relative expression weights:
length 1, lang 2, source 3, neardup 8 — a hash beats three column
compares in cost), quantized ratios are milli-units with name
tie-break, so both engines order identically.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables
from .gatewaterfall import _GATES

GATE_COST = {"length": 1, "lang": 2, "source": 3, "neardup": 8}


def gate_order_plan(spark, sf_dir: str):
    """(position, gate, cost, solo_rejects, ratio_milli,
    entering_milli, optimal_cost_milli, naive_cost_milli) — one row
    per gate in optimal order; the two totals repeat on every row."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    aggs = [F.count("*").cast("long").alias("n")]
    for name, sql, _ in _GATES:
        aggs.append(
            F.sum(F.expr(f"CASE WHEN NOT ({sql}) THEN 1 ELSE 0 END"))
            .cast("long")
            .alias(f"rej_{name}")
        )
    row = docs.agg(*aggs).collect()[0]
    n = row["n"]
    gates = []
    for name, _, _ in _GATES:
        rej = row[f"rej_{name}"]
        cost = GATE_COST[name]
        gates.append(
            {
                "gate": name,
                "cost": cost,
                "solo_rejects": rej,
                "ratio_milli": (1_000_000 * rej) // (n * cost),
            }
        )

    def plan(order):
        entering = []
        denom_pow = 0
        passes = 1
        total = 0
        for k, g in enumerate(order):
            e = (1000 * n * passes) // (n**denom_pow) if k else 1000 * n
            entering.append(e)
            total += g["cost"] * e
            passes *= n - g["solo_rejects"]
            denom_pow += 1
        return entering, total

    optimal = sorted(
        gates, key=lambda g: (-g["ratio_milli"], g["gate"])
    )
    naive = gates  # cascade order as defined in gatewaterfall
    ent_opt, cost_opt = plan(optimal)
    _, cost_naive = plan(naive)
    out = [
        (
            k + 1,
            g["gate"],
            g["cost"],
            g["solo_rejects"],
            g["ratio_milli"],
            ent_opt[k],
            cost_opt,
            cost_naive,
        )
        for k, g in enumerate(optimal)
    ]
    return spark.createDataFrame(
        out,
        "position long, gate string, cost long, solo_rejects long, "
        "ratio_milli long, entering_milli long, optimal_cost_milli "
        "long, naive_cost_milli long",
    )


def _oracle_sql() -> str:
    rej = {
        name: f"SUM(CASE WHEN NOT ({duck}) THEN 1 ELSE 0 END)"
        for name, _, duck in _GATES
    }
    return f"""
WITH base AS (
  SELECT count(*)::BIGINT AS n,
         {", ".join(f"{v}::BIGINT AS rej_{k}" for k, v in rej.items())}
  FROM documents
),
gates AS (
  SELECT b.n, g.gate, g.cost::BIGINT AS cost, r.rej::BIGINT AS solo_rejects,
         ((1000000 * r.rej) // (b.n * g.cost))::BIGINT AS ratio_milli
  FROM base b, (
    SELECT * FROM (VALUES
      {", ".join(f"('{name}', {GATE_COST[name]})" for name, _, _ in _GATES)}
    ) AS t(gate, cost)
  ) g
  JOIN (
    SELECT 'length' AS gate, rej_length AS rej FROM base
    UNION ALL SELECT 'lang', rej_lang FROM base
    UNION ALL SELECT 'source', rej_source FROM base
    UNION ALL SELECT 'neardup', rej_neardup FROM base
  ) r USING (gate)
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY ratio_milli DESC, gate ASC)
           AS position
  FROM gates
),
piv AS (
  SELECT max(n) AS n,
         max(CASE WHEN position = 1 THEN n - solo_rejects END) AS p1,
         max(CASE WHEN position = 2 THEN n - solo_rejects END) AS p2,
         max(CASE WHEN position = 3 THEN n - solo_rejects END) AS p3,
         max(CASE WHEN position = 1 THEN cost END) AS c1,
         max(CASE WHEN position = 2 THEN cost END) AS c2,
         max(CASE WHEN position = 3 THEN cost END) AS c3,
         max(CASE WHEN position = 4 THEN cost END) AS c4
  FROM ranked
),
naive_piv AS (
  SELECT max(n) AS n,
         max(CASE WHEN gate = 'length' THEN n - solo_rejects END) AS p1,
         max(CASE WHEN gate = 'lang' THEN n - solo_rejects END) AS p2,
         max(CASE WHEN gate = 'source' THEN n - solo_rejects END) AS p3
  FROM ranked
),
vols AS (
  SELECT n,
         1000 * n AS e1,
         1000 * p1 AS e2,
         (1000 * p1 * p2) // n AS e3,
         (1000 * p1 * p2 * p3) // (n * n) AS e4,
         c1, c2, c3, c4
  FROM piv
),
opt AS (
  SELECT (c1 * e1 + c2 * e2 + c3 * e3 + c4 * e4)::BIGINT AS total
  FROM vols
),
naive AS (
  SELECT ({GATE_COST['length']} * 1000 * np.n
        + {GATE_COST['lang']} * 1000 * np.p1
        + {GATE_COST['source']} * ((1000 * np.p1 * np.p2) // np.n)
        + {GATE_COST['neardup']} * ((1000 * np.p1 * np.p2 * np.p3)
            // (np.n * np.n)))::BIGINT AS total
  FROM naive_piv np
)
SELECT r.position::BIGINT AS position, r.gate, r.cost, r.solo_rejects,
       r.ratio_milli,
       (CASE r.position WHEN 1 THEN v.e1 WHEN 2 THEN v.e2
             WHEN 3 THEN v.e3 ELSE v.e4 END)::BIGINT AS entering_milli,
       o.total AS optimal_cost_milli,
       na.total AS naive_cost_milli
FROM ranked r, vols v, opt o, naive na
"""


QUERIES = {"gate_order_plan": gate_order_plan}
ORACLES = {"gate_order_plan": _oracle_sql()}
