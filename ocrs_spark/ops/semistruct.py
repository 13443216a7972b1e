"""Semi-structured event properties through Spark 4's VARIANT type.

Event streams carry a free-form JSON ``props`` column; the lakehouse
way to query it is VARIANT: ``try_parse_json`` once into the binary
variant encoding, then ``try_variant_get`` typed extractions — no
rigid schema-on-write, no per-query string re-parsing, and malformed
records degrade to NULL instead of failing the job (the property that
matters when 10^12 events include a few million corrupt ones).

The op deterministically corrupts every 50th event's JSON before
parsing (``'{' || props`` — Spark's parser tolerates trailing garbage
after a complete value, so the corruption must break the head) so the
dirty-data path is genuinely
exercised: those rows must surface in ``n_bad`` — not crash, not
silently vanish — while the clean rows aggregate normally. The DuckDB
oracle reproduces the corruption rule with a CASE, so a Spark-side
regression in either the parse or the null-propagation goes red.
"""

from __future__ import annotations

from pyspark.sql import functions as F


CORRUPT_MOD = 50  # event_id % 50 == 0 rows get malformed JSON


def variant_props_stats(spark, sf_dir: str):
    """Per event_type stats over the VARIANT-extracted ``props.k``:
    row count, malformed count, average and max of the valid values."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    dirty = F.when(
        F.col("event_id") % CORRUPT_MOD == 0,
        F.concat(F.lit("{"), F.col("props")),
    ).otherwise(F.col("props"))
    k = F.try_variant_get(F.try_parse_json(dirty), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("k").isNull().cast("int")).alias("n_bad"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


ORACLE_VARIANT_PROPS = f"""
WITH x AS (
  SELECT event_type,
         CASE WHEN event_id % {CORRUPT_MOD} = 0 THEN NULL
              ELSE json_extract(props, '$.k')::INT
         END AS k
  FROM events
)
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
       round(avg(k), 6) AS avg_k,
       max(k) AS max_k
FROM x
GROUP BY event_type
"""


QUERIES = {
    "variant_props_stats": variant_props_stats,
}

ORACLES = {
    "variant_props_stats": ORACLE_VARIANT_PROPS,
}
