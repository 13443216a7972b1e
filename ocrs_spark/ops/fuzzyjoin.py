"""Fuzzy entity matching (entity resolution): link dirty entity
mentions to their canonical records by edit distance, with PIGEONHOLE
blocking — the PassJoin family's guarantee (Li et al., VLDB 2011):
split every name into q+1 segments and any pair within edit distance q
must agree EXACTLY on at least one segment, so an equi-join per
segment finds every true match by construction. No all-pairs
comparison, no probabilistic recall.

Here q=1 (single-character corruptions), so names split into halves:
the dirty and canonical sides equi-join on (first half) and on (last
half), union, distinct — two hash joins whose block sizes are bounded
by the name distribution (64 half-values over the synthetic entity
space, ~N/64 names per block), then the survivor pairs verify with
Levenshtein <= 1, a builtin on both engines. At 10^12 mentions this
is the shape entity resolution actually runs: segment equi-joins
shuffle on uniformly-distributed substring keys, verification is
candidates-only.

Entities are synthesized deterministically from c_custkey as base-8
syllable names (each key < 4096 maps to a unique 8-char name); the
dirty side corrupts position (key % 8) + 1 to 'x' — 'x' appears in no
syllable, so every planted pair is at distance exactly 1, and pytest
asserts the blocking recovers 100% of them (the pigeonhole guarantee
made observable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables

_SYLS = ("ka", "ro", "mi", "ta", "lu", "ve", "so", "ne")
MAX_DIST = 1


def _syl(expr: str, shift: int) -> str:
    whens = " ".join(f"WHEN {i} THEN '{s}'" for i, s in enumerate(_SYLS))
    return f"CASE CAST((({expr}) {shift}) % 8 AS INT) {whens} END"


def _canon_name(key: str, div: str) -> str:
    parts = [
        _syl(key, ""),
        _syl(key, f"{div} 8"),
        _syl(key, f"{div} 64"),
        _syl(key, f"{div} 512"),
    ]
    return "concat(" + ", ".join(parts) + ")"


def _dirty_name(name: str, key: str) -> str:
    p = f"(CAST(({key}) % 8 AS INT) + 1)"
    return (
        f"concat(substr({name}, 1, {p} - 1), 'x', substr({name}, {p} + 1, 8))"
    )


def entity_tables(cust: DataFrame):
    canon = cust.select(
        F.col("c_custkey").alias("canon_key"),
        F.expr(_canon_name("c_custkey", "div")).alias("canon_name"),
    )
    dirty = canon.select(
        F.col("canon_key").alias("dirty_key"),
        F.expr(_dirty_name("canon_name", "canon_key")).alias("dirty_name"),
    )
    return dirty, canon


def fuzzy_match(dirty: DataFrame, canon: DataFrame, max_dist: int = MAX_DIST) -> DataFrame:
    """Pigeonhole-blocked edit-distance join: (dirty_key, canon_key,
    dist) for every pair with levenshtein <= max_dist."""
    d = dirty.select(
        "dirty_key",
        "dirty_name",
        F.substring("dirty_name", 1, 4).alias("h1"),
        F.substring("dirty_name", 5, 4).alias("h2"),
    )
    c = canon.select(
        "canon_key",
        "canon_name",
        F.substring("canon_name", 1, 4).alias("h1"),
        F.substring("canon_name", 5, 4).alias("h2"),
    )
    cand = (
        d.join(c.drop("h2"), "h1")
        .select("dirty_key", "dirty_name", "canon_key", "canon_name")
        .unionByName(
            d.join(c.drop("h1"), "h2").select(
                "dirty_key", "dirty_name", "canon_key", "canon_name"
            )
        )
    )
    # r6, two equivalences that move all heavy work off the fat pair
    # stream: (1) threshold-bounded levenshtein (Spark 3.5+) — banded
    # O(len * k) instead of the full O(len^2) matrix; -1 above the
    # threshold makes `>= 0` exactly the former `<= max_dist` filter
    # with identical kept distances; (2) dedup AFTER the filter — a
    # deterministic value filter commutes with DISTINCT, so the
    # exchange dedups the ~hundreds of surviving rows instead of the
    # millions of blocked candidate pairs (measured 3.5M pairs at
    # sf0.1, zero of them duplicated before the filter).
    return (
        cand.withColumn(
            "dist",
            F.levenshtein("dirty_name", "canon_name", max_dist).cast("int"),
        )
        .filter(F.col("dist") >= 0)
        .select("dirty_key", "canon_key", "dist")
        .distinct()
    )


def fuzzy_entity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    (cust,) = load_tables(spark, sf_dir, "customer")
    dirty, canon = entity_tables(cust)
    return fuzzy_match(dirty, canon)


_DUCK_CANON = _canon_name("c_custkey", "//")

ORACLE_FUZZY_MATCH = f"""
WITH canon AS (
  SELECT c_custkey AS canon_key, {_DUCK_CANON} AS canon_name FROM customer
),
dirty AS (
  SELECT canon_key AS dirty_key,
         concat(substr(canon_name, 1, (canon_key % 8)::INT),
                'x',
                substr(canon_name, (canon_key % 8)::INT + 2, 8)) AS dirty_name
  FROM canon
),
d AS (
  SELECT *, substr(dirty_name, 1, 4) AS h1, substr(dirty_name, 5, 4) AS h2
  FROM dirty
),
c AS (
  SELECT *, substr(canon_name, 1, 4) AS h1, substr(canon_name, 5, 4) AS h2
  FROM canon
),
cand AS (
  SELECT DISTINCT dirty_key, dirty_name, canon_key, canon_name
  FROM (
    SELECT d.dirty_key, d.dirty_name, c.canon_key, c.canon_name
    FROM d JOIN c ON d.h1 = c.h1
    UNION ALL
    SELECT d.dirty_key, d.dirty_name, c.canon_key, c.canon_name
    FROM d JOIN c ON d.h2 = c.h2
  )
)
SELECT dirty_key, canon_key, levenshtein(dirty_name, canon_name)::INT AS dist
FROM cand
WHERE levenshtein(dirty_name, canon_name) <= {MAX_DIST}
"""


QUERIES = {"fuzzy_entity_match": fuzzy_entity_match}
ORACLES = {"fuzzy_entity_match": ORACLE_FUZZY_MATCH}
