"""Quality-gate waterfall attribution — the filter-ablation table every
curation paper publishes (Dolma, RefinedWeb, FineWeb all report it):
for an ORDERED cascade of quality gates, how many documents does each
gate reject MARGINALLY (it is the first gate they fail), how many
would it reject SOLO (it fires regardless of order), and how many
documents survive the cascade up to and including each gate. Marginal
vs solo is the number that tells you whether a gate earns its position
or merely re-rejects what earlier gates already killed — the
waterfall complement to ``ops/gateeval.py``'s pairwise kappa.

The cascade is four deterministic gates over real corpus columns
(length floor, language allowlist, source blocklist, md5-noise
near-dup stand-in), so both engines evaluate identical predicates.
Everything is ONE conditional aggregation over one corpus scan — the
per-gate rows are built by summing indicator expressions, never by
running the cascade once per gate (a 4x scan at 100 TB) and never by
materializing per-doc gate vectors.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables
MIN_CHARS = 150
LANG_ALLOW = ("en", "de", "fr", "es")  # allowlist for an English-centric
                                       # run: zh docs fail here, so the
                                       # gate actually fires on this corpus
SOURCE_BLOCK = ("src3", "src7", "src11")  # blocklisted feeds
NOISE_MOD = 10  # hash gate rejects doc_id-hash % 10 == 0 (~10%)
_SALT = "|gate"

# cascade order: (gate name, Spark predicate SQL, DuckDB predicate SQL)
_GATES = (
    ("length", f"n_chars >= {MIN_CHARS}", f"n_chars >= {MIN_CHARS}"),
    (
        "lang",
        "lang IN ({})".format(", ".join(f"'{x}'" for x in LANG_ALLOW)),
        "lang IN ({})".format(", ".join(f"'{x}'" for x in LANG_ALLOW)),
    ),
    (
        "source",
        "source NOT IN ({})".format(
            ", ".join(f"'{x}'" for x in SOURCE_BLOCK)
        ),
        "source NOT IN ({})".format(
            ", ".join(f"'{x}'" for x in SOURCE_BLOCK)
        ),
    ),
    (
        "neardup",
        f"cast(conv(substring(md5(concat(cast(doc_id as string), '{_SALT}')), 1, 8), 16, 10) as bigint)"
        f" % {NOISE_MOD} != 0",
        f"('0x' || substr(md5(doc_id::VARCHAR || '{_SALT}'), 1, 8))::BIGINT"
        f" % {NOISE_MOD} != 0",
    ),
)


def gate_waterfall(spark, sf_dir: str):
    """One row per gate, cascade order: (gate, order_idx, n_marginal,
    n_solo, survivors_after) — all exact integer counts from a single
    conditional aggregation."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    passes = [F.expr(sql) for _, sql, _ in _GATES]
    aggs = []
    for i, (name, _, _) in enumerate(_GATES):
        upstream_ok = passes[0]
        for p in passes[1:i]:
            upstream_ok = upstream_ok & p
        first_fail = (~passes[i]) if i == 0 else (upstream_ok & ~passes[i])
        through = passes[0]
        for p in passes[1 : i + 1]:
            through = through & p
        aggs += [
            F.sum(first_fail.cast("long")).alias(f"marginal_{i}"),
            F.sum((~passes[i]).cast("long")).alias(f"solo_{i}"),
            F.sum(through.cast("long")).alias(f"after_{i}"),
        ]
    wide = docs.agg(*aggs)
    cols = []
    for i, (name, _, _) in enumerate(_GATES):
        cols.append(
            F.struct(
                F.lit(name).alias("gate"),
                F.lit(i).cast("long").alias("order_idx"),
                F.col(f"marginal_{i}").alias("n_marginal"),
                F.col(f"solo_{i}").alias("n_solo"),
                F.col(f"after_{i}").alias("survivors_after"),
            )
        )
    return (
        wide.select(F.explode(F.array(*cols)).alias("g"))
        .select("g.gate", "g.order_idx", "g.n_marginal", "g.n_solo", "g.survivors_after")
    )


def _oracle_sql() -> str:
    duck = [d for _, _, d in _GATES]
    rows = []
    for i, (name, _, _) in enumerate(_GATES):
        upstream = " AND ".join(duck[:i]) if i else None
        first_fail = (
            f"({upstream}) AND NOT ({duck[i]})" if upstream else f"NOT ({duck[i]})"
        )
        through = " AND ".join(f"({d})" for d in duck[: i + 1])
        rows.append(
            f"SELECT '{name}' AS gate, CAST({i} AS BIGINT) AS order_idx, "
            f"CAST(SUM(CASE WHEN {first_fail} THEN 1 ELSE 0 END) AS BIGINT) AS n_marginal, "
            f"CAST(SUM(CASE WHEN NOT ({duck[i]}) THEN 1 ELSE 0 END) AS BIGINT) AS n_solo, "
            f"CAST(SUM(CASE WHEN {through} THEN 1 ELSE 0 END) AS BIGINT) AS survivors_after "
            f"FROM documents"
        )
    return " UNION ALL ".join(rows)


QUERIES = {"gate_waterfall": gate_waterfall}
ORACLES = {"gate_waterfall": _oracle_sql()}
