#!/usr/bin/env python
"""Round-6 optimization harness (guide §1): per-query isolation with the
noop sink, best-of-K timing, and .explain("formatted") capture.

Usage:
    python bench_extra.py time  q16_supplier_part_counts exact_jaccard_join
    python bench_extra.py time  --repeats 3 --all-slow
    python bench_extra.py plan  q16_supplier_part_counts [suffix]
    python bench_extra.py time --out /tmp/t.json name1 name2 ...

``bench.py`` stays frozen (driver measurement contract); this file only
exists so optimization iterations don't pay the full 200-query +
OCR-scaling-probe cost per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# The 25 most expensive headline queries per BENCH_r05.json (driver run).
SLOW = [
    "exact_jaccard_join",
    "curate_web_corpus",
    "crawl_depth_bfs",
    "lsh_band_calibration",
    "nb_lang_classifier",
    "gate_agreement_kappa",
    "cdc_chunk_dedup",
    "image_dedup_clusters",
    "char_entropy_gate",
    "incremental_neardup",
    "kmv_crawl_overlap",
    "canonical_resolution",
    "bitext_margin_pairs",
    "passage_dedup",
    "q7_volume_shipping",
    "dsir_importance_sample",
    "image_dhash_pairs",
    "heavy_hitter_tokens",
    "fuzzy_entity_match",
    "ccnet_perplexity_buckets",
    "q5_local_supplier_volume",
    "watermark_disorder_stats",
    "source_overlap_matrix",
    "gopher_quality_signals",
    "pdf_mixed_extraction",
    "q16_supplier_part_counts",
    "posting_compression",
    "percolate_matches",
    "embedding_cosine_pairs",
    "hits_scores",
    "semantic_dedup",
    "label_propagation",
    "q3_shipping_priority",
    "q2_best_supplier",
    "q21_waiting_suppliers",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _session_and_queries():
    from ocrs_spark.session import get_spark

    import __spark_entry__ as entry_mod
    from ocrs_spark.ops import all_queries

    spark = get_spark(app_name="ocrs_spark_bench_extra")
    spark.sparkContext.setLogLevel("ERROR")
    queries = {**all_queries(), **entry_mod.queries()}
    return spark, queries


def _warm(spark, queries, sf_dir):
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    _force(queries["q6_forecast_revenue"](spark, sf_dir))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    def _warm_worker(batches):
        from ocrs_spark.pipeline import build_engine

        build_engine({"kind": "fake"})
        yield from batches

    _force(
        spark.range(cores * 100)
        .repartition(cores)
        .mapInPandas(_warm_worker, schema="id long")
    )
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")


def cmd_time(argv):
    repeats = 2
    out_path = None
    names = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--repeats":
            repeats = int(argv[i + 1]); i += 2
        elif a == "--out":
            out_path = argv[i + 1]; i += 2
        elif a == "--all-slow":
            names.extend(SLOW); i += 1
        else:
            names.append(a); i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark, queries = _session_and_queries()
    _warm(spark, queries, sf_dir)
    timings = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            _force(queries[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"{name}: {timings[name]}", file=sys.stderr, flush=True)
    spark.stop()
    line = json.dumps({"timings": timings, "total": round(sum(timings.values()), 3)})
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line)


def cmd_plan(argv):
    names = [a for a in argv if not a.startswith("--")]
    suffix = "before"
    for a in argv:
        if a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark, queries = _session_and_queries()
    outdir = os.path.join(REPO, "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return
    cmd, argv = sys.argv[1], sys.argv[2:]
    if cmd == "time":
        cmd_time(argv)
    elif cmd == "plan":
        cmd_plan(argv)
    else:
        raise SystemExit(f"unknown command {cmd}")


if __name__ == "__main__":
    main()
