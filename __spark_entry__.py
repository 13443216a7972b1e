"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship interleaved-OCR pipeline on sf0.001;
``queries``/``oracle_sql`` cover the operator inventory (SURVEY.md §2):
relational orchestration analogues (explode/reweave/anti-join/metrics/
window/joins), dedup (exact, MinHash+LSH, Jaccard, SimHash, embedding
cosine), similarity search (brute-force + LSH ANN), text analysis
(lang-ID, quality, tokens, fingerprints), multimodal binary plumbing,
and the OCR pipeline itself with golden-text oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derive an interleaved text+image corpus from the flat
    sf0.001 documents table, OCR every image span through the full
    distributed pipeline (fake models — reference-validated), and weave
    the spans back in offset order."""
    from ocrs_spark.flagship import flagship_ocr

    return flagship_ocr(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ocrs_spark.flagship import (
        extraction_metrics_run,
        extraction_quarantine,
        ocr_image_span_texts,
        ocr_interleaved_pipeline,
        ocr_text_span_parity,
        stream_ocr_interleaved,
    )
    from ocrs_spark.ops import all_queries

    pool = dict(all_queries())
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    # The driver sweep records at most 50 rows, so the contract is
    # consolidated to EXACTLY 50 entries — every operator gets a hard
    # CORRECTNESS row every round. Redundant per-doc projections and
    # diagnostic intermediates are folded into their consumers, each
    # fold provably lossless:
    #   lang_id_markers + quality_score + token_counts -> text_profile
    #     (one-scan fused projection, combined oracle);
    #   simhash_docs + doc_fingerprint -> doc_signatures (joined,
    #     combined oracle);
    #   multimodal_frame_sample -> columns of multimodal_decode_meta;
    #   events_tumbling_window -> stream_tumbling_agg already proves
    #     the identical batch ORACLE_TUMBLING through streaming;
    #   minhash_lsh_buckets -> ngram_jaccard_pairs' oracle recomputes
    #     the full minhash banding in SQL (ORACLE_JACCARD);
    #   ann_lsh_buckets -> ann_topk_lsh's oracle recomputes the banded
    #     bucketing in SQL (ORACLE_ANN_LSH_TOPK).
    # Every individual query remains implemented and pytest-checked
    # against its own DuckDB oracle in tests/test_oracles.
    #
    # Tier 1 — the mandated extraction pipeline: batch flagship, its
    # incremental-streaming twin (same oracle: the stream must
    # reproduce the batch output exactly), failure isolation, and the
    # per-span golden-text rows. quarantine/metrics share one
    # materialized corpus, so they are cheap after the flagship rows.
    out["ocr_image_span_texts"] = ocr_image_span_texts
    out["ocr_text_span_parity"] = ocr_text_span_parity
    # Full end-to-end woven output, serialized per document so the
    # driver can canonicalize it (nested array<struct> is unhashable
    # in the driver's comparator) — oracle reconstructs the string.
    out["ocr_interleaved_pipeline"] = ocr_interleaved_pipeline
    out["stream_ocr_interleaved"] = stream_ocr_interleaved
    out["extraction_quarantine"] = extraction_quarantine
    out["extraction_metrics_run"] = extraction_metrics_run
    # Tier 2 — the north-rule extraction surface beyond OCR: HTML
    # boilerplate strip (expression-level AND DOM-heuristic legs), PDF
    # parse (linear, positional/layout, and mixed text+embedded-image
    # OCR), WARC crawl-archive ingest, passage-level dedup, link-graph
    # PageRank — then streaming + LLM-data-pipeline operators (dedup,
    # ANN, text analysis, multimodal, skew), the orchestration
    # analogues, the from-spec Iceberg scans the north rule mandates
    # (current snapshot + time travel, the resume evidence), and the
    # TPC-H shapes. The 50-row cap displaces the redundant TPC-H tail
    # (q6/q12/q14/q16/q17/q20, q9/q10/q15/q22, q4/q13, q19, q18, and
    # now q3/q8 — join+agg+top-N and conditional-share variants whose
    # plan families q1/q5/q7/q21 + window_topk + corpus_drift's
    # conditional aggregation keep covered; q7 carries the
    # disjunction-pushdown family) in favor of the two temporal-join
    # plan families Spark lacks natively: asof_prior_view (union+
    # running-window merge — one shuffle, zero join nodes) and
    # range_join_campaigns (no-equi-key interval join as day-bucket
    # explode + hash join + residual, never a nested-loop scan).
    # to pytest-only: extraction and corpus-curation rows are the
    # graft's core and belong in the hard signal.
    # curate_web_corpus transitively hash-pins gopher_quality_signals,
    # lm_perplexity, decontamination, and dedup_clusters in one row;
    # stream_incremental_curation is the curation resume story (growing
    # Iceberg source, frozen-model gates, cross-batch dedup state).
    # Late round-5 swaps — after these, EVERY contract row carries a
    # hard DuckDB oracle (no rows-only rows left):
    #   ann_ivf_kmeans_topk (rows-only by design; k-means IVF stays
    #     pinned by tests/test_ann_quality) -> chunk_windows (sliding
    #     token windows, fully oracled, zero-shuffle plan family);
    #   events_sessionize (batch; its SESSIONS_CTE oracle is mostly
    #     re-proven by stream_sessionize_closed) -> anchor_text_docs
    #     (markup anchor parsing + two-level heavy-hitter-safe agg);
    #   q11_important_stock (6th TPC-H representative; all 22 stay
    #     pytest-oracled) -> daily_distinct_users (exact daily
    #     distincts + the HLL-within-bound flag the oracle pins TRUE).
    # Round-5 swaps: antijoin_customers_without_orders (a 0-row result
    # — the left-anti family stays pinned through curate_training_
    # corpus and the resume ledger) -> caption_alignment_topk (pins the
    # interleaved caption mine + exact-double cosine + salted two-phase
    # top-k in one row); events_metrics_agg (multi-metric conditional
    # agg, duplicated by extraction_metrics_run + corpus_drift) ->
    # temperature_sample (grouped two-phase order-statistics selection,
    # a plan family nothing else in the contract exercises).
    # Final-round swaps — each replaces a row whose signal another
    # contract row (or chain) already carries with a strictly richer
    # one; the displaced rows stay implemented and pytest-oracled:
    #   stream_tumbling_agg -> stream_late_data_drops (the append-mode
    #     watermark row's oracle re-proves the tumbling aggregation AND
    #     pins the late-drop/held-window semantics nothing else does);
    #   dedup_exact (a 0-row left-anti result; the md5 exact-dup family
    #     stays hash-pinned through curate_web_corpus -> dedup_clusters)
    #     -> iceberg_upsert_scan (merge-on-read equality-delete MERGE +
    #     position delete — the updated-corpus read path);
    #   chunk_windows (zero-shuffle token-window expressions) ->
    #     span_corruption_samples (same expression/window family with a
    #     far more demanding oracle: deterministic masking, run
    #     collapse, sentinel renumbering, string rebuild).
    tier2 = [
        "iceberg_snapshot_scan", "iceberg_time_travel_scan",
        "html_main_content", "dom_main_content", "pdf_text_extraction",
        "pdf_layout_extraction", "pdf_mixed_extraction",
        "repeated_passage_spans", "warc_main_content", "pagerank_links",
        "stream_late_data_drops", "stream_sessionize_closed",
        "iceberg_upsert_scan", "ngram_jaccard_pairs",
        "doc_signatures", "embedding_cosine_pairs", "ann_topk_bruteforce",
        "ann_topk_lsh", "ann_ivf_topk", "span_corruption_samples", "ann_recall",
        "text_profile", "tfidf_top_terms", "multimodal_decode_meta",
        "salted_event_user_stats", "curate_training_corpus",
        "decontamination", "curate_web_corpus",
        "stream_incremental_curation", "corpus_drift",
        "explode_token_counts", "reweave_roundtrip", "anchor_text_docs",
        "caption_alignment_topk", "temperature_sample",
        "window_topk_orders_per_customer",
        "asof_prior_view", "range_join_campaigns",
        "daily_distinct_users", "q21_waiting_suppliers",
        "q1_pricing_summary", "q2_best_supplier",
        "q5_local_supplier_volume", "q7_volume_shipping",
    ]
    for name in tier2:
        out[name] = pool.pop(name)
    assert len(out) == 50, f"driver contract must be exactly 50 rows, got {len(out)}"
    # Folded/diagnostic variants stay in ocrs_spark.ops for pytest but
    # are NOT contract rows (the sweep caps at 50; see above).
    return out


def oracle_sql() -> dict[str, str]:
    from ocrs_spark.flagship import (
        ORACLE_EXTRACTION_METRICS,
        ORACLE_OCR_IMAGE_SPANS,
        ORACLE_OCR_INTERLEAVED,
        ORACLE_OCR_TEXT_SPANS,
        ORACLE_QUARANTINE,
    )
    from ocrs_spark.ops import all_oracles

    out = dict(all_oracles())
    out["ocr_image_span_texts"] = ORACLE_OCR_IMAGE_SPANS
    out["ocr_text_span_parity"] = ORACLE_OCR_TEXT_SPANS
    out["ocr_interleaved_pipeline"] = ORACLE_OCR_INTERLEAVED
    out["stream_ocr_interleaved"] = ORACLE_OCR_INTERLEAVED
    out["extraction_quarantine"] = ORACLE_QUARANTINE
    out["extraction_metrics_run"] = ORACLE_EXTRACTION_METRICS
    # Only contract rows: folded variants keep their oracles in
    # ocrs_spark.ops for pytest, but the driver pairs this dict with
    # queries(); every contract row now has an oracle.
    contract = set(queries())
    return {k: v for k, v in out.items() if k in contract}
