"""The Spark OCR pipeline: documents -> exploded image work units ->
skew-balanced vectorized OCR -> ordered span reweave.

Plan shape (SURVEY.md §3.4, mandated by the north rule):

    documents
      -> explode(spans)                      [UNNEST; unit of work = span]
      -> filter kind in (image, pdf, html)   [text spans never touch Python]
      -> left-anti join committed ledger     [resume pruning]
      -> join media payloads                 [broadcast when small]
      -> repartition(hash(doc_id, offset))   [skew: schedule ~1 image/unit,
                                              not 1 document/unit]
      -> mapInPandas(fused OCR UDF)          [decode+detect+layout+recognize
                                              per Arrow batch; detection is
                                              stacked into one NCHW run]
      -> join back + groupBy(doc_id)         [reweave]
      -> array_sort by offset -> spans       [order restored by offset]

Why fused: the decoded greyscale image feeds both detection and
recognition (the reference shares OcrInput between stages,
lib.rs:125-128); splitting stages across two UDFs would re-ship pixels
through a shuffle. Catalyst still handles pruning/pushdown/AQE for all
the relational glue around the UDF.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .codec import decode_image
from .engine import OcrEngine, OcrEngineParams
from .models import FakeDetectionModel, FakeRecognitionModel, fake_alphabet

# Result schema of the OCR UDF. n_words/n_lines feed the metrics table.
OCR_RESULT_SCHEMA = "doc_id string, offset int, ocr_text string, n_words int, n_lines int, error string"

SPAN_STRUCT = "struct<kind:string,text:string,media_ref:string,offset:int>"

# Media span kinds that flow through the extraction UDF. Dispatch is by
# payload magic bytes inside the kernel — a 'pdf' span whose payload is
# really an image still OCRs, and vice versa — so the kinds only gate
# which spans become work units.
MEDIA_KINDS = ("image", "pdf", "html")


def _looks_like_html(payload: bytes) -> bool:
    """Payload sniff for the kernel dispatch: HTML documents start with
    '<' (after optional whitespace/BOM); no supported binary image or
    PDF format does (PNG \\x89, JPEG \\xff\\xd8, RIFF 'R', RAWI/RLEI
    magics, '%PDF-')."""
    head = payload[:64]
    if head.startswith(b"\xef\xbb\xbf"):
        head = head[3:]
    return head.lstrip(b" \t\r\n").startswith(b"<")

# ----------------------------------------------------------------- engine

_ENGINE_CACHE: dict = {}


def build_engine(conf: dict) -> OcrEngine:
    """Executor-local engine singleton (one onnx/fake session per Python
    worker, mirroring the reference's cached model load,
    ocrs-cli/src/models.rs:100-107)."""
    from .malloc_tuning import pretouch_arena

    pretouch_arena()  # worker-side: image batches must reuse heap pages
    key = tuple(sorted(conf.items()))
    eng = _ENGINE_CACHE.get(key)
    if eng is None:
        if conf.get("kind", "fake") == "fake":
            eng = OcrEngine(
                OcrEngineParams(
                    detection_model=FakeDetectionModel(
                        height=int(conf.get("det_h", 200)),
                        width=int(conf.get("det_w", 100)),
                    ),
                    recognition_model=FakeRecognitionModel(),
                    alphabet=fake_alphabet(),
                )
            )
        elif conf["kind"] == "onnx":
            from .models import OnnxModel

            with open(conf["detection_path"], "rb") as f:
                det = OnnxModel(f.read())
            with open(conf["recognition_path"], "rb") as f:
                rec = OnnxModel(f.read())
            eng = OcrEngine(OcrEngineParams(detection_model=det, recognition_model=rec))
        else:
            raise ValueError(f"unknown engine kind {conf.get('kind')!r}")
        _ENGINE_CACHE[key] = eng
    return eng


def extract_payload_batch(
    engine: OcrEngine, payloads: list[bytes]
) -> tuple[list, list, list, list]:
    """Fused extraction kernel over one Arrow batch of raw payloads:
    returns parallel (texts, n_words, n_lines, errors) lists. Shared by
    the pipeline's mapInPandas UDF and the SQL-callable functions in
    ``sqlfuncs`` so both surfaces run the identical kernel."""
    n = len(payloads)
    texts = [None] * n
    n_words = [0] * n
    n_lines = [0] * n
    errors = [None] * n
    greys = [None] * n
    # Decode + normalize the whole Arrow batch first. Payloads
    # dispatch on magic bytes: born-digital PDFs are parsed
    # directly (no rasterize/OCR), HTML documents get the
    # DOM-heuristic boilerplate strip, everything else goes
    # through the image decoders into the OCR stages below.
    for i in range(n):
        try:
            payload = bytes(payloads[i])  # None/bad cells -> error row below
            if payload.startswith(b"%PDF-"):
                from .pdf import extract_pdf_text

                shown = extract_pdf_text(payload)
                texts[i] = "\n".join(shown)
                n_lines[i] = sum(1 for s in shown if s)
                n_words[i] = sum(len(s.split()) for s in shown)
            elif _looks_like_html(payload):
                from .dom import keep_block, parse_html, text_blocks

                kept = [
                    b.text
                    for b in text_blocks(
                        parse_html(payload.decode("utf-8", "replace"))
                    )
                    if keep_block(b)
                ]
                texts[i] = "\n".join(kept)
                n_lines[i] = len(kept)
                n_words[i] = sum(len(t.split()) for t in kept)
            else:
                img = decode_image(payload)
                greys[i] = engine.prepare_input(img)
        except Exception as exc:  # bad rows -> error column, task survives
            errors[i] = f"decode: {exc}"
    # ... then run detection as one stacked NCHW batch (all inputs
    # share the model's fixed H x W) ...
    ok_idx = [i for i in range(n) if greys[i] is not None]
    try:
        masks = engine.detector.detect_text_pixels_batch([greys[i] for i in ok_idx])
    except Exception as exc:
        for i in ok_idx:
            errors[i] = f"detect: {exc}"
        masks = []
        ok_idx = []
    # ... then per-image layout + recognition (sequential
    # algorithms; the parallel grain is the image/task).
    for i, mask in zip(ok_idx, masks):
        try:
            words = engine.detector.words_from_mask(mask)
            lines = engine.find_text_lines(words)
            recognized = engine.recognize_text(greys[i], lines)
            keep = [l for l in recognized if l is not None]
            texts[i] = "\n".join(l.text() for l in keep)
            n_words[i] = len(words)
            n_lines[i] = len(keep)
        except Exception as exc:
            errors[i] = f"ocr: {exc}"
    return texts, n_words, n_lines, errors


def make_ocr_udf(engine_conf: dict):
    """Fused OCR mapInPandas function over (doc_id, offset, bytes)."""

    def ocr_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        engine = build_engine(engine_conf)
        for pdf in batches:
            texts, n_words, n_lines, errors = extract_payload_batch(
                engine, list(pdf["bytes"])
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "offset": pdf["offset"].values,
                    "ocr_text": texts,
                    "n_words": n_words,
                    "n_lines": n_lines,
                    "error": errors,
                }
            )

    return ocr_batches


# ----------------------------------------------------------------- pipeline


def explode_spans(documents: DataFrame) -> DataFrame:
    """documents(doc_id, spans) -> one row per span.

    explode_outer, not explode: a document whose spans array is empty
    (or null) still yields one all-null row, so it survives the
    pipeline, reweaves to an empty spans array, and is committed to the
    resume ledger — output doc set == input doc set. Plain explode
    would silently drop such docs and re-scan them on every resume."""
    return documents.select(
        "doc_id",
        F.explode_outer("spans").alias("span"),
    ).select("doc_id", "span.kind", "span.text", "span.media_ref", "span.offset")


_BYTE_SUFFIXES = {
    "": 1, "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
    "p": 1 << 50, "pb": 1 << 50,
}


def _parse_byte_size(value: str) -> int | None:
    """Parse Spark byte-size strings ('10485760', '10m', '64MB', '-1')
    the way JavaUtils.byteStringAsBytes does. Returns None when the
    value is unparseable rather than guessing."""
    s = str(value).strip().lower()
    m = re.fullmatch(r"(-?\d+)\s*([a-z]*)", s)
    if not m or m.group(2) not in _BYTE_SUFFIXES:
        return None
    return int(m.group(1)) * _BYTE_SUFFIXES[m.group(2)]


# Broadcast decisions memoized per (application, analyzed-plan semantic
# hash, threshold): one size aggregate per distinct media table/snapshot
# per session instead of one per pipeline invocation. Values are single
# booleans (bounded); a snapshot change produces a different analyzed
# plan, hence a fresh entry. This caches a PLANNING decision, never
# query results.
_BROADCAST_DECISION_CACHE: dict[tuple, bool] = {}
_BROADCAST_AGGS_RUN = 0  # instrumentation for the plan test


def _media_fits_broadcast(media: DataFrame) -> bool:
    """Decide the fan-out strategy with one narrow aggregate over the
    payload column. Catalyst's own size estimate is unusable here
    (local relations and post-UDF nodes report placeholder stats), and
    the decision must be right at both extremes: force-broadcasting a
    TB-scale media table kills the driver, while shuffle-joining a tiny
    one makes the big span table pay an Exchange it never needed. The
    deciding aggregate reads one column of the (already deduplicated-
    by-nature) media table and is dwarfed by the OCR stage it gates."""
    spark = media.sparkSession
    raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    thresh = _parse_byte_size(raw)
    if thresh is None:  # unparseable user value: fall back to Spark's default
        thresh = 10 * 1024 * 1024
    if thresh <= 0:
        return False
    key = (
        spark.sparkContext.applicationId,
        media._jdf.queryExecution().analyzed().semanticHash(),
        thresh,
    )
    cached = _BROADCAST_DECISION_CACHE.get(key)
    if cached is not None:
        return cached
    global _BROADCAST_AGGS_RUN
    _BROADCAST_AGGS_RUN += 1
    row = media.agg(
        F.coalesce(F.sum(F.octet_length("bytes")), F.lit(0)).alias("b"),
        F.count("*").alias("n"),
    ).collect()[0]
    overhead = 64  # hashed-relation per-row key/pointer overhead
    fits = int(row.b) + overhead * int(row.n) <= thresh
    _BROADCAST_DECISION_CACHE[key] = fits
    return fits


def ocr_image_spans(
    spans: DataFrame,
    media: DataFrame,
    engine_conf: dict,
    partitions: int | None = None,
    broadcast_media: bool | None = None,
    dedup_media: bool = True,
) -> DataFrame:
    """Run OCR over the image spans. Returns
    (doc_id, offset, ocr_text, n_words, n_lines, error).

    With ``dedup_media`` (default), each distinct ``media_ref`` is OCR'd
    exactly once and the result is joined back to the referencing spans —
    at corpus scale the same image is commonly referenced by many
    documents, and model inference dwarfs the join. The unit of scheduled
    work becomes one unique image, which also flattens doc-level skew.

    ``broadcast_media=None`` (default) measures the media payload and
    broadcasts only when it fits the session's broadcast threshold —
    a corpus-scale media table falls back to the hash join + skew-salted
    repartition automatically instead of relying on a caller flag.
    """
    work = spans.filter(F.col("kind").isin(*MEDIA_KINDS)).select(
        "doc_id", "offset", "media_ref"
    )
    m = media.select("media_ref", "bytes")
    if broadcast_media is None:
        broadcast_media = _media_fits_broadcast(m)
    if broadcast_media:
        m = F.broadcast(m)
    spark = work.sparkSession
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism

    if dedup_media:
        uniq = (
            work.select("media_ref")
            .distinct()
            .join(m, "media_ref", "left")
            # Skew break: spread unique images uniformly; the OCR UDF keys
            # on media_ref here and results fan back out via the join.
            .repartition(partitions, F.xxhash64("media_ref"))
            .withColumnRenamed("media_ref", "doc_id")  # reuse UDF schema slot
            .withColumn("offset", F.lit(0))
        )
        per_media = uniq.mapInPandas(make_ocr_udf(engine_conf), schema=OCR_RESULT_SCHEMA)
        per_media = per_media.select(
            F.col("doc_id").alias("media_ref"),
            "ocr_text",
            "n_words",
            "n_lines",
            "error",
        )
        # Fan the per-unique-image results back out to the referencing
        # spans. The result rows are strictly smaller than the media
        # rows (text + counts, no pixels), so whenever the media side
        # was broadcastable the results are too — broadcast them and the
        # big span table never shuffles for this join.
        if broadcast_media:
            per_media = F.broadcast(per_media)
        return work.join(per_media, "media_ref", "left").select(
            "doc_id", "offset", "ocr_text", "n_words", "n_lines", "error"
        )

    work = work.join(m, "media_ref", "left").select("doc_id", "offset", "bytes")
    # Skew break: spread one doc's many images across all partitions.
    work = work.repartition(partitions, F.xxhash64("doc_id", "offset"))
    return work.mapInPandas(make_ocr_udf(engine_conf), schema=OCR_RESULT_SCHEMA)


def reweave(spans: DataFrame, ocr_results: DataFrame) -> DataFrame:
    """Merge OCR text into image spans and reassemble documents with
    spans ordered by offset. Output schema == input documents schema."""
    merged = spans.join(
        ocr_results.select("doc_id", "offset", "ocr_text"),
        ["doc_id", "offset"],
        "left",
    ).select(
        "doc_id",
        # Span-less docs (explode_outer null rows) map to a null struct,
        # which collect_list skips -> the doc reweaves to spans = [].
        F.when(
            F.col("kind").isNotNull(),
            F.struct(
                F.col("offset").alias("offset"),  # sort key first
                F.col("kind").alias("kind"),
                F.when(F.col("kind").isin(*MEDIA_KINDS), F.col("ocr_text"))
                .otherwise(F.col("text"))
                .alias("text"),
                F.col("media_ref").alias("media_ref"),
            ),
        ).alias("span"),
    )
    return merged.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list("span")),
            lambda s: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ).alias("spans")
    )


def ocr_documents(
    documents: DataFrame,
    media: DataFrame,
    engine_conf: dict | None = None,
    partitions: int | None = None,
    broadcast_media: bool | None = None,
) -> DataFrame:
    """Full pipeline: documents + media -> documents with image spans
    OCR'd, span order restored by offset. ``broadcast_media=None``
    sizes the media payload and picks the fan-out strategy itself."""
    engine_conf = engine_conf or {"kind": "fake"}
    spans = explode_spans(documents)
    results = ocr_image_spans(
        spans, media, engine_conf, partitions=partitions, broadcast_media=broadcast_media
    )
    return reweave(spans, results)


def extraction_errors(ocr_results: DataFrame) -> DataFrame:
    """Quarantine table of failed spans (decode/detect/ocr errors):
    per-row failures become rows here instead of killing tasks, so one
    corrupt image in a billion never fails a 100 TB job."""
    return ocr_results.filter(F.col("error").isNotNull()).select(
        "doc_id", "offset", "error"
    )


def extraction_metrics(ocr_results: DataFrame) -> DataFrame:
    """Per-run extraction metrics table (SURVEY.md §2.6)."""
    return ocr_results.agg(
        F.count("*").alias("spans"),
        F.count(F.col("error")).alias("errors"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_lines").alias("total_lines"),
        F.countDistinct("doc_id").alias("docs"),
    )


def observe_extraction(ocr_results: DataFrame):
    """Single-pass variant of extraction_metrics: attach the run metrics
    to the extraction job itself via ``df.observe``, so a 100 TB run
    reports spans/errors/words without a SECOND scan-and-OCR pass (the
    accumulator-backed metrics ride the tasks that already ran).
    Returns ``(observed_df, observation)`` — write/consume the returned
    DataFrame, then read ``observation.get`` after the action completes.

    ``docs`` is approx_count_distinct here: observe() metrics must be
    mergeable accumulator expressions, and exact distinct isn't one —
    the exact count stays available in extraction_metrics for callers
    that need it (the driver contract row uses the exact form).
    """
    from pyspark.sql import Observation

    obs = Observation("extraction")
    observed = ocr_results.observe(
        obs,
        F.count(F.lit(1)).alias("spans"),
        F.count(F.col("error")).alias("errors"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_lines").alias("total_lines"),
        F.approx_count_distinct("doc_id").alias("docs_approx"),
    )
    return observed, obs
