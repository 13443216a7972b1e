"""Query/operator library over the driver test tables.

Each module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB SQL producing identical rows,
column names aliased to match; floats rounded identically on both sides
so order-insensitive value hashes agree).

``all_queries()`` / ``all_oracles()`` merge every module for
``__spark_entry__``.
"""

from __future__ import annotations


def load_tables(spark, sf_dir: str, *names: str):
    """Read the requested parquet tables as DataFrames."""
    return [spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names]


def all_queries():
    from . import (
        anchortext,
        bitext,
        bloomskip,
        chunking,
        bootstrap,
        bpe,
        captions,
        cdc,
        classeval,
        cooccur,
        crawlplan,
        dedup,
        curastream,
        denoise,
        dpp,
        dsir,
        kmv,
        semistruct,
        drift,
        funnel,
        fuzzyjoin,
        curation,
        decontam,
        dedupgraph,
        gopher,
        hllrollup,
        heavyhitters,
        hostrep,
        hybrid,
        icebergops,
        imagededup,
        ireval,
        ivm,
        linkgraph,
        lmscore,
        mixture,
        multimodal,
        nbclassify,
        negatives,
        novelty,
        ocreval,
        packing,
        pdfmixed,
        pii,
        postings,
        pq,
        profiling,
        quantiles,
        quota,
        relational,
        retrieval,
        robotsops,
        scd2,
        semdedup,
        shardexport,
        similarity,
        splits,
        skew,
        skewadvisor,
        skyline,
        streamrows,
        substrdedup,
        warehouse,
        timeseries,
        temporal,
        textstats,
        trend,
        triangles,
        urlnorm,
        webarchive,
        webdoc,
        zipf,
        zorder,
    )

    out = {}
    for mod in (relational, anchortext, bitext, bloomskip, chunking, hllrollup, bootstrap, bpe, captions, cdc, classeval, cooccur, gopher, lmscore, dedup, decontam, curation, curastream, denoise, dpp, dsir, kmv, semistruct, drift, funnel, fuzzyjoin, heavyhitters, hybrid, ireval, dedupgraph, imagededup, ivm, semdedup, nbclassify, negatives, similarity, skyline, textstats, trend, mixture, multimodal, novelty, zipf, skew, skewadvisor, pii, postings, pq, ocreval, profiling, quantiles, quota, retrieval, shardexport, packing, streamrows, substrdedup, warehouse, timeseries, splits, hostrep, triangles, temporal, scd2, webdoc, pdfmixed, webarchive, icebergops, linkgraph, crawlplan, urlnorm, robotsops, zorder):
        out.update(mod.QUERIES)
    return out


def all_oracles():
    from . import (
        anchortext,
        bitext,
        bloomskip,
        chunking,
        bootstrap,
        bpe,
        captions,
        cdc,
        classeval,
        cooccur,
        crawlplan,
        dedup,
        curastream,
        denoise,
        dpp,
        dsir,
        kmv,
        semistruct,
        drift,
        funnel,
        fuzzyjoin,
        curation,
        decontam,
        dedupgraph,
        gopher,
        hllrollup,
        heavyhitters,
        hostrep,
        hybrid,
        icebergops,
        imagededup,
        ireval,
        ivm,
        linkgraph,
        lmscore,
        mixture,
        multimodal,
        nbclassify,
        negatives,
        novelty,
        ocreval,
        packing,
        pdfmixed,
        pii,
        postings,
        pq,
        profiling,
        quantiles,
        quota,
        relational,
        retrieval,
        robotsops,
        scd2,
        semdedup,
        shardexport,
        similarity,
        splits,
        skew,
        skewadvisor,
        skyline,
        streamrows,
        substrdedup,
        warehouse,
        timeseries,
        temporal,
        textstats,
        trend,
        triangles,
        urlnorm,
        webarchive,
        webdoc,
        zipf,
        zorder,
    )

    out = {}
    for mod in (relational, anchortext, bitext, bloomskip, chunking, hllrollup, bootstrap, bpe, captions, cdc, classeval, cooccur, gopher, lmscore, dedup, decontam, curation, curastream, denoise, dpp, dsir, kmv, semistruct, drift, funnel, fuzzyjoin, heavyhitters, hybrid, ireval, dedupgraph, imagededup, ivm, semdedup, nbclassify, negatives, similarity, skyline, textstats, trend, mixture, multimodal, novelty, zipf, skew, skewadvisor, pii, postings, pq, ocreval, profiling, quantiles, quota, retrieval, shardexport, packing, streamrows, substrdedup, warehouse, timeseries, splits, hostrep, triangles, temporal, scd2, webdoc, pdfmixed, webarchive, icebergops, linkgraph, crawlplan, urlnorm, robotsops, zorder):
        out.update(mod.ORACLES)
    return out
