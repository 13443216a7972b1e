"""Site-template detection by tag-skeleton hashing: pages that share
an identical markup SKELETON (the tag sequence with all text stripped)
are instances of one site template — the structure-aware boilerplate
signal that complements content-side passage dedup (ops/passagededup)
and the DOM heuristics (ops/webdoc): a template's nav/footer repeats
structurally even when its text varies per page.

Pages are synthesized IN ENGINE EXPRESSIONS from (doc_id, source,
text): per-source header nesting (length(source) % 3 wrapper divs) and
a per-doc layout variant (desktop/mobile nav width by doc_id % 2), plus a
handful of one-off pages (doc_id % 125 == 0 gets a unique nav width)
so singleton skeletons exist and the is_template flag is exercised in
BOTH directions. The ENTIRE op is expression-level —
build page, strip text with one regexp (``>[^<]*<`` -> ``><``), md5
the skeleton, count the family — no Python UDF anywhere.

Scale: one projection + one skeleton-count groupBy (families are
bounded by #templates, not docs) + one BROADCAST join back — the
groupBy-then-broadcast shape instead of a COUNT() OVER (PARTITION BY
skeleton) window, because a dominant template (they always exist)
would funnel its whole partition through one window task.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables

TEMPLATE_MIN_POP = 20  # family size at which structure = template


def _page_expr() -> str:
    # Shared by build and oracle docs: header nesting depends on the
    # source, nav width on the doc variant, content on the text.
    return (
        "concat('<html><head><title>t</title></head><body>',"
        " repeat('<div>', 1 + length(source) % 3),"
        " '<nav>', repeat('<a>x</a>', CAST(2 + doc_id % 2"
        " + CASE WHEN doc_id % 125 = 0 THEN doc_id + 7 ELSE 0 END"
        " AS INT)),"
        " '</nav><main><p>', text, '</p></main>',"
        " repeat('</div>', 1 + length(source) % 3),"
        " '<footer><span>f</span></footer></body></html>')"
    )


def template_skeletons(spark, sf_dir: str):
    """(doc_id, skeleton_md5, template_population, is_template) — one
    row per document."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id", F.expr(_page_expr()).alias("html")
    )
    skel = pages.select(
        "doc_id",
        F.md5(
            F.regexp_replace(F.col("html"), ">[^<]*<", "><")
        ).alias("skeleton_md5"),
    )
    fam = skel.groupBy("skeleton_md5").agg(
        F.count("*").cast("long").alias("template_population")
    )
    return skel.join(F.broadcast(fam), "skeleton_md5").select(
        "doc_id",
        "skeleton_md5",
        "template_population",
        (F.col("template_population") >= TEMPLATE_MIN_POP).alias(
            "is_template"
        ),
    )


ORACLE_TEMPLATES = f"""
WITH pages AS (
  SELECT doc_id,
         '<html><head><title>t</title></head><body>'
         || repeat('<div>', 1 + length(source) % 3)
         || '<nav>' || repeat('<a>x</a>', (2 + doc_id % 2
            + CASE WHEN doc_id % 125 = 0 THEN doc_id + 7 ELSE 0 END)::INT)
         || '</nav><main><p>' || text || '</p></main>'
         || repeat('</div>', 1 + length(source) % 3)
         || '<footer><span>f</span></footer></body></html>' AS html
  FROM documents
),
skel AS (
  SELECT doc_id,
         md5(regexp_replace(html, '>[^<]*<', '><', 'g')) AS skeleton_md5
  FROM pages
),
fam AS (
  SELECT skeleton_md5, count(*)::BIGINT AS template_population
  FROM skel GROUP BY skeleton_md5
)
SELECT s.doc_id, s.skeleton_md5, f.template_population,
       f.template_population >= {TEMPLATE_MIN_POP} AS is_template
FROM skel s JOIN fam f USING (skeleton_md5)
"""


QUERIES = {"template_skeletons": template_skeletons}
ORACLES = {"template_skeletons": ORACLE_TEMPLATES}
