"""P2 ``.doc`` analogue: raw HTML → link/media/title spans, JVM-side.

The reference turns a response into absolutized links via
PyQuery/lxml (``response.doc`` + ``make_links_absolute``,
/root/reference/pyspider/libs/response.py:139-163) and handlers iterate
``response.doc('a[href]')``. Re-expressed Spark-first: href/src/title
extraction is ``regexp_extract_all`` / ``regexp_extract`` — pure JVM
expressions inside whole-stage codegen, no Python, no DOM — and the
emitted spans carry the RAW hrefs; absolutization against the page URL
happens exactly where it already lives for span corpora:
``extract_links`` → ``urlkit.canonical(href, base)`` (P3/P4). Raw HTML
therefore flows into the crawl loop unchanged — ``documents_from_html``
(decoded text) or ``documents_from_raw`` (bytes + charset detection via
functions.response, the P2 kernel) produce the same
(doc_id, spans) shape as the synthetic corpus.

Extraction is mechanical, like the reference's doc('a') loop: quote
variants (double/single/unquoted), attribute case, and javascript:/
mailto: hrefs are all surfaced; routing/fetching decides what to do with
them (a canonicalized unfetchable URL 404s like any other miss).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# value = group 1: "..." | '...' | bare-token (stops at whitespace or >)
_HREF_RE = r"""(?is)<a\s[^>]*?href\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)"""
_SRC_RE = (
    r"""(?is)<(?:img|script|iframe|source|video|audio|embed)\s"""
    r"""[^>]*?src\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)"""
)
_TITLE_RE = r"(?is)<title[^>]*>\s*(.*?)\s*</title>"

_SPAN_T = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"


def _unquote(v: Column) -> Column:
    return F.regexp_replace(v, r"""^["']|["']$""", "")


def html_hrefs(html: Column) -> Column:
    """All <a href> values in document order (raw, unresolved)."""
    return F.transform(
        F.regexp_extract_all(html, F.lit(_HREF_RE), F.lit(1)), _unquote
    )


def html_srcs(html: Column) -> Column:
    """All media/script src values in document order (raw, unresolved)."""
    return F.transform(
        F.regexp_extract_all(html, F.lit(_SRC_RE), F.lit(1)), _unquote
    )


def html_title(html: Column) -> Column:
    return F.regexp_extract(html, _TITLE_RE, 1)


def html_spans(html: Column) -> Column:
    """Interleaved-span projection of an HTML document: one text span (the
    <title>, offset 0), link spans (offsets 1..n in document order), media
    spans after. Same shape as the synthetic corpus — P3 explodes it
    without knowing the source was raw HTML."""
    hrefs = html_hrefs(html)
    srcs = html_srcs(html)
    title_span = F.array(
        F.struct(
            F.lit("text").alias("kind"),
            html_title(html).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).alias("offset"),
        )
    )
    link_spans = F.transform(
        hrefs,
        lambda h, i: F.struct(
            F.lit("link").alias("kind"),
            h.alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            (i + F.lit(1)).cast("int").alias("offset"),
        ),
    )
    media_spans = F.transform(
        srcs,
        lambda m, i: F.struct(
            F.lit("media").alias("kind"),
            F.lit(None).cast("string").alias("text"),
            m.alias("media_ref"),
            (F.size(hrefs) + i + F.lit(1)).cast("int").alias("offset"),
        ),
    )
    return F.concat(title_span, link_spans, media_spans).cast(_SPAN_T)


def documents_from_html(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, html-text) → the corpus shape crawl() consumes."""
    return df.select(
        F.col(url_col).alias("doc_id"), html_spans(F.col(html_col)).alias("spans")
    )


def documents_from_raw(
    df: DataFrame,
    url_col: str = "url",
    content_col: str = "content",
    content_type_col: str = "content_type",
) -> DataFrame:
    """(url, raw bytes, content-type header) → corpus: the P2 kernel
    (charset detect + decode, functions.response) feeds the P3 extractor —
    raw fetched pages become crawlable documents with no other glue."""
    from pyspider_spark.functions.response import with_response_text

    decoded = with_response_text(
        df, content_col=content_col, content_type_col=content_type_col,
        text_out="_html_text",
    )
    return decoded.select(
        F.col(url_col).alias("doc_id"),
        html_spans(F.col("_html_text")).alias("spans"),
    )
