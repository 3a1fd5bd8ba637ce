"""Processing stage: span extraction, link → candidate tasks, results
(P1-P13 in SURVEY.md §2.3).

The reference runs a user script per response (`index_page` /
`detail_page` callbacks calling ``self.crawl`` per link —
base_handler.py:160-218,255-398). Re-expressed declaratively: the
interleaved ``content_spans`` column is exploded, link spans become new
candidate tasks (canonicalized against the page URL, md5 taskid — P3/P4/
P6), the per-callback behavior is an expression dispatch on the
``process.callback`` column (P1), and non-empty results append to the
results table (P13). In-callback dedup (F11) is part of
frontier.merge_candidates.

No per-row Python: explode/filter/struct are JVM-side; only the URL
canonicalizer is a vectorized Arrow UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspider_spark.functions import urlkit
from pyspider_spark.operators.frontier import make_seq
from pyspider_spark.operators.frontier import project_itag_expr as _itag_expr


def extract_links(
    fetched_wave: DataFrame, round_no: int, itags: dict[str, str] | None = None
) -> DataFrame:
    """P3/P4/P6: explode link spans of successfully processed pages into
    candidate task rows. Follow priority/schedule mirror the bench handler
    (libs/bench.py:256-265: plain ``self.crawl(url)`` per link ⇒ defaults);
    ``itags`` stamps each project's current itag onto its candidates
    (@config(itag=...) analogue), driving F10 restarts on itag bumps.

    seq = make_seq(round, parent wave_rank, span offset): deterministic,
    FIFO-faithful (parents pop in wave_rank order, links in span order).
    """
    # prefer the slim link_spans column when the caller cached one (the
    # round caches (text, offset) pairs instead of full span structs —
    # ~half the bytes through the persisted wave)
    spans_col = "link_spans" if "link_spans" in fetched_wave.columns else "content_spans"
    pages = fetched_wave.where(F.col("fetch_ok") & F.col(spans_col).isNotNull())
    if "not_modified" in fetched_wave.columns:
        pages = pages.where(~F.col("not_modified"))  # X4: 304 skips callback
    link_spans = (
        F.col("link_spans")
        if spans_col == "link_spans"
        else F.transform(
            F.filter(F.col("content_spans"), lambda s: s.kind == F.lit("link")),
            lambda s: F.struct(s.text.alias("text"), s.offset.alias("offset")),
        )
    )
    links = pages.select(
        F.col("project"),
        F.col("url").alias("base_url"),
        F.col("wave_rank"),
        F.explode(link_spans).alias("span"),
    )
    curl = urlkit.canonical(F.col("span").text, F.col("base_url"))
    return links.select(
        "project",
        curl.alias("url"),
        F.col("wave_rank"),
        F.col("span").offset.alias("offset"),
    ).select(
        "project",
        urlkit.taskid_of(F.col("url")).alias("taskid"),
        "url",
        urlkit.host_of(F.col("url")).alias("host"),
        F.struct(
            F.lit(0).cast("int").alias("priority"),
            F.lit(3).cast("int").alias("retries"),
            F.lit(0).cast("int").alias("retried"),
            F.lit(0.0).cast("double").alias("exetime"),
            F.lit(-1).cast("long").alias("age"),
            _itag_expr(itags).alias("itag"),
            F.lit(False).alias("force_update"),
            F.lit(False).alias("auto_recrawl"),
            F.lit(False).alias("cancel"),
        ).alias("schedule"),
        # method/timeout stay NULL = "unspecified": the reference task
        # carries only user-provided fetch keys, so project crawl_config
        # can fill them at select (F20); the fetcher applies GET/120
        # defaults last. robots_txt=True is this corpus's explicit opt-in.
        F.struct(
            F.lit(None).cast("string").alias("method"),
            F.lit(None).cast("map<string,string>").alias("headers"),
            F.lit(None).cast("string").alias("data"),
            F.lit(None).cast("int").alias("timeout"),
            F.lit(None).cast("string").alias("save"),
            F.lit(True).alias("robots_txt"),
            F.lit(None).cast("string").alias("proxy"),
            F.lit(None).cast("boolean").alias("use_gzip"),
            F.lit(None).cast("int").alias("max_redirects"),
        ).alias("fetch"),
        F.struct(F.lit("index_page").alias("callback")).alias("process"),
        make_seq(F.lit(round_no), F.col("wave_rank"), F.col("offset")).alias("seq"),
    )


def process_wave(fetched_wave: DataFrame) -> DataFrame:
    """P1/P7/P13: per-page processing outcome + result payload.

    Adds: process_ok, n_follows, result (JSON string). The "callback" here
    is declarative: index_page extracts links + a summary result;
    detail_page only builds the result. Generator results (P10) are the
    explode in extract_links.
    """
    spans = F.col("content_spans")
    n_links = F.size(F.filter(spans, lambda s: s.kind == F.lit("link")))
    n_media = F.size(F.filter(spans, lambda s: s.kind == F.lit("media")))
    # F.get: a page with ZERO text spans must yield a NULL title, not an
    # ANSI INVALID_ARRAY_INDEX_IN_ELEMENT_AT crash (same hazard class as
    # the robots gate, ADVICE r03)
    title = F.get(F.filter(spans, lambda s: s.kind == F.lit("text")), 0).text
    result = F.to_json(
        F.struct(
            F.col("url").alias("url"),
            title.alias("title"),
            n_links.alias("n_links"),
            n_media.alias("n_media"),
            F.transform(
                F.filter(spans, lambda s: s.kind == F.lit("media")),
                lambda s: s.media_ref,
            ).alias("media_refs"),
        )
    )
    ok = F.col("fetch_ok")
    ran = (
        ok & ~F.col("not_modified")
        if "not_modified" in fetched_wave.columns
        else ok  # X4: 304 finishes ok but skips callback output
    )
    return (
        fetched_wave.withColumn("process_ok", ok)
        .withColumn("n_follows", F.when(ran, F.greatest(n_links, F.lit(0))).otherwise(F.lit(0)))
        .withColumn("result", F.when(ran, result))
    )
