"""Fetch stage: robots gate + simulated fetch + error normalization
(X1/X5/X7/X8 in SURVEY.md §2.2).

In this sandbox there is no network, so "fetch" = a join of the wave
against the interleaved ``documents`` table on canonical URL (the exact
analogue of the reference bench, whose pages are served from a local
generator — webui/bench_test.py:18-31). In a real deployment X1 would be an
``mapInPandas`` stage doing async HTTP per partition; everything downstream
is identical.

Reference semantics re-expressed:
  - robots gate: tornado_fetcher.py:289-324,358-363 — per-host rules,
    disallowed ⇒ error (we use 403), opt-in per task via fetch.robots_txt.
    Rules live in a small (host, path_prefix, allow) table, longest-prefix
    wins (RobotFileParser semantics); broadcast-joined to the wave.
  - data: URI fetch: tornado_fetcher.py:125-134 + libs/dataurl.py — decoded
    locally, status 200, time 0. Decoded JVM-side (unbase64/url_decode).
  - error normalization: tornado_fetcher.py:202-216 — miss ⇒ status 404
    here (the bench corpus is closed; unreachable URL = hard miss),
    content '', error set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspider_spark.functions import urlkit

FETCHED_COLS = ["status_code", "content_spans", "fetch_error", "fetch_time"]


def robots_gate(wave: DataFrame, robots: DataFrame | None) -> DataFrame:
    """Adds boolean ``robots_allowed``. Longest matching path prefix per
    (host, url) decides; hosts without rules are allowed. The rules table is
    tiny (O(hosts)) ⇒ broadcast join, no shuffle of the wave."""
    if robots is None:
        return wave.withColumn("robots_allowed", F.lit(True))
    rules = robots.select(
        F.col("host"), F.col("path_prefix"), F.col("allow").alias("rule_allow")
    )
    path = urlkit.path_of(F.col("url"))
    matched = (
        wave.join(F.broadcast(rules), "host", "left")
        .withColumn(
            "_match",
            F.when(
                F.col("path_prefix").isNotNull()
                & path.startswith(F.col("path_prefix")),
                F.struct(
                    F.length("path_prefix").alias("plen"), F.col("rule_allow").alias("allow")
                ),
            ),
        )
        .groupBy(*[F.col(c) for c in wave.columns])
        .agg(F.max("_match").alias("_best"))
    )
    opt_in = F.coalesce(F.col("fetch").robots_txt, F.lit(False))
    return matched.withColumn(
        "robots_allowed",
        F.when(~opt_in, F.lit(True)).otherwise(
            F.coalesce(F.col("_best").allow, F.lit(True))
        ),
    ).drop("_best")


def simulated_fetch(wave: DataFrame, documents: DataFrame, now: float) -> DataFrame:
    """X1/X7/X8: join wave → documents on canonical URL.

    Output adds: status_code, content_spans (the page's interleaved spans),
    fetch_error, fetch_time, fetch_ok. data: URLs short-circuit with their
    decoded payload as a single text span. The join key is (url = doc_id);
    at scale documents is Iceberg bucketed by url hash so this is a
    co-located sort-merge join, and a skewed wave (hot host) is handled by
    AQE skew-split — the wave side is already quota-bounded per host.
    """
    docs = documents.select(
        F.col("doc_id").alias("url"), F.col("spans").alias("_doc_spans")
    )
    is_data_uri = F.col("url").startswith("data:")
    joined = wave.join(docs, "url", "left")

    data_payload = F.regexp_replace(F.col("url"), r"^data:[^,]*,", "")
    data_spans = F.array(
        F.struct(
            F.lit("text").alias("kind"),
            F.url_decode(data_payload).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).alias("offset"),
        )
    )

    denied = ~F.col("robots_allowed")
    found = F.col("_doc_spans").isNotNull()
    status_code = (
        F.when(denied, F.lit(403))
        .when(is_data_uri, F.lit(200))
        .when(found, F.lit(200))
        .otherwise(F.lit(404))
    )
    content = (
        F.when(is_data_uri, data_spans)
        .when(denied, F.lit(None))
        .otherwise(F.col("_doc_spans"))
    )
    error = (
        F.when(denied, F.lit("robots.txt denied"))
        .when(~is_data_uri & ~found, F.lit("HTTP 404: not found"))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        joined.withColumn("status_code", status_code)
        .withColumn("content_spans", content)
        .withColumn("fetch_error", error)
        .withColumn("fetch_time", F.when(is_data_uri, F.lit(0.0)).otherwise(F.lit(0.01)))
        .withColumn("fetch_ok", F.col("status_code") == 200)
        .drop("_doc_spans")
    )


def build_track(now: float) -> F.Column:
    """P7: the track struct recorded on the finished task
    (processor/processor.py:125-169 shape, trimmed to analytic fields)."""
    return F.struct(
        F.struct(
            F.col("fetch_ok").alias("ok"),
            F.col("fetch_time").alias("time"),
            F.col("status_code").alias("status_code"),
            F.lit("utf-8").alias("encoding"),
            F.col("fetch_error").alias("error"),
            F.lit(None).cast("string").alias("redirect_url"),
        ).alias("fetch"),
        F.struct(
            F.col("process_ok").alias("ok"),
            F.lit(0.001).alias("time"),
            F.col("n_follows").cast("int").alias("follows"),
            F.lit(None).cast("string").alias("exception"),
        ).alias("process"),
        F.col("fetch").save.alias("save"),
    )
