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
    (host, url) decides; hosts without rules are allowed.

    Scale shape (VERDICT r02 item 7): rules pre-aggregate per host into ONE
    ordered array<struct<plen,allow,prefix>> — O(hosts) rows, broadcast —
    and the longest-prefix resolution is a filter + element_at expression
    per wave row. The wave is never shuffled or re-aggregated: the old
    row-per-rule join + groupBy over all wave columns shuffled the full
    wave on a wide struct key every robots-on round."""
    if robots is None:
        return wave.withColumn("robots_allowed", F.lit(True))
    # (plen, allow, prefix) sorted desc = the same comparator F.max used on
    # struct(plen, allow): longest prefix wins, allow=true breaks plen ties
    rules = robots.where(F.col("path_prefix").isNotNull()).groupBy("host").agg(
        F.reverse(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.length("path_prefix").alias("plen"),
                        F.col("allow").alias("allow"),
                        F.col("path_prefix").alias("prefix"),
                    )
                )
            )
        ).alias("_rules")
    )
    path = urlkit.path_of(F.col("url"))
    joined = wave.join(F.broadcast(rules), "host", "left")
    # F.get (0-indexed) returns NULL when no prefix matches; element_at(.., 1)
    # would THROW under Spark 4's default ANSI mode for any host whose rules
    # cover none of this URL's path (e.g. only 'Disallow: /admin')
    best = F.get(F.filter(F.col("_rules"), lambda r: path.startswith(r.prefix)), 0)
    opt_in = F.coalesce(F.col("fetch").robots_txt, F.lit(False))
    return joined.withColumn(
        "robots_allowed",
        F.when(~opt_in, F.lit(True)).otherwise(F.coalesce(best.allow, F.lit(True))),
    ).drop("_rules")


def simulated_fetch(
    wave: DataFrame, documents: DataFrame, now: float, url_col: str = "url"
) -> DataFrame:
    """X1/X7/X8: join wave → documents on canonical URL.

    Output adds: status_code, content_spans (the page's interleaved spans),
    fetch_error, fetch_time, fetch_ok. data: URLs short-circuit with their
    decoded payload as a single text span. The join key is (url = doc_id);
    at scale documents is Iceberg bucketed by url hash so this is a
    co-located sort-merge join, and a skewed wave (hot host) is handled by
    AQE skew-split — the wave side is already quota-bounded per host.
    """
    docs = documents.select(
        F.col("doc_id").alias(url_col), F.col("spans").alias("_doc_spans")
    )
    is_data_uri = F.col("url").startswith("data:")
    joined = wave.join(docs, url_col, "left")
    if "redirect_url" not in wave.columns:
        joined = joined.withColumn("redirect_url", F.lit(None).cast("string"))
    exhausted = (
        F.col("redirect_exhausted")
        if "redirect_exhausted" in wave.columns
        else F.lit(False)
    )

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
        .when(exhausted, F.lit(599))  # X2: too many redirects
        .when(is_data_uri, F.lit(200))
        .when(found, F.lit(200))
        .otherwise(F.lit(404))
    )
    content = (
        F.when(is_data_uri, data_spans)
        .when(denied | exhausted, F.lit(None))
        .otherwise(F.col("_doc_spans"))
    )
    error = (
        F.when(denied, F.lit("robots.txt denied"))
        .when(exhausted, F.lit("599 too many redirects"))
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


def resolve_redirects(
    wave: DataFrame, redirects: DataFrame | None, max_redirects: int = 5
) -> DataFrame:
    """X2: bounded redirect following — tornado_fetcher.py:352-406 follows
    Location manually with a hop budget (default 5), erroring with 599 when
    exhausted.

    ``redirects``: (from_url, to_url[, set_cookie]) map (in real mode this
    comes from the fetch layer; simulated mode joins it like a vhost
    table). Re-expressed as ``max_redirects`` successive broadcast
    left-joins — a bounded iterative self-join, no loop-carried DataFrame
    growth. Adds: ``resolved_url`` (final), ``redirect_url`` (first hop,
    for track), ``redirect_exhausted`` (boolean ⇒ fetch error 599), and —
    when the redirect table carries a ``set_cookie`` map column —
    ``cookie_jar``: the session jar accumulated across hops, later hops
    overriding earlier keys (X3; cookie_utils.py:1-33 +
    tornado_fetcher.py:337-350 session semantics, seeded from the task's
    Cookie-relevant state and merged per response).

    Per-task budgets: a task's ``fetch.max_redirects`` (when the wave
    carries the field) stops ITS chain at that hop count, matching the
    real mode's per-row budget — clamped to the plan-wide
    ``max_redirects`` (the join unrolls that many hops; a task asking for
    more gets the config ceiling).
    """
    if redirects is None:
        return (
            wave.withColumn("resolved_url", F.col("url"))
            .withColumn("redirect_url", F.lit(None).cast("string"))
            .withColumn("redirect_exhausted", F.lit(False))
        )
    from pyspider_spark.functions.maps import map_override

    with_cookies = "set_cookie" in redirects.columns
    cols = [F.col("from_url").alias("_ru"), F.col("to_url").alias("_rt")]
    if with_cookies:
        cols.append(F.col("set_cookie").alias("_rc"))
    rmap = F.broadcast(redirects.select(*cols))
    fetch_fields = (
        [sf.name for sf in wave.schema["fetch"].dataType.fields]
        if "fetch" in wave.columns
        else []
    )
    budget = (
        F.least(
            F.coalesce(F.col("fetch").max_redirects, F.lit(int(max_redirects))),
            F.lit(int(max_redirects)),
        )
        if "max_redirects" in fetch_fields
        else F.lit(int(max_redirects))
    )
    out = (
        wave.withColumn("resolved_url", F.col("url"))
        .withColumn("redirect_url", F.lit(None).cast("string"))
        .withColumn("_budget", budget)
        .withColumn("_hops", F.lit(0))
    )
    if with_cookies:
        out = out.withColumn(
            "cookie_jar", F.lit(None).cast("map<string,string>")
        )
    for hop in range(max_redirects):
        out = out.join(rmap, out["resolved_url"] == rmap["_ru"], "left")
        took = (F.col("_hops") < F.col("_budget")) & F.col("_rt").isNotNull()
        out = out.withColumn(
            "redirect_url",
            F.when(F.col("redirect_url").isNull() & took, F.col("_rt"))
            .otherwise(F.col("redirect_url")),
        )
        if with_cookies:
            # this hop's Set-Cookie merges into the jar, new keys win
            out = out.withColumn(
                "cookie_jar",
                F.when(
                    took, map_override(F.col("cookie_jar"), F.col("_rc"))
                ).otherwise(F.col("cookie_jar")),
            )
        out = (
            out.withColumn(
                "resolved_url",
                F.when(took, F.col("_rt")).otherwise(F.col("resolved_url")),
            )
            .withColumn("_hops", F.col("_hops") + F.when(took, 1).otherwise(0))
            .drop("_ru", "_rt", *(["_rc"] if with_cookies else []))
        )
    # budget exhausted = the chain continues past where this task stopped
    out = out.join(rmap, out["resolved_url"] == rmap["_ru"], "left").withColumn(
        "redirect_exhausted", F.col("_rt").isNotNull()
    ).drop("_ru", "_rt", "_budget", "_hops", *(["_rc"] if with_cookies else []))
    return out


def conditional_gate(fetched: DataFrame) -> DataFrame:
    """X4: conditional GET / 304 short-circuit — tornado_fetcher.py:259-277
    replays etag/if-modified-since when the last process succeeded; a 304
    skips the callback (no follows, no result) but the task still finishes
    ok (base_handler.py:171-173).

    Simulated corpus content never changes, so the emulation is exact: a
    task whose previous track shows a successful 200 fetch and whose fetch
    succeeded again is 'not modified'. Adds ``not_modified``; process_wave
    suppresses follows/result for those rows.
    """
    prior_ok = (
        F.col("track").isNotNull()
        & F.coalesce(F.col("track").fetch.ok, F.lit(False))
        & F.col("track").fetch.status_code.eqNullSafe(F.lit(200))
    )
    return fetched.withColumn(
        "not_modified",
        prior_ok & F.col("fetch_ok") & ~F.col("url").startswith("data:"),
    ).withColumn(
        "status_code", F.when(F.col("not_modified"), F.lit(304)).otherwise(F.col("status_code"))
    )


def build_track(now: float, wire_meta: bool = False) -> F.Column:
    """P7: the track struct recorded on the finished task
    (processor/processor.py:125-169 shape, trimmed to analytic fields).
    ``wire_meta``: the real fetch mode captured response validators into
    resp_etag / resp_last_modified columns (X4 replay state); simulated
    mode records NULLs."""
    etag = F.col("resp_etag") if wire_meta else F.lit(None).cast("string")
    last_mod = (
        F.col("resp_last_modified") if wire_meta else F.lit(None).cast("string")
    )
    return F.struct(
        F.struct(
            F.col("fetch_ok").alias("ok"),
            F.col("fetch_time").alias("time"),
            F.col("status_code").alias("status_code"),
            F.lit("utf-8").alias("encoding"),
            F.col("fetch_error").alias("error"),
            F.col("redirect_url").alias("redirect_url"),
            etag.alias("etag"),
            last_mod.alias("last_modified"),
        ).alias("fetch"),
        F.struct(
            F.col("process_ok").alias("ok"),
            F.lit(0.001).alias("time"),
            F.col("n_follows").cast("int").alias("follows"),
            F.lit(None).cast("string").alias("exception"),
        ).alias("process"),
        F.col("fetch").save.alias("save"),
    )
