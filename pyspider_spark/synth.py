"""Deterministic synthesis of the crawl corpus (no external data).

Models the reference's bench workload (/root/reference/pyspider/webui/
bench_test.py:18-31 + libs/bench.py:256-265: each page holds `show` links
into an id space of `total`, crawl converges by dedup), but in the
BASELINE.json input_hint shape: interleaved text+link+media spans.

Everything is built with JVM-side expressions over ``spark.range`` — fully
deterministic for a given (total, show, hosts, seed), no Python in the data
path, and embarrassingly parallel at any scale.

Graph shape:
  - page i lives on host ``site{h(i)}.test``; h(i) is hash-derived with one
    hot host (~50% of pages) to exercise skew handling.
  - page i links to ``show`` targets t = H(i,k,seed) % total; hrefs rotate
    through 4 canonicalization-exercising variants (absolute, padded,
    relative same-host, uppercase-host).
  - every 10th page also links to a same-host ``/private?n=i`` page which
    exists as a document but is disallowed by robots.txt.
  - spans interleave text/link(/media) with strictly increasing offsets —
    the per-row span-sequence invariant vs the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspider_spark.types import PROJECT_CONFIG_SCHEMA, ROBOTS_SCHEMA


def _page_host(idc: Column, hosts: int, seed: int) -> Column:
    """Host index for a page id: host 0 is hot (~50%), rest uniform."""
    hot = F.pmod(F.xxhash64(F.concat(F.lit(f"hot{seed}-"), idc.cast("string"))), F.lit(100)) < 50
    rest = F.pmod(
        F.xxhash64(F.concat(F.lit(f"h{seed}-"), idc.cast("string"))), F.lit(max(hosts - 1, 1))
    ) + 1
    if hosts <= 1:
        return F.lit(0)
    return F.when(hot, F.lit(0)).otherwise(rest.cast("int"))


def _page_url(idc: Column, hostc: Column, host_prefix: str = "site") -> Column:
    return F.concat(
        F.lit(f"http://{host_prefix}"), hostc.cast("string"), F.lit(".test/page?n="),
        idc.cast("string"),
    )


def _private_url(idc: Column, hostc: Column, host_prefix: str = "site") -> Column:
    return F.concat(
        F.lit(f"http://{host_prefix}"), hostc.cast("string"), F.lit(".test/private?n="),
        idc.cast("string"),
    )


def _text_span(text: Column, offset: Column) -> Column:
    return F.struct(
        F.lit("text").alias("kind"),
        text.alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        offset.cast("int").alias("offset"),
    )


def _link_span(href: Column, offset: Column) -> Column:
    return F.struct(
        F.lit("link").alias("kind"),
        href.alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        offset.cast("int").alias("offset"),
    )


def _media_span(ref: Column, offset: Column) -> Column:
    return F.struct(
        F.lit("media").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        ref.alias("media_ref"),
        offset.cast("int").alias("offset"),
    )


def synth_documents(
    spark: SparkSession,
    total: int = 2000,
    show: int = 20,
    hosts: int = 8,
    seed: int = 42,
    partitions: int | None = None,
    host_prefix: str = "site",
) -> DataFrame:
    """Interleaved documents table: ``total`` crawlable pages + ``total//10``
    robots-disallowed private pages. Columns: (doc_id string, spans array).
    ``host_prefix`` names a disjoint host universe (hosts ``{prefix}{h}.test``)
    so multi-corpus tests can union corpora without doc_id collisions —
    doc_id must be UNIQUE across the documents table (the simulated fetch
    is a lookup join; a duplicate doc_id would fan the wave out)."""
    rng = spark.range(0, total, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    h = _page_host(i, hosts, seed)

    def link_target(k: Column) -> Column:
        return F.pmod(
            F.xxhash64(F.concat_ws("-", i.cast("string"), k.cast("string"), F.lit(str(seed)))),
            F.lit(total),
        )

    def href_for(k: Column) -> Column:
        t = link_target(k)
        th = _page_host(t, hosts, seed)
        absolute = _page_url(t, th, host_prefix)
        variant = F.pmod(i + k.cast("long"), F.lit(4))
        return (
            F.when(variant == 0, absolute)
            .when(variant == 1, F.concat(F.lit("  "), absolute, F.lit(" ")))  # padded
            .when(
                (variant == 2) & (th == h),  # relative only when same host
                F.concat(F.lit("/page?n="), t.cast("string")),
            )
            .when(
                variant == 3,  # uppercase scheme (urlparse lowercases it)
                F.concat(
                    F.lit(f"HTTP://{host_prefix}"), th.cast("string"), F.lit(".test/page?n="),
                    t.cast("string"),
                ),
            )
            .otherwise(absolute)
        )

    ks = F.sequence(F.lit(0), F.lit(show - 1))
    body = F.flatten(
        F.transform(
            ks,
            lambda k: F.array(
                _text_span(
                    F.concat(F.lit("para-"), i.cast("string"), F.lit("-"), k.cast("string")),
                    F.lit(1) + k * 2,
                ),
                _link_span(href_for(k), F.lit(2) + k * 2),
            ),
        )
    )
    intro = F.array(_text_span(F.concat(F.lit("page "), i.cast("string")), F.lit(0)))
    private_link = F.when(
        F.pmod(i, F.lit(10)) == 0,
        F.array(_link_span(_private_url(i, h, host_prefix), F.lit(1 + 2 * show))),
    ).otherwise(F.array().cast("array<struct<kind:string,text:string,media_ref:string,offset:int>>"))
    media = F.when(
        F.pmod(i, F.lit(3)) == 0,
        F.array(
            _media_span(
                F.concat(F.lit("media://img/"), i.cast("string"), F.lit(".jpg")),
                F.lit(2 + 2 * show),
            )
        ),
    ).otherwise(F.array().cast("array<struct<kind:string,text:string,media_ref:string,offset:int>>"))

    pages = rng.select(
        _page_url(i, h, host_prefix).alias("doc_id"),
        F.concat(intro, body, private_link, media).alias("spans"),
    )

    n_private = (total + 9) // 10
    priv_rng = spark.range(0, n_private, 1, partitions or 4).select((F.col("id") * 10).alias("pid"))
    pi = F.col("pid")
    ph = _page_host(pi, hosts, seed)
    private_pages = priv_rng.select(
        _private_url(pi, ph, host_prefix).alias("doc_id"),
        F.array(_text_span(F.concat(F.lit("private "), pi.cast("string")), F.lit(0))).alias("spans"),
    )
    return pages.unionByName(private_pages)


def synth_seeds(
    spark: SparkSession,
    total: int = 2000,
    hosts: int = 8,
    seed: int = 42,
    n_seeds: int = 10,
    project: str = "bench",
    host_prefix: str = "site",
) -> DataFrame:
    """Seed list: n_seeds pages spread across the id space, priorities 0-2
    (mirrors tests/test_task_queue.py priority bands)."""
    stride = max(total // max(n_seeds, 1), 1)
    rows = []
    for j in range(n_seeds):
        pid = (j * stride) % total
        rows.append((project, pid, j % 3, 0.0))
    df = spark.createDataFrame(rows, "project string, pid long, priority int, exetime double")
    h = _page_host(F.col("pid"), hosts, seed)
    return df.select(
        "project", _page_url(F.col("pid"), h, host_prefix).alias("url"), "priority", "exetime"
    )


def synth_robots(spark: SparkSession, hosts: int = 8, host_prefix: str = "site") -> DataFrame:
    """Robots rules: '/private' disallowed on every host (longest-prefix
    match, like RobotFileParser's path rules — tornado_fetcher.py:289-324)."""
    rows = []
    for hidx in range(hosts):
        host = f"{host_prefix}{hidx}.test"
        rows.append((host, "/private", False, 0.0))
        rows.append((host, "/", True, 0.0))
    return spark.createDataFrame(rows, ROBOTS_SCHEMA)


def synth_project_config(
    spark: SparkSession,
    project: str = "bench",
    rate: float = 1e9,
    burst: float = 1e9,
    retries: int = 3,
    max_per_host_per_round: int = 1_000_000,
    inqueue_limit: int = 0,
) -> DataFrame:
    retry_delay = {"0": 30, "1": 3600, "2": 21600, "3": 43200, "": 86400}
    rows = [
        (project, "RUNNING", float(rate), float(burst), 0, retry_delay, retries,
         max_per_host_per_round, inqueue_limit)
    ]
    return spark.createDataFrame(rows, PROJECT_CONFIG_SCHEMA)


def interleave_from_testdata(spark: SparkSession, sf_dir: str, show: int = 5,
                             hosts: int = 4, seed: int = 42) -> DataFrame:
    """Derive an interleaved-span corpus from the driver's flat
    ``documents.parquet`` (doc_id bigint, text, ...): the flat text becomes
    text spans, link spans are hash-derived over the table's own id space.
    Used by ``entry()`` so the flagship query is anchored to /root/testdata
    while keeping the input_hint shape."""
    # rename the id up-front: the output column is ALSO named doc_id (the
    # url), and Spark's lateral-column-alias resolution would otherwise bind
    # F.col("doc_id") inside the spans expression to the aliased URL STRING,
    # silently hashing link targets off the url instead of the numeric id
    flat = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("_did"), "text"
    )
    total = flat.count()
    i = F.col("_did")
    h = _page_host(i, hosts, seed)

    def link_target(k: Column) -> Column:
        return F.pmod(
            F.xxhash64(F.concat_ws("-", i.cast("string"), k.cast("string"), F.lit(str(seed)))),
            F.lit(total),
        )

    body = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(show - 1)),
            lambda k: F.array(
                _text_span(F.substring(F.col("text"), 1, 40), F.lit(1) + k * 2),
                _link_span(_page_url(link_target(k), _page_host(link_target(k), hosts, seed)),
                           F.lit(2) + k * 2),
            ),
        )
    )
    return flat.select(
        _page_url(i, h).alias("doc_id"),
        F.concat(F.array(_text_span(F.lit("doc"), F.lit(0))), body).alias("spans"),
    )
