"""X5 live robots.txt (real fetch mode): fetch, parse, and cache per-host
rules instead of requiring a pre-built rules table.

Reference semantics re-expressed (NOT copied) from
tornado_fetcher.py:79,289-324: each new domain's ``/robots.txt`` is
fetched once (connect 10s / request 30s), parsed, and cached for
``robot_txt_age = 3600`` seconds; a fetch error parses as empty — i.e.
allow-all. The parsed rules feed the SAME broadcast longest-prefix gate
as table-provided rules (operators/fetch.robots_gate), so simulated and
real mode share X5 downstream.

Scale shape: the cache is a DATAFRAME (host, path_prefix, allow,
fetched_at), not a driver dict — at 10^6+ hosts the driver holds only
the handle. Per round: the wave's opted-in hosts anti-join the fresh
cache (one small job over O(hosts) rows, never the wave), only missing/
expired hosts fetch (mapInPandas thread pool, one request per host), and
the refreshed cache localCheckpoints so each robots.txt is fetched
exactly once per TTL window. Every host gets a marker row (null
path_prefix) even when robots.txt is missing/unparseable, so error
hosts are not re-fetched every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspider_spark.operators.fetch_real import DEFAULT_USER_AGENT, _fetch_one

RULES_SCHEMA = "host string, path_prefix string, allow boolean, fetched_at double"


def parse_robots_txt(content: str, user_agent: str = DEFAULT_USER_AGENT) -> list[tuple[str, bool]]:
    """(path_prefix, allow) rules from the record group that best matches
    ``user_agent``. Clean-room implementation of the (public, RFC 9309)
    robots.txt format with RobotFileParser's GROUP-BOUNDARY state machine
    (the parser the reference fetcher uses): User-agent lines accumulate
    while no rule has been seen; Allow/Disallow AND Crawl-delay /
    Request-rate put the entry "in rules", so the next User-agent starts
    a NEW entry; Sitemap and unknown directives change nothing; a truly
    empty line commits an in-rules entry and DISCARDS a rule-less
    User-agent run; rules before any User-agent line are ignored; an
    empty Disallow/Allow value means allow-everything (no rule row).
    Group PICK is RFC 9309 longest-substring (most-specific agent token
    wins, '*' is the fallback) — stricter than RobotFileParser's
    first-match, and the documented modern semantics."""
    ua = user_agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    agents: list[str] = []
    rules: list[tuple[str, bool]] = []
    state = 0  # 0 idle · 1 collecting agents · 2 in rules

    def commit() -> None:
        nonlocal agents, rules
        groups.append((agents, rules))
        agents, rules = [], []

    for raw in content.splitlines():
        if not raw:
            # blank line: commits a completed entry; a User-agent run
            # with no rules yet is dropped (robotparser state machine)
            if state == 2:
                commit()
            elif state == 1:
                agents, rules = [], []
            state = 0
            continue
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if state == 2:
                commit()
            agents.append(val.lower())
            state = 1
        elif key in ("allow", "disallow"):
            if state != 0:
                if val:
                    rules.append((val, key == "allow"))
                # empty value: allow-all — no rule row
                state = 2
        elif key in ("crawl-delay", "request-rate"):
            if state != 0:
                state = 2  # closes the agent run, like robotparser
        # sitemap / unknown directives: NO state change (robotparser
        # ignores them entirely — they must not split or close a group)
    if state == 2:
        commit()

    best: list[tuple[str, bool]] | None = None
    best_len = -1
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                if best is None:
                    best = rules  # first '*' group is the fallback
            elif a and a in ua and len(a) > best_len:
                best, best_len = rules, len(a)
    return best or []


ORIGIN_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]+)"


def origin_of(url):
    """scheme://netloc (WITH the port — parse_url's HOST drops it) of a
    task URL; the reference fetches urljoin(url, '/robots.txt'), i.e. the
    robots request reuses the task's origin."""
    return F.regexp_extract(url, ORIGIN_RE, 1)


def fetch_robots_df(
    hosts: DataFrame,
    user_agent: str = DEFAULT_USER_AGENT,
    scheme: str = "http",
    timeout: float = 30.0,
    max_threads: int = 16,
    now: float = 0.0,
) -> DataFrame:
    """One robots.txt request per distinct host → rules rows. ``hosts``
    carries (host[, origin]); without an origin column the request goes to
    ``scheme://host``. Errors and empty files yield only the marker row
    (allow-all), mirroring the reference's ``content = ''`` on
    HTTPError."""
    if "origin" not in hosts.columns:
        hosts = hosts.withColumn(
            "origin", F.concat(F.lit(scheme + "://"), F.col("host"))
        )
    per_host = (
        hosts.select("host", "origin")
        .where(F.col("host").isNotNull() & (F.col("origin") != ""))
        .groupBy("host")
        .agg(F.min("origin").alias("origin"))  # deterministic pick
    )

    def run(batches):
        import pandas as pd
        from concurrent.futures import ThreadPoolExecutor

        def one(host: str, origin: str):
            r = _fetch_one(f"{origin}/robots.txt", "GET",
                           {"User-Agent": user_agent}, None,
                           timeout, None, False, True)
            rows = [(host, None, True)]  # marker: fetched, don't retry
            if r["status_code"] == 200 and r["content"]:
                try:
                    text = r["content"].decode("utf-8", "ignore")
                except Exception:
                    text = ""
                rows += [(host, p, a) for p, a in parse_robots_txt(text, user_agent)]
            return rows

        for pdf in batches:
            if len(pdf) == 0:
                continue
            pairs = list(zip(pdf["host"], pdf["origin"]))
            with ThreadPoolExecutor(max_workers=min(max_threads, max(1, len(pairs)))) as ex:
                nested = list(ex.map(lambda p: one(*p), pairs))
            flat = [row for rows in nested for row in rows]
            yield pd.DataFrame(
                [(h, p, a, now) for h, p, a in flat],
                columns=["host", "path_prefix", "allow", "fetched_at"],
            )

    return per_host.mapInPandas(run, RULES_SCHEMA)


class RobotsCache:
    """Round-to-round robots rules cache (driver holds only a DataFrame
    handle; TTL = the reference's robot_txt_age)."""

    def __init__(self, spark: SparkSession, user_agent: str = DEFAULT_USER_AGENT,
                 ttl: float = 3600.0, scheme: str = "http", timeout: float = 30.0,
                 max_threads: int = 16):
        self.spark = spark
        self.user_agent = user_agent
        self.ttl = ttl
        self.scheme = scheme
        self.timeout = timeout
        self.max_threads = max_threads
        self.cache: DataFrame = spark.createDataFrame([], RULES_SCHEMA)

    def rules_for(self, hosts: DataFrame, now: float) -> DataFrame:
        """Refresh the cache for this round's hosts — (host[, origin])
        rows — and return the rules table robots_gate consumes. Expired
        entries drop (the reference's clear_robot_txt_cache);
        missing/expired hosts fetch once."""
        fresh = self.cache.where(F.col("fetched_at") > F.lit(now - self.ttl))
        cols = ["host", "origin"] if "origin" in hosts.columns else ["host"]
        missing = hosts.select(*cols).distinct().join(
            fresh.select("host").distinct(), "host", "left_anti"
        )
        fetched = fetch_robots_df(
            missing, self.user_agent, self.scheme, self.timeout,
            self.max_threads, now=now,
        )
        # localCheckpoint materializes the union ONCE: each robots.txt is
        # fetched a single time per TTL window, and the cache's lineage
        # never grows across rounds
        self.cache = fresh.unionByName(fetched).localCheckpoint(eager=True)
        return self.cache.where(F.col("path_prefix").isNotNull()).select(
            "host", "path_prefix", "allow"
        )
