"""X5 live robots.txt (real fetch mode): parse fidelity, the per-host
fetch-once cache, TTL expiry, and the end-to-end gate inside a real crawl
against a local in-process HTTP server (tornado_fetcher.py:79,289-324)."""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from pyspider_spark.operators.robots_live import (
    RobotsCache,
    fetch_robots_df,
    parse_robots_txt,
)

ROBOTS = """
# toy robots file
User-agent: evilbot
Disallow: /

User-agent: *
Disallow: /private
Allow: /private/open
"""


class _RobotsSiteHandler(BaseHTTPRequestHandler):
    pages = {
        "/": '<title>home</title><a href="/a.html">a</a>'
             '<a href="/private/secret.html">s</a>',
        "/a.html": '<a href="/">home</a>',
        "/private/secret.html": "<title>secret</title>",
    }
    requests: list = []

    def log_message(self, *a):
        pass

    def do_GET(self):
        _RobotsSiteHandler.requests.append(self.path)
        if self.path == "/robots.txt":
            body = ROBOTS.encode()
            ctype = "text/plain"
        elif self.path in self.pages:
            body = self.pages[self.path].encode()
            ctype = "text/html"
        else:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def site():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _RobotsSiteHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _host(site):
    return site.removeprefix("http://")


# -- parser ------------------------------------------------------------------

def test_parse_star_group():
    rules = parse_robots_txt(ROBOTS, "pyspider-spark/0.4")
    assert ("/private", False) in rules
    assert ("/private/open", True) in rules
    assert ("/", False) not in rules  # evilbot's group must not apply


def test_parse_specific_agent_wins_over_star():
    rules = parse_robots_txt(ROBOTS, "EvilBot/1.0")
    assert rules == [("/", False)]


def test_parse_empty_disallow_and_garbage():
    assert parse_robots_txt("User-agent: *\nDisallow:", "x") == []
    assert parse_robots_txt("", "x") == []
    assert parse_robots_txt("not a robots file at all", "x") == []


def test_parse_multi_agent_group():
    txt = "User-agent: alphabot\nUser-agent: betabot\nDisallow: /x"
    assert parse_robots_txt(txt, "alphabot/2.0") == [("/x", False)]
    assert parse_robots_txt(txt, "betabot/1.0") == [("/x", False)]
    assert parse_robots_txt(txt, "gammabot/3.0") == []


def test_parse_group_boundary_state_machine():
    """ADVICE r04 + r05 review: exact RobotFileParser group boundaries.
    Crawl-delay/Request-rate put the entry 'in rules' (next User-agent
    starts a NEW entry); Sitemap and unknown directives change NOTHING
    (they neither split agent runs nor close groups)."""
    # crawl-delay closes the agent run → a and b are separate groups
    txt = "User-agent: alphabot\nCrawl-delay: 1\nUser-agent: betabot\nDisallow: /x"
    assert parse_robots_txt(txt, "alphabot/2.0") == []
    assert parse_robots_txt(txt, "betabot/1.0") == [("/x", False)]
    # sitemap between two User-agent lines does NOT split the run:
    # robotparser keeps state=1, so a and b share one entry
    txt2 = "User-agent: alphabot\nSitemap: http://h/s.xml\nUser-agent: betabot\nDisallow: /x"
    assert parse_robots_txt(txt2, "alphabot/2.0") == [("/x", False)]
    assert parse_robots_txt(txt2, "betabot/1.0") == [("/x", False)]
    # sitemap after a rule also changes nothing — next UA starts a new
    # entry because the Disallow already closed the body
    txt3 = (
        "User-agent: alphabot\nDisallow: /a\nSitemap: http://h/x.xml\n"
        "User-agent: betabot\nDisallow: /b"
    )
    assert parse_robots_txt(txt3, "alphabot/2.0") == [("/a", False)]
    assert parse_robots_txt(txt3, "betabot/1.0") == [("/b", False)]


def test_parse_blank_lines_and_orphan_rules():
    """robotparser blank-line semantics: a blank commits an in-rules
    entry; a rule-less User-agent run is DISCARDED at a blank; rules
    before any User-agent line are ignored."""
    # blank between UA and its rules discards the run → alphabot unmatched
    txt = "User-agent: alphabot\n\nDisallow: /x"
    assert parse_robots_txt(txt, "alphabot/2.0") == []
    # blank between complete groups separates them normally
    txt2 = "User-agent: alphabot\nDisallow: /a\n\nUser-agent: betabot\nDisallow: /b"
    assert parse_robots_txt(txt2, "alphabot/2.0") == [("/a", False)]
    assert parse_robots_txt(txt2, "betabot/1.0") == [("/b", False)]
    # whitespace-only line is NOT blank (robotparser checks the raw line)
    txt3 = "User-agent: alphabot\n   \nDisallow: /x"
    assert parse_robots_txt(txt3, "alphabot/2.0") == [("/x", False)]
    # orphan rules before any UA are dropped
    assert parse_robots_txt("Disallow: /x\nUser-agent: a\nDisallow: /y", "a/1") == [("/y", False)]


# -- fetch + cache -----------------------------------------------------------

def test_fetch_robots_df_rules_and_marker(spark, site):
    hosts = spark.createDataFrame([(_host(site),)], "host string")
    rows = fetch_robots_df(hosts, now=1.0).collect()
    by_prefix = {r["path_prefix"]: r["allow"] for r in rows}
    assert None in by_prefix  # marker row: host was fetched
    assert by_prefix["/private"] is False
    assert by_prefix["/private/open"] is True


def test_fetch_robots_df_missing_file_allows_all(spark, site):
    # a host whose robots.txt 404s yields only the marker (allow-all),
    # like the reference's content='' on HTTPError
    hosts = spark.createDataFrame(
        [("127.0.0.1:1",)], "host string"  # closed port → transport error
    )
    rows = fetch_robots_df(hosts, timeout=2.0, now=1.0).collect()
    assert [r["path_prefix"] for r in rows] == [None]


def test_cache_fetches_once_then_honors_ttl(spark, site):
    _RobotsSiteHandler.requests = []
    cache = RobotsCache(spark, ttl=100.0)
    hosts = spark.createDataFrame([(_host(site),)], "host string")

    r1 = cache.rules_for(hosts, now=0.0)
    assert r1.count() == 2
    assert _RobotsSiteHandler.requests.count("/robots.txt") == 1
    # fresh within TTL: no second request
    cache.rules_for(hosts, now=50.0).count()
    assert _RobotsSiteHandler.requests.count("/robots.txt") == 1
    # expired: refetch (clear_robot_txt_cache + re-fetch semantics)
    r3 = cache.rules_for(hosts, now=150.0)
    assert r3.count() == 2
    assert _RobotsSiteHandler.requests.count("/robots.txt") == 2


# -- end-to-end: the live rules feed the same broadcast gate -----------------

def test_real_crawl_with_live_robots_blocks_disallowed(spark, site):
    from pyspider_spark.plans.crawl import crawl
    from pyspider_spark.plans.round import RoundConfig

    _RobotsSiteHandler.requests = []
    seeds = spark.createDataFrame(
        [("p", f"{site}/", 0, 0.0)],
        "project string, url string, priority int, exetime double",
    )
    cfg = RoundConfig(
        projects={"p": {"rate": 1e9, "burst": 1e9,
                        "retry_delay": {"": 1e9},
                        "crawl_config": {"robots_txt": True}}},
        loop_limit=1000, fetch_mode="real", robots_live=True,
    )
    empty_docs = spark.createDataFrame(
        [], "doc_id string, spans array<struct<"
            "kind:string,text:string,media_ref:string,offset:int>>"
    )
    # a pre-provided rules table (for an unrelated host) must merge with
    # the live cache — covers the table+live union branch in run_round
    static_rules = spark.createDataFrame(
        [("elsewhere.test", "/", False, 0.0)],
        "host string, path_prefix string, allow boolean, fetched_at double",
    )
    report = crawl(spark, seeds, empty_docs, cfg, robots=static_rules, max_rounds=6)
    rows = {r["url"]: r for r in report.frontier.collect()}
    sec = rows[f"{site}/private/secret.html"]
    assert sec["track"]["fetch"]["status_code"] == 403  # robots denied
    assert rows[f"{site}/"]["status"] == 2  # SUCCESS
    assert rows[f"{site}/a.html"]["status"] == 2
    # the page itself was NEVER requested — the gate runs before fetch
    assert "/private/secret.html" not in _RobotsSiteHandler.requests
    # robots.txt fetched exactly once across every round (cache hit after)
    assert _RobotsSiteHandler.requests.count("/robots.txt") == 1
