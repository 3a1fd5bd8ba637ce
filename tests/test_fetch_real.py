"""X1 real fetch kernel + X6 proxy/gzip (VERDICT r02 items 5/10), tested
against a local in-process HTTP server only — the same strategy as the
reference's fetcher tests (tests/test_fetcher.py with a local httpbin).
The real and simulated paths share everything downstream of FETCHED_COLS,
so the end-to-end check is a full crawl over a live localhost site."""

import gzip
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from pyspider_spark.operators.fetch_real import _fetch_one, parse_proxy, real_fetch_stage


class _SiteHandler(BaseHTTPRequestHandler):
    pages = {
        "/": '<title>home</title><a href="/a.html">a</a><a href="/b.html">b</a>',
        "/a.html": '<a href="/b.html">b</a><a href="/missing.html">m</a>',
        "/b.html": '<a href="/">home</a>',
    }
    requests: list = []  # (method, path, headers dict) — reset per test

    def log_message(self, *a):  # quiet
        pass

    def _send(self, code, body: bytes, ctype="text/html", extra=None):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        for k, v in (extra or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _redirect(self, code, location, extra=None):
        self.send_response(code)
        self.send_header("Location", location)
        for k, v in (extra or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def do_GET(self):
        _SiteHandler.requests.append(
            ("GET", self.path, {k: v for k, v in self.headers.items()})
        )
        if self.path in self.pages:
            self._send(200, self.pages[self.path].encode())
        elif self.path == "/echo-headers":
            hdrs = {k: v for k, v in self.headers.items()}
            self._send(200, json.dumps(hdrs).encode(), "application/json")
        elif self.path == "/gzip":
            body = gzip.compress(b"<title>gzipped page</title>")
            self._send(200, body, extra={"Content-Encoding": "gzip"})
        elif self.path == "/redirect":
            self._redirect(302, "/a.html")
        elif self.path.startswith("/chain/"):
            n = int(self.path.rsplit("/", 1)[1])
            if n <= 0:
                self._send(200, b"<title>end of chain</title>")
            else:
                self._redirect(302, f"/chain/{n - 1}")
        elif self.path == "/setcookie":
            # hop 1 sets a session cookie, hop 2 must see it replayed (X3)
            self._redirect(302, "/needscookie", {"Set-Cookie": "session=abc123; Path=/"})
        elif self.path == "/needscookie":
            got = self.headers.get("Cookie", "")
            if "session=abc123" in got:
                self._send(200, json.dumps({"cookie": got}).encode(), "application/json")
            else:
                self._send(403, b"no cookie", "text/plain")
        elif self.path == "/etag":
            if self.headers.get("If-None-Match") == '"v1"':
                self.send_response(304)
                self.send_header("Content-Length", "0")
                self.end_headers()
            else:
                self._send(
                    200, b'<title>etagged</title>', extra={"ETag": '"v1"'}
                )
        elif self.path == "/target":
            self._send(200, json.dumps(
                {"method": "GET", "body": ""}).encode(), "application/json")
        else:
            self._send(404, b"not found", "text/plain")

    def do_POST(self):
        _SiteHandler.requests.append(
            ("POST", self.path, {k: v for k, v in self.headers.items()})
        )
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        if self.path == "/submit303":
            self._redirect(303, "/target")
        elif self.path == "/submit302":
            self._redirect(302, "/target")
        else:
            self._send(200, json.dumps({"posted": body.decode()}).encode(),
                       "application/json")

    def do_HEAD(self):
        self._send(200, b"")


class _ProxyHandler(BaseHTTPRequestHandler):
    """Records the absolute-URI request a proxied client sends and answers
    directly — proves the request was ROUTED through the proxy."""

    def log_message(self, *a):
        pass

    def do_GET(self):
        body = json.dumps({"proxied": self.path}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def _serve(handler):
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


@pytest.fixture(scope="module")
def site():
    srv, base = _serve(_SiteHandler)
    yield base
    srv.shutdown()


@pytest.fixture(scope="module")
def proxy_srv():
    srv, base = _serve(_ProxyHandler)
    yield base
    srv.shutdown()


# -- kernel-level (no Spark) --------------------------------------------------

def test_get_and_error_normalization(site):
    ok = _fetch_one(f"{site}/", None, None, None, None, None, None, True)
    assert ok["status_code"] == 200 and b"home" in ok["content"]
    assert ok["content_type"].startswith("text/html")

    miss = _fetch_one(f"{site}/nope", None, None, None, None, None, None, True)
    assert miss["status_code"] == 404 and "HTTP 404" in miss["fetch_error"]

    # transport error → 599 (X8): nothing listens on port 1
    dead = _fetch_one("http://127.0.0.1:1/", None, None, None, 2, None, None, True)
    assert dead["status_code"] == 599 and "599" in dead["fetch_error"]

    denied = _fetch_one(f"{site}/", None, None, None, None, None, None, False)
    assert denied["status_code"] == 403 and "robots" in denied["fetch_error"]


def test_post_headers_timeout(site):
    post = _fetch_one(f"{site}/post", "POST", None, "k=v", None, None, None, True)
    assert post["status_code"] == 200
    assert json.loads(post["content"])["posted"] == "k=v"

    hdr = _fetch_one(
        f"{site}/echo-headers", None, {"X-Custom": "yes", "User-Agent": "task-ua"},
        None, None, None, None, True,
    )
    seen = json.loads(hdr["content"])
    assert seen["X-Custom"] == "yes"
    assert seen["User-Agent"] == "task-ua"  # task header beats the default UA


def test_gzip_decompressed(site):
    r = _fetch_one(f"{site}/gzip", None, None, None, None, None, True, True)
    assert r["status_code"] == 200
    assert r["content"] == b"<title>gzipped page</title>"


def test_redirect_followed_final_url(site):
    r = _fetch_one(f"{site}/redirect", None, None, None, None, None, None, True)
    assert r["status_code"] == 200
    assert r["final_url"] == f"{site}/a.html"
    assert b"b.html" in r["content"]


# -- X2: manual redirect loop with the reference's budget semantics ----------

def test_redirect_budget_exhaustion_599(site):
    """A chain longer than max_redirects ends 599 'too many redirects'
    (tornado_fetcher.py:352-406), not urllib's silent internal limit."""
    r = _fetch_one(f"{site}/chain/10", None, None, None, None, None, None, True,
                   max_redirects=5)
    assert r["status_code"] == 599
    assert "too many redirects" in r["fetch_error"]
    assert r["content"] is None

    # exactly at budget: 5 hops from /chain/5 reaches /chain/0 → 200
    ok = _fetch_one(f"{site}/chain/5", None, None, None, None, None, None, True,
                    max_redirects=5)
    assert ok["status_code"] == 200
    assert ok["final_url"] == f"{site}/chain/0"

    tight = _fetch_one(f"{site}/chain/5", None, None, None, None, None, None, True,
                       max_redirects=4)
    assert tight["status_code"] == 599


def test_303_post_becomes_get_drops_body(site):
    _SiteHandler.requests.clear()
    r = _fetch_one(f"{site}/submit303", "POST", None, "k=v", None, None, None, True)
    assert r["status_code"] == 200
    assert json.loads(r["content"])["method"] == "GET"
    hops = [(m, p) for m, p, _ in _SiteHandler.requests]
    assert hops == [("POST", "/submit303"), ("GET", "/target")]
    # the body was dropped on the forced-GET hop
    _, _, hdrs = _SiteHandler.requests[1]
    assert int(hdrs.get("Content-Length", 0) or 0) == 0


def test_302_post_becomes_get(site):
    _SiteHandler.requests.clear()
    r = _fetch_one(f"{site}/submit302", "POST", None, "k=v", None, None, None, True)
    assert r["status_code"] == 200
    assert [(m, p) for m, p, _ in _SiteHandler.requests] == [
        ("POST", "/submit302"), ("GET", "/target")]


def test_per_task_max_redirects_budget(spark, site):
    """X2: task['fetch']['max_redirects'] overrides the config budget per
    task (tornado_fetcher applies the task value over its default); tasks
    without one fall back to the round config."""
    wave = spark.createDataFrame(
        [("long", "p", f"{site}/chain/4", 2),    # per-task 2 < 4 hops → 599
         ("fits", "p", f"{site}/chain/4", 6),    # per-task 6 → 200
         ("default", "p", f"{site}/chain/4", None)],  # config 5 → 200
        "taskid string, project string, url string, _mr int",
    ).withColumn(
        "fetch",
        F.struct(
            F.lit(None).cast("string").alias("method"),
            F.lit(None).cast("map<string,string>").alias("headers"),
            F.lit(None).cast("string").alias("data"),
            F.lit(5).alias("timeout"),
            F.lit(None).cast("string").alias("save"),
            F.lit(False).alias("robots_txt"),
            F.lit(None).cast("string").alias("proxy"),
            F.lit(None).cast("boolean").alias("use_gzip"),
            F.col("_mr").alias("max_redirects"),
        ),
    ).drop("_mr")
    rows = {r["taskid"]: r for r in real_fetch_stage(wave, max_redirects=5).collect()}
    assert rows["long"]["status_code"] == 599
    assert "too many redirects" in rows["long"]["fetch_error"]
    assert rows["fits"]["status_code"] == 200
    assert rows["default"]["status_code"] == 200


def test_cookie_set_on_hop1_replayed_on_hop2(site):
    """X3: Set-Cookie from a redirect hop rides the session jar into the
    next hop (cookie_utils + tornado session semantics)."""
    r = _fetch_one(f"{site}/setcookie", None, None, None, None, None, None, True)
    assert r["status_code"] == 200
    assert "session=abc123" in json.loads(r["content"])["cookie"]


# -- X4: conditional GET on the wire ------------------------------------------

def test_etag_replay_yields_304(site):
    first = _fetch_one(f"{site}/etag", None, None, None, None, None, None, True)
    assert first["status_code"] == 200
    assert first["resp_etag"] == '"v1"'

    again = _fetch_one(f"{site}/etag", None, None, None, None, None, None, True,
                       etag=first["resp_etag"])
    assert again["status_code"] == 304
    assert again["fetch_error"] is None
    assert again["content"] is None
    assert again["resp_etag"] == '"v1"'  # validator carried for the next replay


# -- X7: data URIs, percent AND base64 ----------------------------------------

def test_data_uri_base64():
    r = _fetch_one("data:text/plain;base64,aGVsbG8=", None, None, None, None,
                   None, None, True)
    assert r["status_code"] == 200
    assert r["content"] == b"hello"
    assert r["content_type"] == "text/plain"

    plain = _fetch_one("data:,hi%20there", None, None, None, None, None, None, True)
    assert plain["content"] == b"hi there"


def test_proxy_parse_and_routing(site, proxy_srv):
    assert parse_proxy("host:8080") == "http://host:8080"
    assert parse_proxy("http://u:p@host:8080") == "http://u:p@host:8080"
    assert parse_proxy("  ") is None and parse_proxy(None) is None

    # the proxy answers for ANY url → response proves routing (X6)
    r = _fetch_one(
        "http://example.invalid/page", None, None, None, 5,
        proxy_srv.removeprefix("http://"), None, True,
    )
    assert r["status_code"] == 200
    assert json.loads(r["content"])["proxied"] == "http://example.invalid/page"


# -- crawl end-to-end: real mode shares the downstream pipeline ---------------

def test_real_fetch_crawl_converges(spark, site):
    from pyspider_spark.plans.crawl import crawl
    from pyspider_spark.plans.round import RoundConfig

    seeds = spark.createDataFrame(
        [("p", f"{site}/", 0, 0.0)],
        "project string, url string, priority int, exetime double",
    )
    cfg = RoundConfig(
        projects={"p": {"rate": 1e9, "burst": 1e9,
                        "retry_delay": {"": 1e9}}},  # failed 404 waits forever
        loop_limit=1000, fetch_mode="real",
    )
    empty_docs = spark.createDataFrame([], "doc_id string, spans array<struct<"
                                       "kind:string,text:string,media_ref:string,offset:int>>")
    report = crawl(spark, seeds, empty_docs, cfg, robots=None, max_rounds=8)
    rows = {r["url"]: r for r in report.frontier.collect()}
    assert set(rows) == {f"{site}/", f"{site}/a.html", f"{site}/b.html",
                         f"{site}/missing.html"}
    assert rows[f"{site}/"]["status"] == 2  # SUCCESS
    assert rows[f"{site}/a.html"]["status"] == 2
    assert rows[f"{site}/missing.html"]["status"] == 1  # retry-pending 404
    assert rows[f"{site}/missing.html"]["track"]["fetch"]["status_code"] == 404


def test_real_fetch_stage_contract(spark, site):
    """The stage output carries the simulated_fetch contract columns."""
    from pyspider_spark.operators.fetch import FETCHED_COLS

    wave = spark.createDataFrame(
        [("t1", "p", f"{site}/", None)],
        "taskid string, project string, url string, ignore string",
    ).withColumn(
        "fetch",
        F.named_struct(
            F.lit("method"), F.lit(None).cast("string"),
            F.lit("headers"), F.lit(None).cast("map<string,string>"),
            F.lit("data"), F.lit(None).cast("string"),
            F.lit("timeout"), F.lit(5),
            F.lit("save"), F.lit(None).cast("string"),
            F.lit("robots_txt"), F.lit(False),
            F.lit("proxy"), F.lit(None).cast("string"),
            F.lit("use_gzip"), F.lit(None).cast("boolean"),
        ),
    ).drop("ignore")
    out = real_fetch_stage(wave)
    for c in FETCHED_COLS + ["fetch_ok", "redirect_url"]:
        assert c in out.columns, c
    row = out.collect()[0]
    assert row["status_code"] == 200 and row["fetch_ok"]
    kinds = [s["kind"] for s in row["content_spans"]]
    assert "link" in kinds and kinds[0] == "text"


def test_fetch_stage_has_no_reunite_join(spark, site):
    """VERDICT r03 item 4: the kernel carries the wave's columns through
    its output batch — no join back to its own input, so the stage plan
    has NO shuffle Exchange and exactly ONE request per task."""
    from pyspider_spark.operators.fetch import robots_gate

    wave = spark.createDataFrame(
        [(f"t{i}", "p", f"{site}/a.html", "127.0.0.1") for i in range(4)],
        "taskid string, project string, url string, host string",
    ).withColumn(
        "fetch",
        F.struct(
            F.lit(None).cast("string").alias("method"),
            F.lit(None).cast("map<string,string>").alias("headers"),
            F.lit(None).cast("string").alias("data"),
            F.lit(5).alias("timeout"),
            F.lit(None).cast("string").alias("save"),
            F.lit(True).alias("robots_txt"),
            F.lit(None).cast("string").alias("proxy"),
            F.lit(None).cast("boolean").alias("use_gzip"),
        ),
    )
    rules = spark.createDataFrame(
        [("127.0.0.1", "/private", False, 0.0)],
        "host string, path_prefix string, allow boolean, crawl_delay double",
    )
    out = real_fetch_stage(robots_gate(wave, rules))
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "MapInPandas" in plan, plan
    tree = plan.split("\n\n")[0].splitlines()
    # the only join is the broadcast robots gate — no reunite SortMergeJoin
    joins = [l for l in tree if "Join" in l]
    assert all("BroadcastHashJoin" in l for l in joins) and len(joins) == 1, plan
    # the WAVE branch must be shuffle-free: the only Exchange allowed is
    # the tiny per-host rules aggregation inside the broadcast subtree
    bx = next(i for i, l in enumerate(tree) if "BroadcastExchange" in l)
    for i, line in enumerate(tree):
        if "Exchange" in line and "BroadcastExchange" not in line:
            assert i > bx, plan

    _SiteHandler.requests.clear()
    rows = out.collect()
    assert len(rows) == 4 and all(r["status_code"] == 200 for r in rows)
    # pass-through columns survived the kernel
    assert all(r["fetch"]["robots_txt"] is True for r in rows)
    assert all(r["robots_allowed"] is True for r in rows)
    hits = [p for _, p, _ in _SiteHandler.requests]
    assert len(hits) == 4 and set(hits) == {"/a.html"}


def test_wire_304_in_crawl_round(spark, site):
    """VERDICT r03 item 3 end-to-end: second crawl of an ETag'd page sends
    If-None-Match, gets a true 304, skips the callback, finishes SUCCESS."""
    from pyspider_spark.plans.crawl import crawl
    from pyspider_spark.plans.round import RoundState, run_round
    from pyspider_spark.types import ACTIVE

    from pyspider_spark.plans.round import RoundConfig

    seeds = spark.createDataFrame(
        [("p", f"{site}/etag", 0, 0.0)],
        "project string, url string, priority int, exetime double",
    )
    cfg = RoundConfig(
        projects={"p": {"rate": 1e9, "burst": 1e9}},
        loop_limit=1000, fetch_mode="real", conditional_get=True,
    )
    empty_docs = spark.createDataFrame([], "doc_id string, spans array<struct<"
                                       "kind:string,text:string,media_ref:string,offset:int>>")
    report = crawl(spark, seeds, empty_docs, cfg, robots=None, max_rounds=4)
    row = report.frontier.collect()[0]
    assert row["status"] == 2  # SUCCESS
    assert row["track"]["fetch"]["status_code"] == 200
    assert row["track"]["fetch"]["etag"] == '"v1"'

    # recrawl: reset the finished task to ACTIVE/due, keep its track
    recrawl = report.frontier.withColumn("status", F.lit(ACTIVE)).withColumn(
        "schedule", F.col("schedule").withField("exetime", F.lit(0.0))
    ).localCheckpoint()
    _SiteHandler.requests.clear()
    out = run_round(RoundState(frontier=recrawl, round_no=10), empty_docs, cfg)
    [(m, p, hdrs)] = _SiteHandler.requests
    assert (m, p) == ("GET", "/etag")
    assert hdrs.get("If-None-Match") == '"v1"'
    row2 = {r["taskid"]: r for r in out.state.frontier.collect()}.popitem()[1]
    assert row2["status"] == 2  # 304 still finishes SUCCESS
    assert row2["track"]["fetch"]["status_code"] == 304
    assert row2["track"]["fetch"]["etag"] == '"v1"'  # validator retained
    # callback skipped: no result row from the 304
    assert out.results.count() == 0


def test_nan_optionals_normalized(site):
    """Nullable fetch fields can arrive as float NaN through pandas
    batches — the kernel must treat them as unset, not crash."""
    nan = float("nan")
    r = _fetch_one(f"{site}/", nan, None, nan, nan, nan, nan, True)
    assert r["status_code"] == 200 and b"home" in r["content"]
