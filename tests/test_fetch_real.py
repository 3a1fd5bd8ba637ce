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

    def do_GET(self):
        if self.path in self.pages:
            self._send(200, self.pages[self.path].encode())
        elif self.path == "/echo-headers":
            hdrs = {k: v for k, v in self.headers.items()}
            self._send(200, json.dumps(hdrs).encode(), "application/json")
        elif self.path == "/gzip":
            body = gzip.compress(b"<title>gzipped page</title>")
            self._send(200, body, extra={"Content-Encoding": "gzip"})
        elif self.path == "/redirect":
            self.send_response(302)
            self.send_header("Location", "/a.html")
            self.send_header("Content-Length", "0")
            self.end_headers()
        else:
            self._send(404, b"not found", "text/plain")

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        self._send(200, json.dumps({"posted": body.decode()}).encode(), "application/json")


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


def test_nan_optionals_normalized(site):
    """Nullable fetch fields can arrive as float NaN through pandas
    batches — the kernel must treat them as unset, not crash."""
    nan = float("nan")
    r = _fetch_one(f"{site}/", nan, None, nan, nan, nan, nan, True)
    assert r["status_code"] == 200 and b"home" in r["content"]
