"""P2 response accessors (encoding detect + .text/.json over raw bytes)
and X3 cookie-jar accumulation across redirect hops — semantics of
pyspider/libs/response.py:60-163 / cookie_utils.py, mirrored against the
reference's fetcher-processor test cases."""

from pyspark.sql import functions as F

from pyspider_spark.functions.response import (
    detect_encoding,
    response_json,
    with_response_text,
)
from pyspider_spark.operators.fetch import resolve_redirects


def test_detect_encoding_scalar_rules():
    # 1) header charset wins, quotes stripped
    assert detect_encoding(b"x", 'text/html; charset="ISO-8859-1"') == "ISO-8859-1"
    # 2) meta charset when no header
    assert detect_encoding(b'<meta charset="utf-16">hi', None) == "utf-16"
    # 2b) http-equiv pragma form
    assert (
        detect_encoding(b'<meta http-equiv="Content-Type" content="text/html; charset=big5">', None)
        == "big5"
    )
    # 2c) xml declaration
    assert detect_encoding(b"<?xml version='1.0' encoding='koi8-r'?>", None) == "koi8-r"
    # gb2312 upgrades to its superset
    assert detect_encoding(b"x", "text/html; charset=gb2312") == "gb18030"
    assert detect_encoding(b'<meta charset="GB2312">', None) == "gb18030"
    # 4) empty content -> utf-8 default
    assert detect_encoding(b"", None) == "utf-8"
    assert detect_encoding(None, None) == "utf-8"


def test_text_decode_batch(spark):
    rows = [
        ("latin", "caf\xe9".encode("latin-1"), "text/html; charset=latin-1"),
        ("gb", '<meta charset="gb2312">你好'.encode("gb18030"), None),
        ("utf8", "héllo 世界".encode(), None),
        ("empty", b"", None),
        ("badcodec", b"abc", "text/html; charset=no-such-codec"),
    ]
    df = spark.createDataFrame(rows, "name string, content binary, content_type string")
    got = {r["name"]: r for r in with_response_text(df).collect()}
    assert got["latin"]["encoding"] == "latin-1" and got["latin"]["text"] == "caf\xe9"
    assert got["gb"]["encoding"] == "gb18030"
    assert got["gb"]["text"].endswith("你好")
    assert got["utf8"]["text"] == "héllo 世界"
    assert got["empty"]["text"] == ""
    assert got["badcodec"]["text"] == "abc"  # LookupError -> utf-8 fallback


def test_response_json_accessor(spark):
    df = spark.createDataFrame(
        [("ok", '{"a": 1, "b": [2, 3]}'), ("bad", "{nope"), ("null", None)],
        "name string, text string",
    )
    got = {
        r["name"]: r["j"]
        for r in df.select("name", F.to_json(response_json(F.col("text"))).alias("j")).collect()
    }
    assert got["ok"] == '{"a":1,"b":[2,3]}'
    assert got["bad"] is None and got["null"] is None


def test_cookie_jar_accumulates_across_hops(spark):
    wave = spark.createDataFrame(
        [("t1", "http://h/a"), ("t2", "http://h/plain")], "taskid string, url string"
    )
    redirects = spark.createDataFrame(
        [
            ("http://h/a", "http://h/b", {"sess": "1", "tok": "a"}),
            ("http://h/b", "http://h/c", {"tok": "b"}),
        ],
        "from_url string, to_url string, set_cookie map<string,string>",
    )
    got = {r["taskid"]: r for r in resolve_redirects(wave, redirects, 5).collect()}
    assert got["t1"]["resolved_url"] == "http://h/c"
    # later hop's Set-Cookie overrides, earlier keys survive
    assert got["t1"]["cookie_jar"] == {"sess": "1", "tok": "b"}
    assert got["t2"]["resolved_url"] == "http://h/plain"
    assert got["t2"]["cookie_jar"] is None


def test_cookieless_redirect_table_unchanged(spark):
    wave = spark.createDataFrame([("t1", "http://h/a")], "taskid string, url string")
    redirects = spark.createDataFrame(
        [("http://h/a", "http://h/b")], "from_url string, to_url string"
    )
    out = resolve_redirects(wave, redirects, 5)
    assert "cookie_jar" not in out.columns
    assert out.collect()[0]["resolved_url"] == "http://h/b"
