"""URL kernel semantics vs the reference contract
(/root/reference/pyspider/libs/url.py:29-70, base_handler.py:342-344)."""

import pandas as pd

from pyspider_spark.functions.urlkit import _canonicalize_batch, canonicalize_url


def test_strip_and_default_path():
    assert canonicalize_url("  http://a.test  ") == "http://a.test/"
    assert canonicalize_url("http://a.test?q=1") == "http://a.test/?q=1"


def test_scheme_lowercased_host_preserved():
    # urlparse lowercases the scheme; idna leaves all-ASCII hosts as-is
    # (matching the reference: netloc.encode('idna') on ASCII is identity)
    assert canonicalize_url("HTTP://a.test/x") == "http://a.test/x"
    assert canonicalize_url("http://A.TEST/x") == "http://A.TEST/x"


def test_relative_join():
    base = "http://a.test/dir/page?n=1"
    assert canonicalize_url("/page?n=2", base) == "http://a.test/page?n=2"
    assert canonicalize_url("other", base) == "http://a.test/dir/other"
    assert canonicalize_url("?n=3", base) == "http://a.test/dir/page?n=3"


def test_non_ascii_percent_encoded():
    # quote_chinese semantics: non-ASCII bytes -> %XX of utf-8 encoding
    out = canonicalize_url("http://a.test/中文")
    assert out == "http://a.test/%E4%B8%AD%E6%96%87"


def test_idna_host():
    out = canonicalize_url("http://中文.test/x")
    assert out == "http://xn--fiq228c.test/x"


def test_fragment_kept():
    assert canonicalize_url("http://a.test/x#frag") == "http://a.test/x#frag"


def test_batch_matches_scalar():
    hrefs = [
        "http://a.test/x?q=1",
        "  http://a.test/pad ",
        "/rel?n=2",
        "HTTP://b.test/up",
        "http://a.test",
        "http://a.test/中文",
        None,
        "HTTP://a.test?q=1",            # D + uppercase scheme
        "http://a.test#frag",           # D + fragment
        "http://A.TEST/x",              # uppercase host preserved
        "http://u:p@h.test:8080/x",     # userinfo+port
        "//proto.test/rel",             # protocol-relative -> fallback
        "?q=override",                  # query-relative -> fallback
        "sub/path",                     # path-relative -> fallback
        "/",                            # bare root
        "http://a.test/x;params?q#f",   # params segment
        "http://a.test//double//slash",
        "ftp://a.test/f",               # other scheme
        "",                             # empty
        "/rel with space",
    ]
    bases = ["http://Base.TEST/dir/page?x=1"] * len(hrefs)
    got = _canonicalize_batch(pd.Series(hrefs), pd.Series(bases))
    want = [canonicalize_url(h, b) if h is not None else None for h, b in zip(hrefs, bases)]
    assert list(got) == want


def test_batch_matches_scalar_hypothesis():
    from hypothesis import given, settings, strategies as st

    scheme = st.sampled_from(["http", "HTTP", "https", "HtTpS"])
    host = st.sampled_from(["a.test", "B.Example.COM", "x-y.test:8080", "名.test"])
    path = st.sampled_from(["", "/", "/p", "/p/q?r=1", "?q=1", "#f", "/中文", "/p q"])
    absolute = st.builds(lambda s, h, p: f"{s}://{h}{p}", scheme, host, path)
    relative = st.sampled_from(["/r", "/r?x=1", "r/s", "../up", "?q", "#f", "//other.test/p"])
    href = st.one_of(absolute, relative).map(lambda u: " " + u + " ")
    base = st.builds(lambda s, h, p: f"{s}://{h}{p}", scheme, host, path)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.tuples(href, base), min_size=1, max_size=30))
    def check(pairs):
        hs = pd.Series([h for h, _ in pairs])
        bs = pd.Series([b for _, b in pairs])
        got = list(_canonicalize_batch(hs, bs))
        want = [canonicalize_url(h, b) for h, b in pairs]
        assert got == want

    check()
