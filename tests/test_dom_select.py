"""P2 DOM selector accessor (VERDICT r03 item 5): arbitrary CSS selectors
over fetched HTML, the ``response.doc(selector)`` analogue.

The three reference cases ported (same inputs/selectors, clean-room
engine): ``doc('h1')`` and the custom-element ``doc('item')`` from
/root/reference/tests/test_response.py:54,59, and the ``doc('a[href]')``
link walk every sample handler does over the test page from
/root/reference/tests/data_test_webpage.py.
"""

import pytest
from pyspark.sql import functions as F

from pyspider_spark.functions.dom import doc_select, doc_select_first, doc_select_py

# the reference's /pyspider/test.html body (data_test_webpage.py) verbatim
TEST_PAGE = """
<a href="/404">404
<a href="/links/10/0">0
<a href="/links/10/1">1
<a href="/links/10/2">2
<a href="/links/10/3">3
<a href="/links/10/4">4
<a href="/gzip">gzip
<a href="/get">get
<a href="/deflate">deflate
<a href="/html">html
<a href="/xml">xml
<a href="/robots.txt">robots
<a href="/cache">cache
<a href="/stream/20">stream
"""

HTML_DOC = (
    '<html><head><title>Test page</title></head><body>'
    '<h1 class="big">Hello <em>World</em></h1>'
    '<div class="price"><span>42.50</span><b>USD</b></div>'
    '<div class="other"><span>nope</span></div>'
    '<item id="i1">first item</item><item>second item</item>'
    "</body></html>"
)


# -- reference parity (python-side engine) ------------------------------------

def test_ref_case_h1():
    assert doc_select_py(HTML_DOC, "h1") == ["Hello World"]


def test_ref_case_custom_element_item():
    # test_response.py:59 selects a non-HTML <item> element
    assert doc_select_py(HTML_DOC, "item") == ["first item", "second item"]


def test_ref_case_a_href_walk():
    hrefs = doc_select_py(TEST_PAGE, "a[href]", "href")
    assert hrefs == [
        "/404", "/links/10/0", "/links/10/1", "/links/10/2", "/links/10/3",
        "/links/10/4", "/gzip", "/get", "/deflate", "/html", "/xml",
        "/robots.txt", "/cache", "/stream/20",
    ]


def test_selector_subset_semantics():
    assert doc_select_py(HTML_DOC, "div.price span") == ["42.50"]
    assert doc_select_py(HTML_DOC, "#i1") == ["first item"]
    assert doc_select_py(HTML_DOC, "h1.big") == ["Hello World"]
    assert doc_select_py(HTML_DOC, "body > h1") == ["Hello World"]
    assert doc_select_py(HTML_DOC, "h1, title") == ["Test page", "Hello World"] or \
        set(doc_select_py(HTML_DOC, "h1, title")) == {"Test page", "Hello World"}
    assert doc_select_py(HTML_DOC, "div.other > b") == []
    assert doc_select_py(None, "h1") == []


def test_unsupported_selector_fails_at_build_time():
    with pytest.raises(ValueError):
        doc_select_py(HTML_DOC, "a:nth-child(2)")


# -- Spark column API ---------------------------------------------------------

def test_doc_select_column(spark):
    df = spark.createDataFrame(
        [("d1", HTML_DOC), ("d2", TEST_PAGE), ("d3", None)], "doc_id string, html string"
    )
    out = (
        df.select(
            "doc_id",
            doc_select(F.col("html"), "a[href]", "href").alias("hrefs"),
            doc_select_first(F.col("html"), "title").alias("title"),
            doc_select(F.col("html"), "div.price span").alias("price"),
        )
        .orderBy("doc_id")
        .collect()
    )
    d1, d2, d3 = out
    assert d1["title"] == "Test page" and d1["price"] == ["42.50"]
    assert len(d2["hrefs"]) == 14 and d2["hrefs"][0] == "/404"
    assert d3["hrefs"] == [] and d3["title"] is None

    # invalid selectors fail at expression build, not per row
    with pytest.raises(ValueError):
        doc_select(F.col("html"), "a::before")
