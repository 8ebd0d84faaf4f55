"""Unit tests for operators/html.py — boilerplate extraction on planted
pages with known expected output (content equality, not just counts)."""

import pytest
from pyspark.sql import functions as F

from rusty_bloomfilter_spark.operators.html import extract_text

PAGE = (
    "<!DOCTYPE html><html><head><title>t</title>"
    "<style>p{margin:0}</style><script src='a.js'></script></head><body>"
    '<nav><ul><li><a href="/">Home</a></li><li><a href="/x">X</a></li></ul></nav>'
    "<header><h1>Site</h1></header>"
    "<!-- build 42 -->"
    '<div id="main"><p>This paragraph carries the actual article content '
    "of the page and is comfortably long.</p>"
    "<p>Second paragraph with planted entities: &amp; &lt;tag&gt; &quot;q&quot; "
    "and&nbsp;joined words, long enough to keep.</p></div>"
    '<aside><p>More: <a href="/1">one</a> <a href="/2">two</a> <a href="/3">three</a></p></aside>'
    "<footer><p>© corp legal text that is quite long but lives in a footer "
    "block and must be removed wholesale</p></footer>"
    "<script>var x=1; if (x<2) { x = 3; }</script></body></html>"
)

EXPECTED = (
    "This paragraph carries the actual article content of the page and is "
    "comfortably long. "
    'Second paragraph with planted entities: & <tag> "q" and joined words, '
    "long enough to keep."
)


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(
        [("d1", PAGE), ("d2", "<html><body><p>too short</p></body></html>")],
        "doc_id string, html string",
    )


def test_extract_keeps_only_content(pages):
    rows = {r["doc_id"]: r for r in extract_text(pages).collect()}
    assert rows["d1"]["text"] == EXPECTED
    assert rows["d1"]["n_kept"] == 2
    # nav/footer/script/comment markers never leak
    for marker in ("Home", "var x=1", "© corp", "Site", "build 42", "margin"):
        assert marker not in rows["d1"]["text"]


def test_short_and_linkdense_dropped(pages):
    rows = {r["doc_id"]: r for r in extract_text(pages).collect()}
    assert rows["d2"]["n_kept"] == 0
    assert rows["d2"]["text"] == ""


def test_deterministic_under_repartition(pages):
    a = extract_text(pages).orderBy("doc_id").collect()
    b = extract_text(pages.repartition(7)).orderBy("doc_id").collect()
    assert a == b


def test_uppercase_and_pre_boundaries(spark):
    """<SCRIPT>/<NAV> strip case-insensitively; <pre>/<param> are NOT
    split boundaries for the p/table alternatives (r5 review catch)."""
    page = (
        "<html><body>"
        "<NAV><a href='/'>Home</a></NAV>"
        "<SCRIPT>var secret=1;</SCRIPT>"
        "<P>Mixed-case paragraph long enough to pass the keep rule fine.</P>"
        "<pre>inline-pre should stay part of its surrounding segment "
        "and not split</pre>"
        "</body></html>"
    )
    df = spark.createDataFrame([("u1", page)], "doc_id string, html string")
    from rusty_bloomfilter_spark.operators.html import extract_text

    row = extract_text(df).collect()[0]
    assert "secret" not in row["text"]
    assert "Home" not in row["text"]
    assert "Mixed-case paragraph" in row["text"]
    # the <pre> element did not split: its text stays one segment with
    # the surrounding body text and survives as one kept chunk
    assert "inline-pre should stay part of its surrounding segment" in row["text"]
