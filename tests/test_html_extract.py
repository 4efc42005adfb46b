"""Markup extraction (text_analysis.strip_markup / html_extract)."""

from __future__ import annotations

from beyond_vector_search_spark.operators.text_analysis import html_extract


def _extract(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return html_extract(df).first()


def test_basic_tags_and_paragraph_breaks(spark):
    r = _extract(spark, "<html><body><p>hello <b>world</b></p><p>again</p></body></html>")
    assert r["text"] == "hello world again"  # </p> became whitespace
    assert r["n_tags"] > 0 and r["n_chars_text"] < r["n_chars_raw"]


def test_script_style_and_comment_payloads_dropped(spark):
    html = (
        "<head><style>p { color: red; }</style>"
        "<script type='x'>var a = '<p>not text</p>';</script></head>"
        "<body>kept<!-- a comment with <b>tags</b> --> text</body>"
    )
    r = _extract(spark, html)
    assert r["text"] == "kept text"
    assert "color" not in r["text"] and "var a" not in r["text"]


def test_entities_unescape_in_order(spark):
    r = _extract(spark, "<p>a &lt;tag&gt; &amp;&nbsp;b &quot;q&quot; it&#39;s</p>")
    assert r["text"] == "a <tag> & b \"q\" it's"
    # double-escaped input must single-unescape (&amp; applied last)
    r2 = _extract(spark, "x &amp;lt; y")
    assert r2["text"] == "x &lt; y"


def test_br_and_whitespace_collapse(spark):
    r = _extract(spark, "a<br/>b\n\n   c\t d")
    assert r["text"] == "a b c d"


def test_unknown_entities_pass_through(spark):
    r = _extract(spark, "<p>&copy; 2026 &mdash; fine</p>")
    assert r["text"] == "&copy; 2026 &mdash; fine"


def test_null_html_stays_null(spark):
    df = spark.sql("SELECT CAST(1 AS LONG) doc_id, CAST(NULL AS STRING) html")
    r = html_extract(df).first()
    assert r["text"] is None and r["n_tags"] is None
