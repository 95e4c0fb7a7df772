"""P9 byte-parity: html_to_text semantics (SURVEY §5.2 + §7 risk list)."""

import pytest

from frontier_engine.html_text import html_to_text


def test_entities_decoded():
    assert html_to_text("a &amp; b &lt;c&gt; &#8212; d") == "a & b <c> — d"


def test_comments_dropped_nested_kept():
    assert html_to_text("<b>Hi<!-- secret --></b><p>x<i>y</i>z</p>") == "Hixyz"


def test_script_text_included():
    # lxml text_content() includes script/style text
    assert html_to_text('<p>a</p><script id="s">var x=1;</script>') == "avar x=1;"


def test_none_passthrough():
    assert html_to_text(None) is None


def test_br_and_void_elements():
    assert html_to_text("line1<br/>line2<img src='x'/>end") == "line1line2end"


def test_fixture_style_description():
    html = "<b>Welcome!</b><br/>Caf&eacute;s &amp; parks <i>nearby</i>."
    assert html_to_text(html) == "Welcome!Cafés & parks nearby."


@pytest.mark.skipif(
    __import__("importlib").util.find_spec("lxml") is None,
    reason="lxml not installed in sandbox — fallback is the defining impl here",
)
def test_lxml_parity_on_fixture_corpus(world):
    import lxml.html

    for _, row in world["pages"].iterrows():
        h = row["html"].decode("utf-8")
        assert html_to_text(h) == lxml.html.document_fromstring(h).text_content()


def test_map_in_arrow_matches_pandas_udf_on_fixture_corpus(spark, world):
    """r4 mapInArrow path (html_bytes_to_text_arrow) is byte-identical to
    the pandas_udf twin over the whole fixture corpus, including keep
    passthrough, null html, and column pruning of the html bytes."""
    import pyspark.sql.functions as F

    from frontier_engine.html_text import (
        html_bytes_to_text_arrow, html_bytes_to_text_udf,
    )

    pages = spark.createDataFrame(world["pages"][["url", "html"]])
    pages = pages.unionByName(
        spark.createDataFrame([("null://page", None)], pages.schema)
    )
    got = html_bytes_to_text_arrow(pages, keep=("url",))
    assert got.columns == ["url", "text"]  # html never crosses back
    want = pages.select("url", html_bytes_to_text_udf(F.col("html")).alias("text"))
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, want.collect()))
    assert a == b and len(a) == pages.count()
