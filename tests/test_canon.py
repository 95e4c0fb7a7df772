"""P18/D3: canonicalizer unit + property tests (SURVEY §5.1/§5.5).

The canonical form is JVM-expression-computable; :func:`canonicalize` is
the pure-Python twin. Twin equality (expr == python, byte-for-byte) is
itself a test here — it is what makes the simulator's seen-set comparable
to the engine's.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from frontier_engine.canon import canonicalize, host_of


def test_basic_normalization():
    assert canonicalize("HTTP://WWW.Example.COM:80/a/b?x=1#frag") == "http://www.example.com/a/b?x=1"
    assert canonicalize("https://h.example:443/p") == "https://h.example/p"
    assert canonicalize("https://h.example:8443/p") == "https://h.example:8443/p"
    assert canonicalize("https://h.example") == "https://h.example/"
    assert canonicalize("https://h.example?a=1") == "https://h.example/?a=1"


def test_query_pair_sort():
    assert canonicalize("https://h/x?b=2&a=1&b=1") == "https://h/x?a=1&b=1&b=2"


def test_userinfo_preserved_host_lowered():
    assert canonicalize("https://User:P@HOST.Example/x") == "https://User:P@host.example/x"


def test_host_of():
    assert host_of("https://u:p@WWW.Host.com:8080/x") == "www.host.com"
    assert host_of("https://www.bnb0.example/api?x=1") == "www.bnb0.example"


_url_chars = string.ascii_letters + string.digits + ":/?&=%._-~+,'()!*@;$"


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=_url_chars, min_size=1, max_size=80))
def test_idempotent_on_arbitrary_text(s):
    u = "https://h.example/" + s
    once = canonicalize(u)
    assert canonicalize(once) == once


def test_expr_twin_equality(spark, pages_df):
    """canonicalize_expr == canonicalize and host_expr == host_of,
    byte-for-byte, over the whole fixture URL corpus plus adversarial
    synthetic URLs."""
    import pandas as pd
    from pyspark.sql import functions as F

    from frontier_engine.canon import canonicalize_expr, host_expr

    extra = [
        "HTTPS://A.B:443/Page/7?b=2&a=1#frag",
        "http://x.y:80/",
        "http://x.y:8080/p?z",
        "https://u:p@H.I/j?k=1&k=0",
        "https://h.example",
        "https://h/?",
        "https://h/p?a=1?b=2",
        "notaurl",
        "https://h/p#f1#f2",
    ]
    urls = pages_df.select("url").toPandas()["url"].tolist() + extra
    df = spark.createDataFrame(pd.DataFrame({"u": urls}))
    got = df.select(
        "u", canonicalize_expr(F.col("u")).alias("c"), host_expr(F.col("u")).alias("h")
    ).collect()
    for r in got:
        assert r.c == canonicalize(r.u), f"canon twin mismatch for {r.u!r}: {r.c!r}"
        if "://" in r.u:
            assert r.h == host_of(r.u), f"host twin mismatch for {r.u!r}: {r.h!r}"
