"""P18/D3: canonicalizer unit + property tests (SURVEY §5.1/§5.5)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from frontier_engine.canon import canonicalize, host_of


def test_basic_normalization():
    assert canonicalize("HTTP://WWW.Example.COM:80/a/b?x=1#frag") == "http://www.example.com/a/b?x=1"
    assert canonicalize("https://h.example:443/p") == "https://h.example/p"
    assert canonicalize("https://h.example:8443/p") == "https://h.example:8443/p"
    assert canonicalize("https://h.example") == "https://h.example/"


def test_query_key_sort_is_stable():
    assert canonicalize("https://h/x?b=2&a=1&b=1") == "https://h/x?a=1&b=2&b=1"


def test_percent_encoding_consistent():
    # %7E and ~ normalize to the same canon form
    assert canonicalize("https://h/%7Euser") == canonicalize("https://h/~user")


def test_host_of():
    assert host_of("https://u:p@WWW.Host.com:8080/x") == "www.host.com"
    assert host_of("https://www.bnb0.example/api?x=1") == "www.bnb0.example"


_url_chars = string.ascii_letters + string.digits + ":/?&=%#._-~+,'()!*@;$"


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=_url_chars, min_size=1, max_size=80))
def test_idempotent_on_arbitrary_text(s):
    u = "https://h.example/" + s
    once = canonicalize(u)
    assert canonicalize(once) == once


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=5),
            st.text(alphabet=string.ascii_letters + string.digits, max_size=8),
        ),
        max_size=6,
    )
)
def test_query_sort_idempotent(pairs):
    from urllib.parse import urlencode

    u = "https://h.example/p?" + urlencode(pairs)
    once = canonicalize(u)
    assert canonicalize(once) == once
