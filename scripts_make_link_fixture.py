"""Generate the committed link-extraction fixture
(fixtures/link_world/pages.parquet + links_golden.parquet).

Pages carry deterministic Common-Crawl-style HTML (utf-8 bytes, the
``input_hint`` shape) with anchors covering the extraction/resolution
edge set: quote styles (double/single/unquoted), uppercase HREF,
attribute-order and rel variants (``nofollow`` alone, in a token list,
cased), multiline anchors, nested inline tags, entity refs in anchor
text, comments/scripts/styles containing FAKE anchors (must not count),
relative paths (``x``, ``./x``, ``../x``, chains past root),
root-relative, protocol-relative, query-only, fragment-only, empty,
``mailto:``/``javascript:``/``tel:`` schemes, a ``host:port`` base, and
volume pages of regular listing-style links.

Goldens come from an INDEPENDENT implementation: stdlib
``html.parser.HTMLParser`` (event stream — its tokenizer shares nothing
with the engine's regex chain; script/comment content never fires
``handle_starttag``) plus ``urllib.parse.urljoin`` for resolution.
The engine (frontier_engine/links.py, pure JVM expressions) must
byte-match these rows — asserted here at generation time AND by the
``link_extract`` CORRECTNESS row / tests/test_links.py on every run.
"""

from __future__ import annotations

import os
import re
from html.parser import HTMLParser
from urllib.parse import urljoin

import pandas as pd


class _AnchorCollector(HTMLParser):
    """Collect (href_raw, rel, anchor_text) per <a>; anchor text uses
    the engine's normalization (nested tag → space, ws collapsed)."""

    def __init__(self):
        super().__init__(convert_charrefs=False)
        self.links = []
        self._in_a = False
        self._href = None
        self._rel = None
        self._pieces = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            d = dict(attrs)
            self._in_a = True
            self._href = d.get("href")
            self._rel = d.get("rel")
            self._pieces = []
        elif self._in_a:
            self._pieces.append(" ")

    def handle_startendtag(self, tag, attrs):
        if self._in_a and tag != "a":
            self._pieces.append(" ")

    def handle_endtag(self, tag):
        if tag == "a" and self._in_a:
            text = re.sub(r"\s+", " ", "".join(self._pieces)).strip()
            self.links.append((self._href, self._rel, text))
            self._in_a = False
        elif self._in_a:
            self._pieces.append(" ")

    def handle_data(self, data):
        if self._in_a:
            self._pieces.append(data)

    def handle_entityref(self, name):
        if self._in_a:
            self._pieces.append(f"&{name};")

    def handle_charref(self, name):
        if self._in_a:
            self._pieces.append(f"&#{name};")


def golden_links(src_url: str, html: str) -> list[dict]:
    """The independent twin of links.extract_links for one page."""
    p = _AnchorCollector()
    p.feed(html)
    p.close()
    out = []
    for href, rel, text in p.links:
        if href is None:
            continue
        h = re.sub(r"#.*$", "", href.strip())
        if h == "":
            continue
        url = urljoin(src_url, h)
        if not re.match(r"^https?://", url):
            continue
        nofollow = "nofollow" in (rel or "").lower().split()
        out.append(
            {
                "src_url": src_url,
                "href_raw": href,
                "url": url,
                "anchor": text,
                "nofollow": nofollow,
            }
        )
    return out


def _page(host: str, path: str, body: str) -> tuple[str, str]:
    url = f"https://{host}{path}"
    html = (
        "<!DOCTYPE html><html><head><title>page</title>"
        "<style>a.x { color: red } /* <a href=\"/style-trap\">no</a> */</style>"
        "</head><body>\n" + body + "\n</body></html>"
    )
    return url, html


def build_pages() -> list[tuple[str, str]]:
    pages = []
    # --- edge-case page: every extraction/resolution branch ---
    edge_body = """
    <h1>Edge cases</h1>
    <script>var fake = '<a href="/script-trap">no</a>';</script>
    <!-- commented out: <a href="/comment-trap">no</a> -->
    <a href="plain.html">double quoted</a>
    <a href='single.html'>single quoted</a>
    <a href=unquoted.html>unquoted</a>
    <A HREF="UPPER.html">upper tag</A>
    <a class="big" href="attr/after.html" id="k">href not first</a>
    <a href="./dot.html">dot slash</a>
    <a href="../up.html">one up</a>
    <a href="../../twoup.html">two up</a>
    <a href="../../../../past-root.html">past root</a>
    <a href="/rooted.html">root relative</a>
    <a href="?page=2">query only</a>
    <a href="//www.h1.example/proto.html">protocol relative</a>
    <a href="https://www.h2.example/abs.html?x=1#frag">absolute with fragment</a>
    <a href="http://www.h2.example/plain-http.html">plain http</a>
    <a href="#top">fragment only</a>
    <a href="">empty</a>
    <a href="mailto:bob@example.com">mail</a>
    <a href="javascript:void(0)">js</a>
    <a href="tel:+1-555-0100">tel</a>
    <a name="anchor-no-href">no href</a>
    <a href="nested.html">has <b>bold</b> and <img src="i.png" alt="pic"/> inside</a>
    <a href="multi.html">line one
       line two</a>
    <a href="entity.html">Tom &amp; Jerry &#38; co</a>
    <a href="unicode.html">Košiče — čaj</a>
    <a rel="nofollow" href="nf1.html">bare nofollow</a>
    <a rel="nofollow noopener" href="nf2.html">token list</a>
    <a rel="NoFollow" href="nf3.html">cased</a>
    <a rel="noopener" href="follow.html">not nofollow</a>
    <a rel='ugc nofollow' href='nf4.html'>single-quoted rel</a>
    <a href="x/./y/../z.html">inline dots</a>
    <a href="dup.html">first copy</a>
    <a href="dup.html">first copy</a>
    """
    pages.append(_page("www.h0.example", "/dir/sub/edge.html", edge_body))
    # base with query: query-only + relative resolution against it
    pages.append(
        _page(
            "www.h0.example",
            "/search.html?q=old&page=1",
            '<a href="?q=new">requery</a> <a href="next.html">sib</a>',
        )
    )
    # base with port
    pages.append(
        _page(
            "www.h3.example:8080",
            "/a/b/c.html",
            '<a href="../peer.html">port peer</a> <a href="/r.html">port root</a>',
        )
    )
    # host-root base (no path)
    pages.append(("https://www.h4.example", '<a href="welcome.html">root page</a>'))
    # --- volume pages: listing-style link farms across hosts ---
    for k in range(6):
        host = f"www.h{k}.example"
        for p in range(3):
            links = []
            for i in range(18):
                lid = k * 1000 + p * 100 + i
                nf = ' rel="nofollow"' if (i % 7) == 3 else ""
                links.append(
                    f'<a{nf} href="/rooms/{lid}?check_in=2026-0{(i % 9) + 1}-01">'
                    f"Listing {lid}</a>"
                )
                if i % 5 == 2:
                    other = f"www.h{(k + 1 + i) % 6}.example"
                    links.append(
                        f'<a href="https://{other}/rooms/{lid + 50000}">x-host {lid}</a>'
                    )
            pages.append(
                _page(host, f"/s/page{p}.html", "\n".join(links))
            )
    return pages


def main() -> None:
    pages = build_pages()
    gold = []
    for url, html in pages:
        gold.extend(golden_links(url, html))

    os.makedirs("fixtures/link_world", exist_ok=True)
    pd.DataFrame(
        {"url": [u for u, _ in pages], "html": [h.encode("utf-8") for _, h in pages]}
    ).to_parquet("fixtures/link_world/pages.parquet", index=False)
    pd.DataFrame(gold).to_parquet("fixtures/link_world/links_golden.parquet", index=False)
    print(f"pages={len(pages)} golden_links={len(gold)}")

    # sanity: engine output == goldens (multiset), before committing
    from frontier_engine.links import extract_links
    from frontier_engine.session import get_spark

    spark = get_spark(app_name="link-fixture-check", master="local[4]",
                      shuffle_partitions=4)
    df = spark.read.parquet("fixtures/link_world/pages.parquet")
    got = sorted(
        tuple(r) for r in extract_links(df).collect()
    )
    want = sorted(
        (g["src_url"], g["href_raw"], g["url"], g["anchor"], g["nofollow"])
        for g in gold
    )
    assert len(got) == len(want), (len(got), len(want))
    for a, b in zip(got, want):
        assert a == b, f"engine {a!r} != golden {b!r}"
    print("engine == golden on all rows")
    spark.stop()


if __name__ == "__main__":
    main()
