"""Differential gate for the fast tokenizer (kernel/fasttok.py): for any
input, parsing with the fast scanner and with the stdlib html.parser path
must produce byte-identical serialized trees."""

import glob
import os

import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st

from smartreader_spark.kernel import dom, fasttok

PAGES = "/root/reference/src/SmartReaderTests/test-pages"


def _fast_tree(html: str) -> str:
    tb = dom._TreeBuilder()
    try:
        fasttok.tokenize(html, tb)
    except fasttok.FastTokenizerBail:
        # production (dom.parse_html) re-parses with stdlib on a bail —
        # the comparison is then trivially identical by construction
        return _slow_tree(html)
    tb._flush_text()
    return tb.doc.document_element.outer_html


def _slow_tree(html: str) -> str:
    tb = dom._TreeBuilder()
    try:
        tb.feed(html)
        tb.close()
    except Exception:
        tb._flush_text()
    return tb.doc.document_element.outer_html


def _assert_identical(html: str) -> None:
    assert _fast_tree(html) == _slow_tree(html)


@pytest.mark.parametrize(
    "name",
    sorted(os.path.basename(os.path.dirname(p))
           for p in glob.glob(os.path.join(PAGES, "*", "source.html"))),
)
def test_differential_on_fixture_sources(name):
    for fn in ("source.html", "expected.html"):
        html = open(os.path.join(PAGES, name, fn),
                    encoding="utf-8", errors="replace").read()
        if html.startswith("﻿"):
            html = html.lstrip("﻿")
        _assert_identical(html)


EDGE_CASES = [
    "",
    "plain text only & amp; &amp; &#65; &#x41; &notanentity;",
    "<p>a<p>b</p>",
    "<defs/>",  # self-closing where the locator consumes the '/'
    "<br></br>",  # </br> acts as a start tag downstream
    "<p a>bare attr</p>",
    "<a href='x' title=\"y>z\">quoted gt</a>",  # '>' inside quoted attr
    '<a href="unclosed>text</a>',  # unclosed quote
    "<script>if (a < b && c > d) { x; }</script>after",
    "<script>partial </scriptx> still data</script>tail",
    "<script>x</script</script>tail",  # partial closer right before real one
    "<script></script",  # unterminated partial closer at EOF
    "<style>a</style </style>b",  # '</style ' has trailing space, no '>'
    "<script>x</ScRiPt >y",  # case+space tolerant closer
    "<script>never closed",
    "<script/>not cdata</script>",
    "<script src='x'/>also not cdata",
    "<style>p { color: red; } /* </p> */</style>",
    "<!-- comment --><p>x</p>",
    "<!-- unterminated comment <p>y</p>",
    "<!doctype html><p>z</p>",
    "<![CDATA[ raw ]]><p>m</p>",
    "<! bogus decl ><p>n</p>",
    "</ bogus endtag ><p>o</p>",
    "</>empty endtag<p>q</p>",
    "</p junk>after junked endtag",
    "<p\nclass='multi\nline'>nl</p>",
    "< notatag <p>r</p>",
    "<p attr=&amp;>entity in attr</p>",
    "<p =weird>equals first</p>",
    "text < 5 and > 3",
    "<p" ,  # truncated tag at EOF
    "<p class='unclosed",
    "<table><tr><td>a<td>b<tr><td>c</table>",
    "<p>\x00null</p>",
    "<input type=checkbox checked>",
]


@pytest.mark.parametrize("html", EDGE_CASES)
def test_differential_edge_cases(html):
    _assert_identical(html)


_soup = st.text(
    alphabet=st.sampled_from(list("<>/=&;\"' abAB\n\t-!?#[]xyzp1")), max_size=220
)


@settings(max_examples=300, deadline=None)
@given(_soup)
def test_differential_random_markup_soup(html):
    _assert_identical(html)


_chunks = st.lists(
    st.sampled_from([
        "<script>", "</script>", "</script", "<script/>", "<style>", "</style>",
        "<p ", "<p>", "</p>", "<div class='a'>", "<br/>", "<defs/>",
        'a="b"', "a='b", "a=b", "=x", "/", ">", "<", "/>", "<!--", "-->",
        "<![CDATA[", "]>", "<!doctype html>", "<!", "</", "<?", "?>",
        "&amp;", "&#65;", "&bogus", "text", " ", "\n", "'", '"',
    ]),
    max_size=30,
)


@settings(max_examples=300, deadline=None)
@given(_chunks)
@example(
    chunks=["<script>", "</script", "</script>"],
).via("discovered failure")
def test_differential_random_tag_chunks(chunks):
    _assert_identical("".join(chunks))
