"""Property fuzz for the HTML TREE BUILDER (kernel/dom.py) — VERDICT r5
#8. The 142 fixtures are broad but finite and the tokenizer differential
gate (tests/test_fasttok.py) covers the scanning layer; this suite
drives the tree-construction semantics — mismatched closers, table
foster-parenting, implied end tags, rawtext containers, formatting
nesting — with three properties:

1. total: parse_html never raises on any tag soup;
2. structurally sound: parent/child links are mutually consistent and
   the tree is acyclic (walk terminates, every child's parent is the
   node that holds it);
3. stable: repeated serialize→parse converges to a fixed point within
   three rounds, and the fast tokenizer agrees with the stdlib path
   byte-for-byte on the way in. (Strict one-round idempotence is NOT an
   HTML5 property: foster-parented content serializes into positions
   that re-parse differently — e.g. <dt><table><dt> fosters the second
   dt before the table inside the first, and the serialized <dt><dt>
   re-parses as siblings. Real browsers behave identically. We assert
   convergence instead, which still catches oscillation/divergence and
   caught two genuine spec deviations: nested-<table> not treated as an
   implied </table>, and in-body <head> tokens re-entering head.)
"""

from hypothesis import example, given, settings
from hypothesis import strategies as st

from smartreader_spark.kernel import dom

from test_fasttok import _assert_identical

#: tree-construction-heavy fragments: tables (foster parenting), lists
#: and paragraphs (implied end tags), rawtext containers, mismatched and
#: orphan closers, void elements, formatting elements, select/option
_TREE_CHUNKS = [
    "<table>", "</table>", "<tr>", "</tr>", "<td>", "</td>", "<th>",
    "<tbody>", "</tbody>", "<thead>", "<caption>", "</caption>",
    "<colgroup>", "<col>", "table text",
    "<p>", "</p>", "<div>", "</div>", "<span>", "</span>",
    "<ul>", "</ul>", "<li>", "</li>", "<ol>", "<dl>", "<dt>", "<dd>",
    "<b>", "</b>", "<i>", "</i>", "<em>", "<strong>", "</strong>",
    "<a href='x'>", "</a>", "<h1>", "</h1>", "<h2>", "</h3>",
    "<script>", "</script>", "var a = '<td>' < 2;",
    "<style>", "</style>", "p { content: '</p>'; }",
    "<textarea>", "</textarea>", "<title>", "</title>",
    "<select>", "</select>", "<option>", "<optgroup>",
    "<br>", "<img src=i>", "<hr>", "<input>", "<wbr>",
    "<form>", "</form>", "<fieldset>", "<button>", "</button>",
    "</b></i></p></td></table></body></html>",   # orphan-closer burst
    "<body>", "</body>", "<html>", "</html>", "<head>", "</head>",
    "text", " ", "\n", "&amp;", "&#65;", "x<y",
]

_soup = st.lists(st.sampled_from(_TREE_CHUNKS), max_size=40)


def _check_links(node, seen):
    assert id(node) not in seen, "cycle in the tree"
    seen.add(id(node))
    for c in getattr(node, "child_nodes", []):
        assert c.parent is node, (c, node)
        _check_links(c, seen)


def _assert_converges(first_html):
    """serialize→parse must reach a fixed point within three rounds."""
    prev = first_html
    for _ in range(3):
        cur = dom.parse_html(prev).document_element.outer_html
        if cur == prev:
            return
        prev = cur
    raise AssertionError(f"no serialize/parse fixed point: {first_html!r} -> {prev!r}")


@settings(max_examples=400, deadline=None)
@given(_soup)
@example(["<table>", "table text", "<tr>", "<td>", "<p>", "</table>", "tail"])
@example(["<b>", "<i>", "</b>", "</i>", "text"])
@example(["<li>", "<li>", "<ul>", "<li>", "</ul>", "<li>"])
@example(["<select>", "<option>", "a", "<option>", "b", "</select>"])
def test_tree_builder_soup_total_sound_and_stable(chunks):
    html = "".join(chunks)
    doc = dom.parse_html(html)            # property 1: total
    root = doc.document_element
    assert root is not None
    _check_links(root, set())             # property 2: sound
    _assert_converges(root.outer_html)    # property 3: convergence
    _assert_identical(html)               # fast/stdlib differential


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.sampled_from(list("<>/tdrablep b\n'\"=")), max_size=150))
def test_tree_builder_char_soup(html):
    doc = dom.parse_html(html)
    _check_links(doc.document_element, set())
    _assert_converges(doc.document_element.outer_html)
