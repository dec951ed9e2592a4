"""HTML parser + CSS matcher unit coverage beyond the fixture suite."""

import pytest

from sift_spark.core import css
from sift_spark.core.htmlparser import parse, unescape


# ---- parser -----------------------------------------------------------------------


def test_basic_tree():
    root = parse("<div><p>hello <b>world</b></p></div>")
    div = root.children[0]
    assert div.tag == "div"
    p = div.children[0]
    assert p.tag == "p"
    assert p.inner_text() == "hello world"


def test_void_and_self_closing():
    root = parse("<p>a<br>b<img src='x'/>c<hr></p>")
    p = root.children[0]
    # <hr> implicitly closes <p> (HTML5), so it lands as a sibling
    assert [c.tag for c in p.children if c.tag] == ["br", "img"]
    assert [c.tag for c in root.children] == ["p", "hr"]
    assert p.inner_text() == "abc"


def test_implicit_p_close():
    root = parse("<p>one<p>two<div>three</div>")
    assert [c.tag for c in root.children] == ["p", "p", "div"]


def test_implicit_li_close():
    root = parse("<ul><li>a<li>b<li>c</ul>")
    ul = root.children[0]
    assert [c.tag for c in ul.children if c.tag] == ["li", "li", "li"]


def test_stray_end_tag_ignored():
    root = parse("<div>a</span>b</div>")
    assert root.children[0].inner_text() == "ab"


def test_attributes():
    root = parse('<a href="/x" class=btn disabled data-k=\'v\'>t</a>')
    a = root.children[0]
    assert a.attrs == {"href": "/x", "class": "btn", "disabled": "",
                       "data-k": "v"}


def test_script_style_raw():
    root = parse("<div><script>if (a < b) { x(); }</script><p>ok</p></div>")
    div = root.children[0]
    assert [c.tag for c in div.children if c.tag] == ["script", "p"]
    assert div.inner_text() == "ok"


def test_comment_and_doctype_skipped():
    root = parse("<!DOCTYPE html><!-- note --><p>x</p>")
    assert [c.tag for c in root.children if c.tag] == ["p"]


def test_entities():
    # &nbsp; -> U+00A0 (x/net/html behavior the reference sees)
    assert unescape("a &amp; b &lt;c&gt; &#65; &#x42; &nbsp;") == (
        "a & b <c> A B  "
    )
    root = parse("<p>fish &amp; chips</p>")
    assert root.children[0].inner_text() == "fish & chips"


def test_attribute_with_gt_in_quotes():
    root = parse('<div title="a > b">x</div>')
    assert root.children[0].attrs["title"] == "a > b"


def test_unclosed_at_eof():
    root = parse("<div><p>dangling")
    assert root.children[0].children[0].inner_text() == "dangling"


# ---- css --------------------------------------------------------------------------

DOC = parse(
    '<html><body>'
    '<div id="main" class="wrap outer">'
    '  <p class="lead intro">first</p>'
    '  <section><p>second</p><span data-x="1">s</span></section>'
    '</div>'
    '<p>third</p>'
    "</body></html>"
)


def _texts(selector):
    return [n.inner_text() for n in css.select(DOC, selector)]


def test_tag_selector():
    assert _texts("p") == ["first", "second", "third"]


def test_class_selector():
    assert _texts(".lead") == ["first"]
    assert _texts("p.intro.lead") == ["first"]


def test_id_selector():
    assert len(css.select(DOC, "#main")) == 1


def test_descendant_and_child():
    assert _texts("div p") == ["first", "second"]
    assert _texts("div > p") == ["first"]
    assert _texts("section > p") == ["second"]


def test_attribute_selector():
    assert _texts("[data-x]") == ["s"]
    assert _texts('[data-x="1"]') == ["s"]
    assert _texts('[data-x="2"]') == []


def test_selector_list():
    assert _texts(".lead, section p") == ["first", "second"]


def test_universal():
    assert "first" in _texts("*")


@pytest.mark.parametrize("bad", [">>invalid<<", "", "  ", "div >", "> p",
                                 "..x", "#"])
def test_invalid_selectors(bad):
    with pytest.raises(css.SelectorError):
        css.compile_selector(bad)


# ---- round-3 long tail: sibling combinators + child-position pseudos ---------------

SIBLING_DOC = parse("""<html><body>
<article>
 <p id="a">first para</p>
 <p id="b">second para</p>
 <div id="c">a div</div>
 <p id="d">third para</p>
</article>
<section>
 <h2 id="h">header</h2>
 <p id="e">after header</p>
 <p id="f">second after</p>
</section>
</body></html>""")


def _ids(selector):
    return [n.attrs.get("id") for n in css.select(SIBLING_DOC, selector)]


@pytest.mark.parametrize("selector,expected", [
    # child-position pseudo-classes (indexes count ELEMENT children:
    # article = p,p,div,p; section = h2,p,p)
    ("p:first-child", ["a"]),
    ("article > p:first-child", ["a"]),
    ("p:last-child", ["d", "f"]),
    ("div:last-child", []),
    ("article :nth-child(2)", ["b"]),
    ("article :nth-child(3)", ["c"]),
    ("p:nth-child(odd)", ["a", "f"]),       # d is child 4 (after the div)
    ("p:nth-child(even)", ["b", "d", "e"]),
    ("p:nth-child(2n+1)", ["a", "f"]),
    ("p:nth-child(-n+2)", ["a", "b", "e"]),
    ("p:nth-child( 2n + 1 )", ["a", "f"]),  # whitespace inside parens ok
    ("p:nth-child(n)", ["a", "b", "d", "e", "f"]),
    ("article p:nth-child(3)", []),          # child 3 is the div
    # sibling combinators
    ("h2 + p", ["e"]),
    ("h2 ~ p", ["e", "f"]),
    ("p + p", ["b", "f"]),
    ("p ~ p", ["b", "d", "f"]),
    ("div + p", ["d"]),
    ("div ~ p", ["d"]),
    ("p + div", ["c"]),
    # compositions
    ("p:first-child + p", ["b"]),
    ("section > h2 + p", ["e"]),
    ("article > p:last-child", ["d"]),
])
def test_sibling_and_pseudo_selectors(selector, expected):
    assert _ids(selector) == expected


@pytest.mark.parametrize("bad", [
    ":unknown", "p:", "p:nth-child", "p:nth-child()", "p:nth-child(x)",
    "p:first-child(2)", "+ p", "p +", "p + + q", "p ~", "~ p",
])
def test_invalid_pseudo_and_sibling_selectors(bad):
    with pytest.raises(css.SelectorError):
        css.compile_selector(bad)


# ---- :not / -of-type / :only-child / :empty family ---------------------------------

TYPE_DOC = parse("""<html><body>
<article>
 <p id="a" class="lead">first para</p>
 <p id="b">second para</p>
 <div id="c">a div</div>
 <p id="d">third para</p>
 <span id="s1"></span>
 <span id="s2">text</span>
</article>
</body></html>""")


def _tids(selector):
    return [n.attrs.get("id") for n in css.select(TYPE_DOC, selector)]


@pytest.mark.parametrize("selector,expected", [
    (":not(.lead)", None),  # checked separately (includes html/body)
    ("p:not(.lead)", ["b", "d"]),
    ("article :not(p)", ["c", "s1", "s2"]),
    ("p:not(#b):not(.lead)", ["d"]),  # stacked :not
    ("p:first-of-type", ["a"]),
    ("p:last-of-type", ["d"]),
    ("div:first-of-type", ["c"]),
    ("p:nth-of-type(2)", ["b"]),
    ("p:nth-of-type(3)", ["d"]),      # 4th child but 3rd p
    ("p:nth-of-type(odd)", ["a", "d"]),
    ("div:only-of-type", ["c"]),
    ("p:only-of-type", []),
    ("div:only-child", []),
    ("span:empty", ["s1"]),
    ("p:empty", []),
])
def test_type_family_pseudo_selectors(selector, expected):
    if expected is not None:
        assert _tids(selector) == expected


@pytest.mark.parametrize("bad", [
    "p:not()", "p:not( )", "p:not(div p)", "p:not(a>b)", "p:not(a,b)",
    "p:only-child(2)", "p:empty(1)", "p:nth-of-type", "p:first-of-type(2)",
])
def test_invalid_type_family_selectors(bad):
    with pytest.raises(css.SelectorError):
        css.compile_selector(bad)


# ---- property-based selector invariants ---------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def small_html(draw):
    """Random small element trees: 2 levels, varied tags/classes."""
    tags = st.sampled_from(["p", "div", "span", "li", "h2"])
    classes = st.sampled_from(["", "a", "b", "lead"])

    def element(i, depth):
        tag = draw(tags)
        cls = draw(classes)
        attr = f' class="{cls}"' if cls else ""
        if depth > 0 and draw(st.booleans()):
            inner = "".join(
                element(j, depth - 1)
                for j in range(draw(st.integers(0, 3)))
            )
        else:
            inner = f"text{i}"
        return f"<{tag}{attr}>{inner}</{tag}>"

    body = "".join(element(i, 2) for i in range(draw(st.integers(1, 5))))
    return f"<html><body>{body}</body></html>"


@given(small_html())
@settings(max_examples=150, deadline=None)
def test_selector_algebra_invariants(html):
    root = parse(html)

    def ids_of(sel):
        return [id(n) for n in css.select(root, sel)]

    # :first-child is :nth-child(1); :last-child mirrors first on reverse
    for tag in ("p", "div", "span", "*"):
        assert ids_of(f"{tag}:first-child") == ids_of(f"{tag}:nth-child(1)")
        # odd + even partition all positioned elements
        odd = set(ids_of(f"{tag}:nth-child(odd)"))
        even = set(ids_of(f"{tag}:nth-child(even)"))
        assert odd.isdisjoint(even)
        assert odd | even == set(ids_of(f"{tag}:nth-child(n)"))
        # adjacent sibling is a subset of general sibling
        assert set(ids_of(f"div + {tag}")) <= set(ids_of(f"div ~ {tag}"))
        # X:not(.a) and X.a partition X
        not_a = set(ids_of(f"{tag}:not(.a)"))
        with_a = set(ids_of(f"{tag}.a"))
        assert not_a.isdisjoint(with_a)
        assert not_a | with_a == set(ids_of(tag))
    # child results are a subset of descendant results
    assert set(ids_of("body > p")) <= set(ids_of("body p"))


@pytest.mark.parametrize("selector,expected", [
    # counting from the END: article elements = p(a) p(b) div(c) p(d)
    # span(s1) span(s2); nth-last-child(1) is the last child
    ("article :nth-last-child(1)", ["s2"]),
    ("p:nth-last-child(3)", ["d"]),
    ("p:nth-last-of-type(1)", ["d"]),
    ("p:nth-last-of-type(2)", ["b"]),
    ("span:nth-last-of-type(odd)", ["s2"]),
    ("p:nth-last-child(odd)", ["b", "d"]),  # a,b,d = 6,5,3 from the end
])
def test_nth_last_selectors(selector, expected):
    assert _tids(selector) == expected


def test_nth_last_equals_reversed_nth():
    # :last-child == :nth-last-child(1) on every tag
    for tag in ("p", "div", "span", "*"):
        last = [id(n) for n in css.select(TYPE_DOC, f"{tag}:last-child")]
        nth = [id(n) for n in
               css.select(TYPE_DOC, f"{tag}:nth-last-child(1)")]
        assert last == nth


# ---- review-fix regressions ---------------------------------------------------------


def test_rawtext_close_search_survives_length_changing_lowercase():
    """str.lower() can CHANGE length ('İ' -> 2 chars); close-tag search
    must use a length-preserving ASCII fold or indices misalign."""
    root = parse("<title>İSTANBUL</title><p>body text</p>")
    assert root.find_all({"title"})[0].inner_text() == "İSTANBUL"
    assert root.find_all({"p"})[0].inner_text() == "body text"
    # and case-insensitive close tags still work
    root2 = parse("<SCRIPT>var x=1;</SCRIPT><p>after</p>")
    assert root2.find_all({"p"})[0].inner_text() == "after"


def test_trailing_slash_in_unquoted_attr_is_part_of_value():
    """HTML5: '/' in an unquoted attribute value belongs to the value --
    <a href=http://x.com/> is NOT self-closing."""
    root = parse("<p><a href=http://x.com/>text</a> more</p>")
    a = root.find_all({"a"})[0]
    assert a.attrs["href"] == "http://x.com/"
    assert a.inner_text() == "text"
    root2 = parse("<p><a href=/about/>go</a></p>")
    assert root2.find_all({"a"})[0].attrs["href"] == "/about/"
    # genuine self-closing forms still close
    root3 = parse('<p>a<br/>b<img src="x"/><input disabled/></p>')
    assert root3.find_all({"p"})[0].inner_text() == "ab"
    assert root3.find_all({"img"})[0].attrs["src"] == "x"


def test_numeric_c1_charrefs_remap_to_windows1252_glyphs():
    """WHATWG numeric-reference table: &#147;/&#148;/&#151; are legacy
    windows-1252 typographic marks, not invisible C1 controls."""
    assert unescape("&#147;quoted&#148;") == "“quoted”"
    assert unescape("&#151;") == "—"
    assert unescape("&#x93;x&#x94;") == "“x”"
    assert unescape("&#128;") == "€"
    assert unescape("&#65;") == "A"  # ordinary refs unchanged


# ---- selectors 4 long tail: :has(), :root, [attr=v i] -----------------------------

HAS_DOC = parse(
    '<html><body>'
    '<div id="a"><p class="x">one</p></div>'
    '<div id="b"><span>two</span></div>'
    '<div id="c"><section><p class="x">deep</p></section></div>'
    '<ul id="lst"><li id="l1"></li><li id="l2"><a href="#">go</a></li></ul>'
    '<h2 id="h">t</h2><p id="after">tail</p>'
    '</body></html>'
)


def _has_ids(selector):
    return [n.attrs.get("id") for n in css.select(HAS_DOC, selector)]


def test_has_descendant():
    assert _has_ids("div:has(p.x)") == ["a", "c"]  # deep descendant counts


def test_has_child_combinator():
    assert _has_ids("div:has(> p.x)") == ["a"]  # c's p is nested deeper


def test_has_sibling_combinators():
    assert _has_ids("h2:has(+ p)") == ["h"]
    assert _has_ids("li:has(a)") == ["l2"]
    assert _has_ids("li:has(~ li)") == ["l1"]  # has a later sibling


def test_has_selector_list_and_not_interaction():
    assert _has_ids("div:has(span, p.x)") == ["a", "b", "c"]
    assert _has_ids("div:not(.z):has(> span)") == ["b"]


def test_has_requires_argument():
    with pytest.raises(css.SelectorError):
        css.compile_selector("div:has()")
    with pytest.raises(css.SelectorError):
        css.compile_selector("div:has(>)")


def test_root_matches_document_element():
    got = css.select(HAS_DOC, ":root")
    assert [n.tag for n in got] == ["html"]
    assert css.select(HAS_DOC, ":root body")[0].tag == "body"
    # fragments without <html>: the top-level element(s) are the roots
    frag = parse("<div><p>x</p></div>")
    assert [n.tag for n in css.select(frag, ":root")] == ["div"]


NS_DOC = parse(
    "<div><p>html para</p>"
    "<svg><title>chart</title><circle r='1'></circle>"
    "<foreignObject><p>embedded html</p></foreignObject></svg>"
    "<math><mi>x</mi><annotation-xml><p>annot html</p></annotation-xml>"
    "</math></div>"
)


def test_parser_tracks_foreign_namespaces():
    """svg/math subtrees carry their namespace; HTML integration points
    (foreignObject, svg title, annotation-xml) re-enter the HTML (empty)
    namespace for their children."""
    ns = {}
    for node in NS_DOC.iter_elements():
        ns.setdefault((node.tag, node.inner_text()), node.namespace)
    assert ns[("p", "html para")] == ""
    assert ns[("circle", "")] == "svg"
    assert ns[("title", "chart")] == "svg"
    assert ns[("p", "embedded html")] == ""
    assert ns[("mi", "x")] == "math"
    assert ns[("p", "annot html")] == ""
    # clone preserves the namespace
    assert NS_DOC.clone().children[0].children[1].namespace == "svg"


def test_namespace_selectors():
    """Selectors 3 namespace qualifiers: bare tag = any namespace (no
    default @namespace declared), *|tag = any, |tag = no-namespace
    only, ns|tag = exactly that namespace; ns|* and *|* work too."""

    def texts(sel):
        return [n.inner_text() for n in css.select(NS_DOC, sel)]

    assert texts("p") == ["html para", "embedded html", "annot html"]
    assert texts("*|p") == texts("p")
    assert texts("|p") == texts("p")  # all three <p> are HTML
    assert texts("svg|circle") == [""]
    assert texts("svg|title") == ["chart"]
    assert texts("|circle") == []
    assert texts("math|mi") == ["x"]
    assert texts("svg|p") == []
    assert [n.tag for n in css.select(NS_DOC, "svg|*")] == [
        "svg", "title", "circle", "foreignobject"
    ]
    # qualifiers compose with classes/attrs/combinators
    assert texts("svg|circle[r='1']") == [""]
    assert texts("div > svg|circle") == []  # circle is a grandchild
    assert texts("svg > svg|circle") == [""]


def test_is_where_matches_any():
    """:is()/:where() compound-list support: matches-any semantics,
    composable with combinators and other pseudos; combinators inside
    the list stay out of grammar (same restriction as :not)."""
    doc = parse(
        "<div><p class='a'>one</p><span>two</span><em>three</em></div>"
        "<section><p>four</p></section>"
    )
    texts = lambda sel: [n.inner_text() for n in css.select(doc, sel)]
    assert texts(":is(p, em)") == ["one", "three", "four"]
    assert texts(":where(p, em)") == texts(":is(p, em)")
    assert texts("div :is(p.a, em)") == ["one", "three"]
    assert texts(":is(p):first-child") == ["one", "four"]
    for bad in (":is()", ":is(a b)", ":where(p > i)"):
        with pytest.raises(css.SelectorError):
            css.compile_selector(bad)


def test_has_and_not_nested_pseudo_args():
    """One level of paren nesting inside pseudo-class arguments:
    :has(:nth-child(2)), :has(:not(.x)), :not(:nth-child(2n+1)) --
    previously a documented tokenizer non-goal; deeper nesting still
    raises."""
    doc = parse(
        "<ul><li>one</li><li class='ad'>two</li><li>three</li></ul>"
        "<ol><li>only</li></ol>"
    )
    # ul has a 2nd element child; ol does not
    assert [n.tag for n in css.select(doc, ":has(:nth-child(2))")] == ["ul"]
    # :has(:not(...)): ol's only li has no class -> matches :not(.ad)
    assert [n.tag for n in css.select(doc, "ol:has(:not(.ad))")] == ["ol"]
    # :not with a parenthesized nth argument, odd positions excluded
    got = [n.inner_text()
           for n in css.select(doc, "ul li:not(:nth-child(2n+1))")]
    assert got == ["two"]
    # depth-2 nesting stays out of grammar
    with pytest.raises(css.SelectorError):
        css.compile_selector(":has(:not(:nth-child(2)))")


def test_namespace_selector_errors():
    for bad in ("svg|", "|", "a||b", "svg|.cls"):
        with pytest.raises(css.SelectorError):
            css.compile_selector(bad)


def test_literal_root_element_is_ordinary():
    """ADVICE r4: the synthetic parse root is identified by identity
    (the parentless node), not by its 'root' tag name -- so a literal
    <root> element in page HTML is an ordinary element: its children do
    NOT match :root, it can be selected, and it participates in child /
    descendant combinators."""
    doc = parse("<root><p>inside literal root</p></root><div>x</div>")
    # children of the literal <root> must not spoof :root; the literal
    # <root> and <div> ARE the document's top elements
    assert [n.tag for n in css.select(doc, ":root")] == ["root", "div"]
    assert css.select(doc, "p:root") == []
    # the literal element is selectable by tag and as a combinator parent
    assert [n.tag for n in css.select(doc, "root")] == ["root"]
    assert [n.inner_text() for n in css.select(doc, "root > p")] == [
        "inside literal root"
    ]
    assert len(css.select(doc, "root p")) == 1
    # and matches universal selection like any element
    assert "root" in [n.tag for n in css.select(doc, "*")]


def test_attr_case_insensitive_flag():
    doc = parse('<a href="HTTPS://Example.COM/Path">x</a>'
                '<a href="https://example.com/path">y</a>'
                '<div data-kind="Video Large"></div>')
    assert len(css.select(doc, '[href="https://example.com/path" i]')) == 2
    assert len(css.select(doc, '[href="https://example.com/path"]')) == 1
    assert len(css.select(doc, '[href="https://example.com/path" s]')) == 1
    assert len(css.select(doc, '[href^="HTTPS" i]')) == 2
    assert len(css.select(doc, '[data-kind~="video" i]')) == 1
    assert len(css.select(doc, '[data-kind~="video"]')) == 0


def test_selector_list_quotes_and_has_commas():
    """Review regressions: quoted parens/commas must not confuse the
    top-level comma split or the :has() argument split."""
    doc = parse('<div><p data-x="a,b">in</p></div><p id="q">out</p>'
                '<span data-x="(a"></span><em data-x="a)b"></em>')
    assert [n.tag for n in css.select(doc, 'div:has([data-x="a,b"])')] == \
        ["div"]
    assert [n.tag for n in css.select(doc, '[data-x="(a"], p#q')] == \
        ["p", "span"]
    assert [n.tag for n in css.select(doc, '[data-x="a)b"], p#q')] == \
        ["p", "em"]
