"""Extraction parity: ports of extract_test.go assertion tables."""

import pytest

from sift_spark.core.extract import to_markdown
from tests.fixtures import BLOG_POST_HTML, MALFORMED_HTML, SIMPLE_HTML

CASES = [
    # (name, html, selector, expect_error, expect_empty, contains, not_contains)
    ("simple readability", SIMPLE_HTML, "", False, False,
     ["Main Article Title", "main content", "bold text", "italic text",
      "First list item"],
     ["Site Header", "Navigation", "sidebar content", "Footer content"]),
    ("blog readability", BLOG_POST_HTML, "", False, False,
     ["How to Bake", "carrot cake", "sifting flour", "Ingredients",
      "Instructions"],
     ["My Blog", "Related Posts"]),
    ("article selector", SIMPLE_HTML, "article", False, False,
     ["Main Article Title", "main content", "bold text", "First list item"],
     ["Site Header", "Navigation", "sidebar content", "Footer"]),
    ("class selector", BLOG_POST_HTML, ".post-content", False, False,
     ["sifting flour", "Ingredients", "Instructions", "2 cups flour",
      "The secret is in the sifting"],
     ["How to Bake", "Published on", "My Blog", "Related Posts"]),
    ("h3 multi-match", BLOG_POST_HTML, "h3", False, False,
     ["Ingredients", "Instructions"],
     ["How to Bake", "carrot cake", "sifting flour"]),
    ("ol selector", BLOG_POST_HTML, "ol", False, False,
     ["Sift the flour", "Mix wet ingredients", "Combine and bake"],
     ["Ingredients", "2 cups flour"]),
    ("blockquote selector", BLOG_POST_HTML, "blockquote", False, False,
     ["The secret is in the sifting"], ["Ingredients", "Instructions"]),
    ("non-existent selector", SIMPLE_HTML, ".non-existent", True, False, [], []),
    ("invalid selector", SIMPLE_HTML, ">>invalid<<", True, False, [], []),
    ("malformed with selector", MALFORMED_HTML, ".content", False, False,
     ["Unclosed Header", "Paragraph without closing", "Some text"], []),
    ("empty html", "", "", False, True, [], []),
    ("whitespace only", "   \n\t   ", "", False, True, [], []),
]


@pytest.mark.parametrize("name,html,selector,expect_error,expect_empty,contains,not_contains",
                         CASES, ids=[c[0] for c in CASES])
def test_to_markdown(name, html, selector, expect_error, expect_empty,
                     contains, not_contains):
    result, error = to_markdown(html, selector=selector)
    if expect_error:
        assert error is not None
        return
    assert error is None, error
    if expect_empty:
        assert result.strip() == ""
        return
    for expected in contains:
        assert expected in result, f"missing {expected!r} in {result!r}"
    for unexpected in not_contains:
        assert unexpected not in result, f"unexpected {unexpected!r} in {result!r}"
    # no raw HTML tags in output (extract_test.go:236-246)
    for tag in ("<div>", "<span>", "<article>", "</div>", "</span>", "</article>"):
        assert tag not in result


def test_headers_markdown():
    result, _ = to_markdown(
        "<html><body><h1>Header 1</h1><h2>Header 2</h2><h3>Header 3</h3></body></html>",
        selector="body")
    assert "# Header 1" in result
    assert "## Header 2" in result


def test_lists_markdown():
    result, _ = to_markdown(
        "<html><body><ul><li>Item 1</li><li>Item 2</li></ul>"
        "<ol><li>First</li><li>Second</li></ol></body></html>", selector="body")
    assert "- Item 1" in result
    assert "1. First" in result


def test_emphasis_markdown():
    result, _ = to_markdown(
        "<html><body><p>This is <strong>bold</strong> and <em>italic</em> text.</p></body></html>",
        selector="body")
    assert "**bold**" in result
    assert "*italic*" in result


def test_blockquote_markdown():
    result, _ = to_markdown(
        "<html><body><blockquote><p>This is a quote about sifting confectioner "
        "sugar for icing.</p></blockquote></body></html>", selector="body")
    assert "> This is a quote" in result


@pytest.mark.parametrize("html", [
    "<html><body><p>Line one<br>Line two<br>Line three</p></body></html>",
    "<html><body><p>First line<br/>Second line</p></body></html>",
    "<html><body><p>Line one<br><br>Line two</p></body></html>",
])
def test_br_line_breaks(html):
    result, error = to_markdown(html, selector="p")
    assert error is None
    assert "oneLine two" not in result and "lineSecond" not in result
    assert "\n" in result


def test_nested_selector():
    result, error = to_markdown(
        '<html><body><div class="outer"><div class="inner">Content</div></div></body></html>',
        selector=".outer .inner")
    assert error is None and "Content" in result


def test_multi_match_join():
    result, error = to_markdown(
        "<html><body><p>Para 1</p><p>Para 2</p><p>Para 3</p></body></html>",
        selector="p")
    assert error is None
    assert result == "Para 1\n\nPara 2\n\nPara 3"


def test_complex_nested():
    result, error = to_markdown(
        "<html><body><div><article><header><h1>Title</h1></header>"
        "<section><p>Content</p></section></article></div></body></html>",
        selector="article")
    assert error is None and "Title" in result and "Content" in result


def test_selector_inline_matches_keep_separation():
    """Adjacent INLINE selector matches must not fuse: the reference
    joins rewrapped matches with a newline before converting."""
    from sift_spark.core.extract import to_markdown

    html = '<p><a href="/1">one</a> <a href="/2">two</a></p>'
    text, error = to_markdown(html, selector="a")
    assert error is None
    assert "onetwo" not in text
    assert "one" in text and "two" in text
