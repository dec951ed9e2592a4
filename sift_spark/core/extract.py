"""Single-document extraction dispatcher: HTML -> markdown.

Mirrors the reference's `extract.ToMarkdown` decision tree
(/root/reference/internal/extract/extract.go:26-39):

  selector set   -> CSS-selected subtrees (overrides include_all)
  include_all    -> convert the entire document
  default        -> readability main-content extraction

Returns (markdown, error): exactly one is meaningful, matching the Go
(string, error) contract. Errors are strings so the Spark layer can route
them to an `error` column instead of failing the task
(SURVEY.md §2.1 "failure tolerance").
"""

from __future__ import annotations

from . import css, htmlparser, markdown, readability


def to_markdown(html, selector="", include_all=False):
    """Extract and convert one HTML document. Returns (text, error)."""
    if selector:
        return _extract_with_selector(html, selector)
    if include_all:
        return _convert_all(html)
    return _extract_main_content(html)


def _extract_main_content(html):
    root = htmlparser.parse(html)
    article = readability.extract_article(root)
    if article is None:
        return "", None  # empty document -> empty result (extract_test.go:183-196)
    return markdown.to_markdown(article), None


def _extract_with_selector(html, selector):
    try:
        compiled = css.compile_selector(selector)
    except css.SelectorError as exc:
        return "", f"failed to parse selector: {exc}"
    root = htmlparser.parse(html)
    matches = compiled.select(root)
    if not matches:
        return "", f"no elements found matching selector: {selector}"
    # the reference re-wraps each match's inner HTML in its own tag (attrs
    # dropped) and joins with \n before a single conversion
    # (extract.go:72-90); we rebuild the same synthetic document
    synthetic = htmlparser.Node("root")
    for idx, match in enumerate(matches):
        if idx:
            # the reference joins the rewrapped match HTML with "\n"
            # before converting; without it, adjacent INLINE matches
            # (e.g. selector "a") fuse into one run ("onetwo")
            synthetic.append(htmlparser.Node(None, text="\n"))
        wrapper = htmlparser.Node(match.tag)
        for child in match.children:
            wrapper.append(child.clone())
        synthetic.append(wrapper)
    return markdown.to_markdown(synthetic), None


def _convert_all(html):
    root = htmlparser.parse(html)
    return markdown.to_markdown(root), None
