"""DOM -> Markdown serializer (CommonMark-flavored).

From-scratch equivalent of the reference's html-to-markdown v1.6.0 usage
(/root/reference/internal/extract/extract.go:107-146; behavior contract in
SURVEY.md Appendix A.2): `#`-style headers, `-` bullets, `1.` ordered lists,
`**bold**` / `*italic*`, `> ` blockquotes, fenced code, `[text](href)`
links, plus sift's custom `<br>` -> "\n" rule (extract.go:112-119) and its
exact whitespace cleanup (extract.go:127-170): collapse 3+ newlines to 2,
then trim trailing spaces/tabs before a final newline, else trim
leading/trailing spaces/tabs only (never newlines).

The reference's tests accept either ATX or setext headers and either
asterisk or underscore emphasis (extract_test.go:262-297); this serializer
fixes the `#` / `**` / `*` / `-` forms and the golden files freeze that
choice (FIXTURES.md §4).
"""

from __future__ import annotations

import re

_BLOCK_TAGS = frozenset(
    """address article aside blockquote body center dd details dialog div dl
    dt fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header hr
    html li main menu nav ol p pre section summary table tbody td tfoot th
    thead tr ul root""".split()
)
_SKIP_TAGS = frozenset(("script", "style", "noscript", "head", "title", "meta", "link"))
_WS_RE = re.compile(r"[ \t\r\n\f]+")
_NL_SPACE_RE = re.compile(r"[ \t]*\n[ \t]*")


def to_markdown(node):
    """Serialize a Node subtree to markdown with sift's cleanup applied."""
    blocks = _render_blocks(node, list_depth=0)
    markdown = "\n\n".join(block for block in blocks if block != "")
    return cleanup(markdown)


def cleanup(markdown):
    """sift's post-conversion whitespace normalization (extract.go:127-146)."""
    cleaned = markdown
    while "\n\n\n" in cleaned:
        cleaned = cleaned.replace("\n\n\n", "\n\n")
    if cleaned.endswith("\n"):
        cleaned = cleaned.rstrip(" \t")
    else:
        cleaned = trim_spaces_only(cleaned)
    return cleaned


def trim_spaces_only(text):
    """Strip leading/trailing spaces and tabs, preserving newlines
    (extract.go:151-170 / chunk.go:346-365)."""
    return text.strip(" \t")


# ---- block rendering -------------------------------------------------------------


def _render_blocks(node, list_depth):
    """Render the children of `node` as a list of markdown block strings."""
    blocks = []
    inline_run = []

    def flush():
        if inline_run:
            text = _finish_inline("".join(inline_run))
            if text:
                blocks.append(text)
            inline_run.clear()

    for child in node.children:
        if child.tag is None:
            inline_run.append(_collapse(child.text))
            continue
        if child.tag in _SKIP_TAGS:
            continue
        if child.tag in _BLOCK_TAGS:
            flush()
            blocks.extend(_render_block_element(child, list_depth))
        else:
            inline_run.append(_render_inline(child))
    flush()
    return blocks


def _render_block_element(node, list_depth):
    tag = node.tag
    if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
        text = _finish_inline(_inline_children(node)).replace("\n", " ")
        text = re.sub(r" {2,}", " ", text).strip()
        return [f"{'#' * int(tag[1])} {text}"] if text else []
    if tag == "p":
        text = _finish_inline(_inline_children(node))
        return [text] if text else []
    if tag == "br":  # stray block-context <br>
        return []
    if tag == "hr":
        return ["---"]
    if tag == "ul":
        return _render_list(node, ordered=False, list_depth=list_depth)
    if tag == "ol":
        return _render_list(node, ordered=True, list_depth=list_depth)
    if tag == "blockquote":
        inner_blocks = _render_blocks(node, list_depth)
        inner = "\n\n".join(b for b in inner_blocks if b)
        if not inner:
            return []
        quoted = "\n".join(
            ("> " + line if line else ">") for line in inner.split("\n")
        )
        return [quoted]
    if tag == "pre":
        raw = _raw_text(node).strip("\n")
        return [f"```\n{raw}\n```"] if raw.strip() else []
    if tag in ("table", "tbody", "thead", "tfoot"):
        rows = []
        for section in (node,):
            for row in section.find_all({"tr"}):
                cells = [
                    _finish_inline(_inline_children(cell)).replace("\n", " ")
                    for cell in row.children
                    if cell.tag in ("td", "th")
                ]
                cells = [c for c in cells if c]
                if cells:
                    rows.append("| " + " | ".join(cells) + " |")
        return ["\n".join(rows)] if rows else []
    if tag == "tr":
        return []
    if tag == "li":  # li outside a list container
        text = _finish_inline(_inline_children(node))
        return [f"- {text}"] if text else []
    # generic container (div, article, section, body, ...)
    return _render_blocks(node, list_depth)


def _render_list(node, ordered, list_depth):
    lines = []
    index = 0
    for child in node.children:
        if child.tag != "li":
            continue
        index += 1
        marker = f"{index}. " if ordered else "- "
        item_blocks = _render_li_blocks(child, list_depth + 1)
        if not item_blocks:
            lines.append(marker.rstrip())
            continue
        first, *rest = item_blocks
        indent = " " * len(marker)
        first_lines = first.split("\n")
        lines.append(marker + first_lines[0])
        lines.extend(indent + line for line in first_lines[1:])
        for block in rest:
            for line in block.split("\n"):
                lines.append(indent + line)
    return ["\n".join(lines)] if lines else []


def _render_li_blocks(li, list_depth):
    """An <li> may hold inline content and/or nested blocks."""
    return _render_blocks(li, list_depth)


# ---- inline rendering ------------------------------------------------------------


def _inline_children(node):
    parts = []
    for child in node.children:
        if child.tag is None:
            parts.append(_collapse(child.text))
        elif child.tag in _SKIP_TAGS:
            continue
        elif child.tag in _BLOCK_TAGS:
            # block element in inline position: render and embed with newlines
            inner = "\n\n".join(_render_block_element(child, 0))
            if inner:
                parts.append("\n" + inner + "\n")
        else:
            parts.append(_render_inline(child))
    return "".join(parts)


def _render_inline(node):
    tag = node.tag
    if tag == "br":
        return "\n"  # sift's custom rule (extract.go:112-119)
    if tag in ("strong", "b"):
        return _wrap_emphasis(node, "**")
    if tag in ("em", "i"):
        return _wrap_emphasis(node, "*")
    if tag in ("del", "s", "strike"):
        return _wrap_emphasis(node, "~~")
    if tag == "code":
        raw = _raw_text(node)
        return f"`{raw.strip()}`" if raw.strip() else ""
    if tag == "a":
        text = _inline_children(node)
        href = node.attrs.get("href", "")
        label = text.strip()
        if not label:
            return ""
        if not href:
            return label
        return f"[{label}]({href})"
    if tag == "img":
        alt = node.attrs.get("alt", "")
        src = node.attrs.get("src", "")
        return f"![{alt}]({src})" if src else ""
    if tag in ("span", "u", "small", "sub", "sup", "abbr", "time", "mark", "label"):
        return _inline_children(node)
    # unknown inline element: render its content
    return _inline_children(node)


def _wrap_emphasis(node, marker):
    inner = _inline_children(node)
    stripped = inner.strip()
    if not stripped:
        return inner  # whitespace-only: keep spacing, drop markers
    # move boundary whitespace outside the markers (html-to-markdown behavior)
    lead = inner[: len(inner) - len(inner.lstrip())]
    trail = inner[len(inner.rstrip()):]
    return f"{lead}{marker}{stripped}{marker}{trail}"


def _raw_text(node):
    parts = []
    node._collect_text(parts, in_pre=True)
    return "".join(parts)


def _collapse(text):
    # fast path: most text nodes need no collapsing work at all
    if "\n" in text or "\t" in text or "  " in text or "\r" in text or "\f" in text:
        return _WS_RE.sub(" ", text)
    return text


def _finish_inline(text):
    """Final inline cleanup: collapse spaces, tidy around hard newlines."""
    text = re.sub(r" {2,}", " ", text)
    text = _NL_SPACE_RE.sub("\n", text)
    return text.strip(" \t").strip("\n") if text.strip() else ""
