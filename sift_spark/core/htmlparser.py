"""Tolerant HTML parser producing a DOM node tree.

From-scratch HTML5-ish tree builder (subset): handles doctype, comments,
void elements, raw-text elements (script/style), attribute syntax
(double/single/unquoted/bare), case-insensitive tag names, implicit
closing of <p>/<li> and unclosed tags at EOF. Error recovery follows the
"pop until match, else ignore stray end tag" strategy, which reproduces
what matters for the reference's `malformedHTML` fixture
(/root/reference/internal/extract/extract_test.go:86-96): text from
unclosed elements stays inside the enclosing container.

This is parse-only; readability scoring and markdown serialization operate
on the resulting Node tree (see readability.py / markdown.py).
"""

from __future__ import annotations

import re

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
RAW_TEXT_ELEMENTS = frozenset(("script", "style", "textarea", "title"))

# Start tags that implicitly close an open <p> (HTML5 "button scope" cases,
# reduced to the block-level set that occurs in web text).
P_CLOSERS = frozenset(
    """address article aside blockquote details div dl fieldset figcaption
    figure footer form h1 h2 h3 h4 h5 h6 header hr main menu nav ol p pre
    section table ul""".split()
)

_TAG_RE = re.compile(r"([a-zA-Z][a-zA-Z0-9:-]*)")
_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*("[^"]*"|'[^']*'|[^\s>]*))?"""
)
_WS_RE = re.compile(r"[ \t\r\n\f]+")


class Node:
    """A DOM node. tag is None for text nodes."""

    __slots__ = ("tag", "attrs", "children", "parent", "text",
                 "namespace", "_text_cache")

    def __init__(self, tag, attrs=None, text="", namespace=""):
        self.tag = tag  # lowercase tag name, or None for text
        self.attrs = attrs or {}
        self.children = []
        self.parent = None
        self.text = text  # raw text for text nodes
        # net/html's model: HTML elements carry the EMPTY namespace;
        # foreign content inside <svg>/<math> carries "svg"/"math"
        # (set by parse); CSS namespace selectors (ns|tag) match on it
        self.namespace = namespace
        self._text_cache = None

    def append(self, child):
        child.parent = self
        self.children.append(child)
        self._text_cache = None

    # ---- convenience accessors -------------------------------------------------
    @property
    def is_text(self):
        return self.tag is None

    def attr(self, name, default=""):
        return self.attrs.get(name, default)

    def iter(self):
        """Depth-first pre-order iteration including self."""
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(reversed(node.children))

    def iter_elements(self):
        for node in self.iter():
            if node.tag is not None:
                yield node

    def inner_text(self):
        """Concatenated text with HTML whitespace collapsed (outside
        <pre>). Cached: readability scoring queries overlapping ancestor
        subtrees repeatedly; the cache is invalidated on append/detach
        (the only mutations)."""
        if self._text_cache is None:
            parts = []
            self._collect_text(parts, in_pre=False)
            self._text_cache = (
                _WS_RE.sub(" ", "".join(parts)).strip() if parts else ""
            )
        return self._text_cache

    def _collect_text(self, parts, in_pre):
        if self.is_text:
            parts.append(self.text)
            return
        if self.tag in ("script", "style"):
            return
        pre = in_pre or self.tag == "pre"
        for child in self.children:
            child._collect_text(parts, pre)

    def text_len(self):
        """Raw (uncollapsed) text length, excluding script/style. Cheap
        length-only companion to inner_text for density ratios."""
        total = 0
        stack = [self]
        while stack:
            node = stack.pop()
            if node.tag is None:
                total += len(node.text)
            elif node.tag not in ("script", "style"):
                stack.extend(node.children)
        return total

    def find_all(self, tag_names):
        """All descendant elements whose tag is in tag_names (set)."""
        out = []
        for node in self.iter_elements():
            if node.tag in tag_names and node is not self:
                out.append(node)
        return out

    def clone(self):
        """Deep copy of the subtree."""
        copy = Node(self.tag, dict(self.attrs), self.text, self.namespace)
        for child in self.children:
            copy.append(child.clone())
        return copy

    def detach(self):
        if self.parent is not None:
            ancestor = self.parent
            while ancestor is not None:  # invalidate ancestor text caches
                ancestor._text_cache = None
                ancestor = ancestor.parent
            self.parent.children.remove(self)
            self.parent = None

    def __repr__(self):  # pragma: no cover - debugging aid
        if self.is_text:
            return f"Text({self.text[:30]!r})"
        return f"<{self.tag} {self.attrs}>({len(self.children)} children)"


# ---- character reference decoding ----------------------------------------------

_NAMED_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ", "copy": "©", "reg": "®", "trade": "™",
    "hellip": "…", "mdash": "—", "ndash": "–",
    "lsquo": "‘", "rsquo": "’", "ldquo": "“", "rdquo": "”",
    "deg": "°", "middot": "·", "bull": "•", "sect": "§",
    "para": "¶", "laquo": "«", "raquo": "»", "times": "×",
    "divide": "÷", "plusmn": "±", "frac12": "½",
    "frac14": "¼", "sup2": "²", "sup3": "³", "micro": "µ",
    "euro": "€", "pound": "£", "cent": "¢", "yen": "¥",
    "agrave": "à", "aacute": "á", "acirc": "â",
    "eacute": "é", "egrave": "è", "ecirc": "ê",
    "iacute": "í", "oacute": "ó", "uacute": "ú",
    "ntilde": "ñ", "uuml": "ü", "ouml": "ö", "auml": "ä",
    "szlig": "ß", "ccedil": "ç",
}

_ENTITY_RE = re.compile(r"&(#[0-9]+|#[xX][0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*);")

# WHATWG numeric-character-reference replacement table: codes 0x80-0x9F
# (C1 controls) remap to the windows-1252 glyphs -- legacy pages write
# &#147;...&#148; for typographic quotes and x/net/html (the reference's
# parser) applies this table
_C1_REMAP = {
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E, 0x85: 0x2026,
    0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6, 0x89: 0x2030, 0x8A: 0x0160,
    0x8B: 0x2039, 0x8C: 0x0152, 0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019,
    0x93: 0x201C, 0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A, 0x9C: 0x0153,
    0x9E: 0x017E, 0x9F: 0x0178,
}


def _decode_entity(match):
    body = match.group(1)
    if body.startswith("#"):
        try:
            code = int(body[2:], 16) if body[1] in "xX" else int(body[1:])
            code = _C1_REMAP.get(code, code)
            if 0 < code <= 0x10FFFF and not (0xD800 <= code <= 0xDFFF):
                return chr(code)
        except ValueError:
            pass
        return match.group(0)
    return _NAMED_ENTITIES.get(body.lower(), match.group(0))


def unescape(text):
    if "&" not in text:
        return text
    return _ENTITY_RE.sub(_decode_entity, text)


# ---- tokenizer + tree builder ---------------------------------------------------


# HTML integration points (HTML5 tree construction): children of these
# foreign elements re-enter the HTML (empty) namespace
_SVG_INTEGRATION = frozenset(("foreignobject", "desc", "title"))


def _child_namespace(parent, tag):
    """Namespace for a new element under `parent` (net/html semantics):
    <svg>/<math> open foreign content, descendants inherit it, and the
    SVG HTML-integration points (foreignObject/desc/title) plus MathML's
    annotation-xml drop back to the HTML (empty) namespace."""
    if tag == "svg":
        return "svg"
    if tag == "math":
        return "math"
    pns = parent.namespace if parent.tag is not None else ""
    if pns == "svg" and parent.tag in _SVG_INTEGRATION:
        return ""
    if pns == "math" and parent.tag == "annotation-xml":
        return ""
    return pns


def parse(html):
    """Parse an HTML string into a Node tree rooted at a synthetic 'root'.

    The returned root always exists; <html>/<head>/<body> appear in the tree
    only if present in the input (tolerant fragment parsing).
    """
    root = Node("root")
    stack = [root]
    i = 0
    n = len(html)

    while i < n:
        lt = html.find("<", i)
        if lt < 0:
            _append_text(stack[-1], html[i:])
            break
        if lt > i:
            _append_text(stack[-1], html[i:lt])

        next_char = html[lt + 1] if lt + 1 < n else ""
        # comment / doctype / CDATA / declarations
        if next_char == "!":
            if html.startswith("<!--", lt):
                end = html.find("-->", lt + 4)
                i = n if end < 0 else end + 3
            else:
                end = html.find(">", lt)
                i = n if end < 0 else end + 1
            continue
        if next_char == "?":
            end = html.find(">", lt)
            i = n if end < 0 else end + 1
            continue
        # end tag
        if next_char == "/":
            m = _TAG_RE.match(html, lt + 2)
            end = html.find(">", lt)
            if m is None:
                # stray "</" with no tag: treat as text
                _append_text(stack[-1], "<")
                i = lt + 1
                continue
            tag = m.group(1).lower()
            _close_tag(stack, tag)
            i = n if end < 0 else end + 1
            continue
        # start tag
        m = _TAG_RE.match(html, lt + 1)
        if m is None:
            # bare '<' that doesn't open a tag -> literal text
            _append_text(stack[-1], "<")
            i = lt + 1
            continue
        tag = m.group(1).lower()
        gt = _find_tag_end(html, m.end())
        if gt < 0:
            break  # truncated tag at EOF
        attr_src = html[m.end():gt]
        attr_src, self_closing = _split_self_closing(attr_src)
        attrs = _parse_attrs(attr_src)
        i = gt + 1

        # implicit closes
        if tag in P_CLOSERS:
            _close_if_open(stack, "p")
        if tag == "li":
            _close_if_open(stack, "li", stop_at=("ul", "ol"))
        if tag in ("td", "th"):
            _close_if_open(stack, "td", stop_at=("tr", "table"))
            _close_if_open(stack, "th", stop_at=("tr", "table"))
        if tag == "tr":
            _close_if_open(stack, "tr", stop_at=("table",))
        if tag in ("dt", "dd"):
            _close_if_open(stack, "dt", stop_at=("dl",))
            _close_if_open(stack, "dd", stop_at=("dl",))

        node = Node(tag, attrs, namespace=_child_namespace(stack[-1], tag))
        stack[-1].append(node)

        if tag in RAW_TEXT_ELEMENTS and not self_closing:
            # consume raw text until the matching close tag. The
            # ASCII-case-insensitive compiled search (re.A pins
            # case-folding to A-Z, exactly the old translate table's
            # semantics) replaces a full lowercased COPY of every
            # document that was built up front even when no raw-text
            # element appeared -- one O(n) allocation per page in the
            # extraction kernel's hottest stage
            close_m = _RAW_CLOSE_RES[tag].search(html, i)
            close = close_m.start() if close_m else -1
            raw_end = n if close < 0 else close
            if raw_end > i:
                node.append(Node(None, text=html[i:raw_end]))
            if close < 0:
                i = n
            else:
                gt2 = html.find(">", close)
                i = n if gt2 < 0 else gt2 + 1
            continue

        if tag not in VOID_ELEMENTS and not self_closing:
            stack.append(node)

    return root


def _find_tag_end(html, start):
    """Find '>' terminating a start tag, skipping quoted attribute values."""
    i = start
    n = len(html)
    while i < n:
        c = html[i]
        if c == ">":
            return i
        if c in "\"'":
            j = html.find(c, i + 1)
            if j < 0:
                return -1
            i = j + 1
        else:
            i += 1
    return -1


def _append_text(parent, raw):
    if raw:
        parent.append(Node(None, text=unescape(raw)))


# per-raw-text-tag close-tag scanners; re.A restricts IGNORECASE to
# ASCII so '</TITLE' matches but Unicode case-folded lookalikes do not
# (the exact semantics of the former ASCII-only translate table)
_RAW_CLOSE_RES = {
    tag: re.compile(f"</{tag}", re.IGNORECASE | re.ASCII)
    for tag in RAW_TEXT_ELEMENTS
}


def _split_self_closing(attr_src):
    """(attr_src, self_closing) per HTML5: a trailing '/' marks
    self-closing UNLESS it terminates an unquoted attribute value
    (<a href=http://x.com/> keeps the slash in the value -- same as
    x/net/html, the reference's parser)."""
    stripped = attr_src.rstrip()
    if not stripped.endswith("/"):
        return attr_src, False
    body = stripped[:-1]
    tokens = body.split()
    last = tokens[-1] if tokens else ""
    if "=" in last and not body.endswith(("=", " ")):
        value = last.split("=", 1)[1]
        quote = value[:1]
        if quote not in "\"'":
            # unquoted value: the '/' belongs to it
            return attr_src, False
        if len(value) < 2 or not value.endswith(quote):
            # quote still open when '/' appeared: part of the value
            return attr_src, False
    return body, True


def _parse_attrs(src):
    if not src or src.isspace():
        return {}
    attrs = {}
    for m in _ATTR_RE.finditer(src):
        name = m.group(1).lower()
        value = m.group(2)
        if value is None:
            attrs[name] = ""
        else:
            if value[:1] in "\"'" and value[-1:] == value[:1]:
                value = value[1:-1]
            attrs[name] = unescape(value)
    return attrs


def _close_tag(stack, tag):
    """Pop until a matching open tag; ignore stray end tags."""
    for depth in range(len(stack) - 1, 0, -1):
        if stack[depth].tag == tag:
            del stack[depth:]
            return
    # no matching open tag: ignore


def _close_if_open(stack, tag, stop_at=()):
    """Close `tag` if it is open above any stop_at boundary."""
    for depth in range(len(stack) - 1, 0, -1):
        current = stack[depth].tag
        if current == tag:
            del stack[depth:]
            return
        if current in stop_at:
            return
