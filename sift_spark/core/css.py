"""CSS selector subset matcher over htmlparser.Node trees.

From-scratch implementation of the selector grammar the reference exercises
through goquery/cascadia (/root/reference/internal/extract/extract.go:59-91,
extract_test.go:125-196, 341-360): type selectors, .class, #id, [attr],
[attr=value], compound selectors, descendant (whitespace) and child (>)
combinators, and comma-separated selector lists. Invalid syntax raises
SelectorError (the reference surfaces a parse error for ">>invalid<<").
"""

from __future__ import annotations

import re


class SelectorError(ValueError):
    pass


_IDENT = r"[a-zA-Z_][a-zA-Z0-9_-]*|\*"
_SIMPLE_RE = re.compile(
    rf"""
    (?P<tag>{_IDENT})?
    (?P<rest>(?:
        \.[a-zA-Z_][a-zA-Z0-9_-]*      |   # class
        \#[a-zA-Z_][a-zA-Z0-9_-]*      |   # id
        \[[a-zA-Z_][a-zA-Z0-9_-]*(?:[~^$*|]?=(?:"[^"]*"|'[^']*'|[^\]]*))?\]
    )*)
    """,
    re.VERBOSE,
)
_PART_RE = re.compile(
    r"""\.([a-zA-Z_][a-zA-Z0-9_-]*)
      | \#([a-zA-Z_][a-zA-Z0-9_-]*)
      | \[([a-zA-Z_][a-zA-Z0-9_-]*)(?:([~^$*|]?=)("[^"]*"|'[^']*'|[^\]]*))?\]
    """,
    re.VERBOSE,
)


class _Simple:
    __slots__ = ("tag", "classes", "ids", "attr_tests")

    def __init__(self, tag, classes, ids, attr_tests):
        self.tag = tag  # None or "*" means any
        self.classes = classes
        self.ids = ids
        self.attr_tests = attr_tests

    def matches(self, node):
        if node.tag is None or node.tag == "root":
            return False
        if self.tag and self.tag != "*" and node.tag != self.tag:
            return False
        if self.classes:
            node_classes = node.attrs.get("class", "").split()
            for cls in self.classes:
                if cls not in node_classes:
                    return False
        for ident in self.ids:
            if node.attrs.get("id") != ident:
                return False
        for name, op, value in self.attr_tests:
            if name not in node.attrs:
                return False
            actual = node.attrs[name]
            if op is None:
                continue
            if op == "=" and actual != value:
                return False
            if op == "~=" and value not in actual.split():
                return False
            if op == "^=" and not actual.startswith(value):
                return False
            if op == "$=" and not actual.endswith(value):
                return False
            if op == "*=" and value not in actual:
                return False
            if op == "|=" and not (actual == value or actual.startswith(value + "-")):
                return False
        return True


def _parse_simple(text):
    m = _SIMPLE_RE.fullmatch(text)
    if m is None or (not m.group("tag") and not m.group("rest")):
        raise SelectorError(f"invalid selector component: {text!r}")
    classes, ids, attr_tests = [], [], []
    for part in _PART_RE.finditer(m.group("rest") or ""):
        if part.group(1):
            classes.append(part.group(1))
        elif part.group(2):
            ids.append(part.group(2))
        else:
            value = part.group(5)
            if value is not None and value[:1] in "\"'" and value[-1:] == value[:1]:
                value = value[1:-1]
            attr_tests.append((part.group(3).lower(), part.group(4), value))
    tag = m.group("tag")
    return _Simple(tag.lower() if tag else None, classes, ids, attr_tests)


def _parse_compound_chain(selector):
    """Parse one selector (no commas) into [(combinator, _Simple), ...].

    combinator is ' ' (descendant) or '>' (child); the first entry's
    combinator is ignored.
    """
    tokens = re.split(r"\s*(>)\s*|\s+", selector.strip())
    chain = []
    combinator = " "
    for token in tokens:
        if token is None or token == "":
            continue
        if token == ">":
            if not chain:
                raise SelectorError(f"selector cannot start with '>': {selector!r}")
            combinator = ">"
            continue
        chain.append((combinator, _parse_simple(token)))
        combinator = " "
    if not chain:
        raise SelectorError(f"empty selector: {selector!r}")
    if combinator == ">":
        raise SelectorError(f"selector cannot end with '>': {selector!r}")
    return chain


def compile_selector(selector):
    """Compile a selector list; returns an object with .select(root)."""
    if not selector or not selector.strip():
        raise SelectorError("empty selector")
    chains = [_parse_compound_chain(part) for part in selector.split(",")]
    return _Compiled(chains)


class _Compiled:
    def __init__(self, chains):
        self.chains = chains

    def select(self, root):
        """All matching elements in document order (deduplicated)."""
        matched = []
        seen = set()
        for node, ancestors in _walk(root):
            for chain in self.chains:
                if id(node) in seen:
                    break
                if _chain_matches(chain, node, ancestors):
                    matched.append(node)
                    seen.add(id(node))
                    break
        return matched


def _walk(root):
    """Yield (node, ancestor_list) in document order."""
    def rec(node, ancestors):
        for child in node.children:
            if child.tag is not None:
                yield child, ancestors
                yield from rec(child, ancestors + [child])
    yield from rec(root, [])


def _chain_matches(chain, node, ancestors):
    _, last = chain[-1]
    if not last.matches(node):
        return False
    return _match_prefix(chain, len(chain) - 2, node)


def _match_prefix(chain, idx, node):
    if idx < 0:
        return True
    combinator_to_right = chain[idx + 1][0]
    simple = chain[idx][1]
    parent = node.parent
    if combinator_to_right == ">":
        if parent is None or parent.tag in (None, "root"):
            return False
        return simple.matches(parent) and _match_prefix(chain, idx - 1, parent)
    # descendant: try every ancestor
    while parent is not None and parent.tag != "root":
        if simple.matches(parent) and _match_prefix(chain, idx - 1, parent):
            return True
        parent = parent.parent
    return False


def select(root, selector):
    """Convenience: compile + select."""
    return compile_selector(selector).select(root)
