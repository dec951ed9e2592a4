"""CSS selector subset matcher over htmlparser.Node trees.

From-scratch implementation of the selector grammar the reference exercises
through goquery/cascadia (/root/reference/internal/extract/extract.go:59-91,
extract_test.go:125-196, 341-360): type selectors (with Selectors 3
namespace qualifiers ns|tag, *|tag, |tag over the parser's svg/math
foreign-content namespaces), .class, #id, [attr],
[attr=value], compound selectors, descendant (whitespace) / child (>) /
adjacent-sibling (+) / general-sibling (~) combinators, the child-position
pseudo-classes :first-child / :last-child / :nth-child(an+b|odd|even|n),
matches-any :is()/:where() over compound lists,
and comma-separated selector lists. Invalid syntax raises SelectorError
(the reference surfaces a parse error for ">>invalid<<")."""

from __future__ import annotations

import re


class SelectorError(ValueError):
    pass


_IDENT = r"[a-zA-Z_][a-zA-Z0-9_-]*|\*"
# attribute values accept an optional trailing case-flag ([attr=v i]
# case-insensitive per CSS Selectors 4; [attr=v s] explicit-sensitive)
_ATTR_VALUE = r"""(?:\s*[~^$*|]?=\s*(?:"[^"]*"|'[^']*'|[^\]\s]*)(?:\s+[iIsS])?\s*)?"""
_SIMPLE_RE = re.compile(
    rf"""
    (?P<ns>(?:{_IDENT})?\|(?!\|))?    # namespace qualifier: ns| *| or bare |
    (?P<tag>{_IDENT})?
    (?P<rest>(?:
        \.[a-zA-Z_][a-zA-Z0-9_-]*      |   # class
        \#[a-zA-Z_][a-zA-Z0-9_-]*      |   # id
        \[[a-zA-Z_][a-zA-Z0-9_-]*{_ATTR_VALUE}\] |
        :[a-zA-Z-]+(?:\((?:[^()]|\([^()]*\))*\))?  # pseudo-class; one
                                           # nesting level in the args
                                           # (:has(:nth-child(2)))
    )*)
    """,
    re.VERBOSE,
)
_PART_RE = re.compile(
    r"""\.([a-zA-Z_][a-zA-Z0-9_-]*)
      | \#([a-zA-Z_][a-zA-Z0-9_-]*)
      | \[([a-zA-Z_][a-zA-Z0-9_-]*)
           (?:\s*([~^$*|]?=)\s*("[^"]*"|'[^']*'|[^\]\s]*)
              (?:\s+([iIsS]))?\s*)?\]
      | :([a-zA-Z-]+)(?:\(((?:[^()]|\([^()]*\))*)\))?
    """,
    re.VERBOSE,
)

# an+b micro-grammar for :nth-child -- "odd", "even", "5", "2n", "2n+1",
# "-n+3", "n" (whitespace inside the parens is normalized away upstream)
_NTH_RE = re.compile(r"(?i)^(?:([+-]?\d*)n([+-]\d+)?|([+-]?\d+))$")


def _parse_nth(arg):
    """:nth-child argument -> (a, b) of an+b (1-based child index matches
    when index == a*k + b for some integer k >= 0)."""
    arg = (arg or "").strip().lower()
    if arg == "odd":
        return 2, 1
    if arg == "even":
        return 2, 0
    m = _NTH_RE.match(arg)
    if not m:
        raise SelectorError(f"invalid :nth-child argument: {arg!r}")
    if m.group(3) is not None:
        return 0, int(m.group(3))
    a_txt = m.group(1)
    a = {"": 1, "+": 1, "-": -1}.get(a_txt, None)
    if a is None:
        a = int(a_txt)
    b = int(m.group(2) or 0)
    return a, b


def _nth_matches(nth, index):
    a, b = nth
    if a == 0:
        return index == b
    k, rem = divmod(index - b, a)
    return rem == 0 and k >= 0


def _child_position(node, of_type=False):
    """(1-based index, count) of `node` among its parent's ELEMENT
    children (CSS counts elements only); of_type restricts to elements
    with the same tag (the -of-type family). A parentless node is its
    own only child (the document element matches :first-child per
    spec)."""
    parent = node.parent
    if parent is None:
        return 1, 1
    index = 0
    total = 0
    for child in parent.children:
        if child.tag is None or (of_type and child.tag != node.tag):
            continue
        total += 1
        if child is node:
            index = total
    return index, total


_PSEUDO_NAMES = frozenset((
    "first-child", "last-child", "nth-child", "nth-last-child",
    "only-child",
    "first-of-type", "last-of-type", "nth-of-type", "nth-last-of-type",
    "only-of-type",
    "empty", "not", "root", "has", "is", "where",
))
_NTH_PSEUDOS = frozenset((
    "nth-child", "nth-of-type", "nth-last-child", "nth-last-of-type",
))


class _Simple:
    __slots__ = ("tag", "ns", "classes", "ids", "attr_tests",
                 "pseudo_tests")

    def __init__(self, tag, classes, ids, attr_tests, pseudo_tests=(),
                 ns=None):
        self.tag = tag  # None or "*" means any
        # namespace constraint (Selectors 3, no @namespace context --
        # matching net/html's model where HTML elements carry the empty
        # namespace): None = no qualifier = any namespace (no default
        # namespace is declared); "*" = explicit any (*|tag); "" =
        # no-namespace only (|tag); "name" = that namespace (svg|tag)
        self.ns = ns
        self.classes = classes
        self.ids = ids
        self.attr_tests = attr_tests
        self.pseudo_tests = pseudo_tests  # (name, (a, b) | None)

    def matches(self, node):
        # the synthetic parse root is identified by IDENTITY (the only
        # parentless node htmlparser.parse builds), never by tag name --
        # a literal <root> element in page HTML is an ordinary element
        if node.tag is None or node.parent is None:
            return False
        if self.tag and self.tag != "*" and node.tag != self.tag:
            return False
        if self.ns is not None and self.ns != "*":
            if getattr(node, "namespace", "") != self.ns:
                return False
        if self.classes:
            node_classes = node.attrs.get("class", "").split()
            for cls in self.classes:
                if cls not in node_classes:
                    return False
        for ident in self.ids:
            if node.attrs.get("id") != ident:
                return False
        for name, op, value, ci in self.attr_tests:
            if name not in node.attrs:
                return False
            actual = node.attrs[name]
            if op is None:
                continue
            if ci:  # [attr=v i] -- ASCII-case-insensitive value compare
                actual = actual.lower()
                value = value.lower()
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
        for name, arg in self.pseudo_tests:
            if name == "not":
                if arg.matches(node):
                    return False
                continue
            if name == "root":
                # the document's top element: its parent is the
                # synthetic parse root, identified by identity (the
                # parentless node) so children of a literal <root>
                # element never spoof :root
                if node.parent is not None and node.parent.parent is not None:
                    return False
                continue
            if name == "has":
                if not _has_matches(node, arg):
                    return False
                continue
            if name in ("is", "where"):
                # matches-any over the alternative list; :where differs
                # from :is only in specificity, which this matcher does
                # not rank
                if not any(alt.matches(node) for alt in arg):
                    return False
                continue
            if name == "empty":
                if any(
                    c.tag is not None or c.text for c in node.children
                ):
                    return False
                continue
            of_type = name.endswith("-of-type")
            index, total = _child_position(node, of_type)
            base = name[:-8] if of_type else name[:-6]  # strip suffix
            if base == "first" and index != 1:
                return False
            if base == "last" and index != total:
                return False
            if base == "only" and not (index == 1 and total == 1):
                return False
            if base == "nth" and not _nth_matches(arg, index):
                return False
            if base == "nth-last" and not _nth_matches(
                arg, total - index + 1
            ):
                return False
        return True


def _contains_top_level(text, chars):
    """True when any of `chars` appears outside parens, brackets and
    quoted strings -- the same nesting rules as _split_top_commas
    (paren and bracket depths tracked SEPARATELY, so a stray ']' inside
    parens cannot cancel the paren depth), so a quoted attribute value
    containing spaces or combinator characters (':is(a[title="x y"])')
    never reads as a combinator."""
    depth_paren = depth_bracket = 0
    quote = None
    for ch in text:
        if quote is not None:
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
        elif ch == "(":
            depth_paren += 1
        elif ch == ")":
            depth_paren -= 1
        elif ch == "[":
            depth_bracket += 1
        elif ch == "]":
            depth_bracket -= 1
        elif depth_paren == 0 and depth_bracket == 0 and ch in chars:
            return True
    return False


def _parse_simple(text):
    m = _SIMPLE_RE.fullmatch(text)
    if m is None or (not m.group("tag") and not m.group("rest")):
        raise SelectorError(f"invalid selector component: {text!r}")
    ns_qualifier = m.group("ns")
    if ns_qualifier is not None and not m.group("tag"):
        raise SelectorError(
            f"namespace qualifier requires an element name or *: {text!r}"
        )
    ns = None if ns_qualifier is None else ns_qualifier[:-1].lower()
    classes, ids, attr_tests, pseudo_tests = [], [], [], []
    for part in _PART_RE.finditer(m.group("rest") or ""):
        if part.group(1):
            classes.append(part.group(1))
        elif part.group(2):
            ids.append(part.group(2))
        elif part.group(7):
            name = part.group(7).lower()
            if name not in _PSEUDO_NAMES:
                raise SelectorError(f"unsupported pseudo-class: :{name}")
            arg = part.group(8)
            if name in _NTH_PSEUDOS:
                if arg is None:
                    raise SelectorError(f":{name} requires an argument")
                pseudo_tests.append((name, _parse_nth(arg)))
            elif name == "not":
                if not arg or not arg.strip():
                    raise SelectorError(":not requires an argument")
                if _contains_top_level(arg.strip(), " \t>+~,"):
                    # combinators/commas only count OUTSIDE parens --
                    # :not(:nth-child(2n+1)) is a simple selector
                    raise SelectorError(
                        ":not accepts a simple selector only"
                    )
                pseudo_tests.append((name, _parse_simple(arg.strip())))
            elif name == "has":
                if not arg or not arg.strip():
                    raise SelectorError(":has requires an argument")
                pseudo_tests.append((name, _parse_has_arg(arg)))
            elif name in ("is", "where"):
                # Selectors 4 matches-any; this matcher accepts a list
                # of COMPOUND selectors (combinators inside the list are
                # out of grammar, same restriction as :not)
                if not arg or not arg.strip():
                    raise SelectorError(f":{name} requires an argument")
                alternatives = []
                for alt in _split_top_commas(arg):
                    alt = alt.strip()
                    if not alt or _contains_top_level(alt, " \t>+~"):
                        raise SelectorError(
                            f":{name} accepts a compound selector "
                            f"list only: {arg!r}"
                        )
                    alternatives.append(_parse_simple(alt))
                pseudo_tests.append((name, tuple(alternatives)))
            else:
                if arg is not None:
                    raise SelectorError(f":{name} takes no argument")
                pseudo_tests.append((name, None))
        else:
            value = part.group(5)
            if value is not None and value[:1] in "\"'" and value[-1:] == value[:1]:
                value = value[1:-1]
            ci = (part.group(6) or "").lower() == "i"
            attr_tests.append((part.group(3).lower(), part.group(4),
                               value, ci))
    tag = m.group("tag")
    return _Simple(tag.lower() if tag else None, classes, ids, attr_tests,
                   tuple(pseudo_tests), ns=ns)


def _parse_compound_chain(selector):
    """Parse one selector (no commas) into [(combinator, _Simple), ...].

    combinator is ' ' (descendant), '>' (child), '+' (adjacent sibling)
    or '~' (general sibling); the first entry's combinator is ignored.
    """
    # normalize whitespace inside NTH-STYLE pseudo-class parens
    # (":nth-child( 2n + 1 )") so the combinator tokenization below stays
    # simple; other arguments (e.g. :not(.ad)) keep their spacing so a
    # combinator inside them is still detected and rejected
    def _norm_parens(m):
        inner = m.group(1)
        if re.fullmatch(r"[\s0-9nN+-]*|\s*(?i:odd|even)\s*", inner):
            return "(" + re.sub(r"\s+", "", inner) + ")"
        return "(" + inner.strip() + ")"

    normalized = re.sub(
        r"\(\s*([^()]*?)\s*\)", _norm_parens, selector.strip()
    )
    # paren-aware tokenizer: '+' inside :nth-child(2n+1) is NOT a
    # combinator, so a simple-selector token may contain (...) groups
    # (one nesting level, for :has(:nth-child(2))-style arguments)
    tokens = []
    pos = 0
    for m in re.finditer(
        r"\s*(?:([>+~])|((?:\((?:[^()]|\([^()]*\))*\)|\[[^\]]*\]|[^\s>+~([])+))",
        normalized,
    ):
        if m.start() != pos:
            raise SelectorError(f"invalid selector syntax: {selector!r}")
        pos = m.end()
        tokens.append(m.group(1) or m.group(2))
    if pos != len(normalized):
        raise SelectorError(f"invalid selector syntax: {selector!r}")
    chain = []
    combinator = " "
    pending = None
    for token in tokens:
        if token is None or token == "":
            continue
        if token in (">", "+", "~"):
            if not chain:
                raise SelectorError(
                    f"selector cannot start with {token!r}: {selector!r}"
                )
            if pending is not None:
                raise SelectorError(
                    f"misplaced combinator {token!r}: {selector!r}"
                )
            pending = token
            combinator = token
            continue
        chain.append((combinator, _parse_simple(token)))
        combinator = " "
        pending = None
    if not chain:
        raise SelectorError(f"empty selector: {selector!r}")
    if pending is not None:
        raise SelectorError(
            f"selector cannot end with {pending!r}: {selector!r}"
        )
    return chain


def _split_top_commas(selector):
    """Split a selector list on commas OUTSIDE parens, brackets and
    quoted strings (a comma inside ':has(a, b)', '[data-x="1,2"]' or a
    paren inside '[data-x="(a"]' must not affect the split)."""
    parts, cur = [], []
    depth_paren = depth_bracket = 0
    quote = None
    for ch in selector:
        if quote is not None:
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
        elif ch == "(":
            depth_paren += 1
        elif ch == ")":
            depth_paren -= 1
        elif ch == "[":
            depth_bracket += 1
        elif ch == "]":
            depth_bracket -= 1
        elif ch == "," and depth_paren == 0 and depth_bracket == 0:
            parts.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    parts.append("".join(cur))
    return parts


def compile_selector(selector):
    """Compile a selector list; returns an object with .select(root)."""
    if not selector or not selector.strip():
        raise SelectorError("empty selector")
    chains = [
        _parse_compound_chain(part) for part in _split_top_commas(selector)
    ]
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


def _element_siblings_before(node):
    """Element siblings preceding `node`, nearest LAST."""
    parent = node.parent
    if parent is None:
        return []
    out = []
    for child in parent.children:
        if child is node:
            break
        if child.tag is not None:
            out.append(child)
    return out


def _match_prefix(chain, idx, node):
    if idx < 0:
        return True
    combinator_to_right = chain[idx + 1][0]
    simple = chain[idx][1]
    if combinator_to_right == "+":
        before = _element_siblings_before(node)
        if not before:
            return False
        prev = before[-1]
        return simple.matches(prev) and _match_prefix(chain, idx - 1, prev)
    if combinator_to_right == "~":
        for sibling in reversed(_element_siblings_before(node)):
            if simple.matches(sibling) and _match_prefix(chain, idx - 1,
                                                         sibling):
                return True
        return False
    parent = node.parent
    if combinator_to_right == ">":
        # the synthetic parse root (parentless by identity) is a tree
        # boundary, not a matchable parent; a literal <root> element is
        if parent is None or parent.tag is None or parent.parent is None:
            return False
        return simple.matches(parent) and _match_prefix(chain, idx - 1, parent)
    # descendant: try every ancestor up to (excluding) the parse root
    while parent is not None and parent.parent is not None:
        if simple.matches(parent) and _match_prefix(chain, idx - 1, parent):
            return True
        parent = parent.parent
    return False


def _parse_has_arg(arg):
    """Parse a :has() argument: a comma list of RELATIVE selectors, each
    optionally starting with a combinator (':has(> p)', ':has(~ li a)').
    Returns [(anchor_combinator, chain), ...]. One level of nested
    parens inside the argument (':has(:nth-child(2))',
    ':has(:not(.ad))') is supported; deeper nesting
    (':has(:not(:nth-child(2)))') remains out of grammar and raises."""
    alternatives = []
    for alt in _split_top_commas(arg):
        alt = alt.strip()
        if not alt:
            raise SelectorError(f"empty :has() alternative: {arg!r}")
        anchor = " "
        if alt[0] in ">+~":
            anchor = alt[0]
            alt = alt[1:].strip()
            if not alt:
                raise SelectorError(f":has cannot end with {anchor!r}")
        alternatives.append((anchor, _parse_compound_chain(alt)))
    return alternatives


class _IsNode:
    """Anchor pseudo-simple for :has(): matches one specific node, so
    the generic combinator machinery (_match_prefix) resolves the
    relative selector against the anchored element."""

    __slots__ = ("target",)

    def __init__(self, target):
        self.target = target

    def matches(self, node):
        return node is self.target


def _has_matches(node, alternatives):
    """node:has(alt, ...) -- true when some element matches one of the
    relative chains anchored at `node`. Implemented by prefixing each
    chain with an identity anchor and running the standard chain match.

    Candidate scope: for descendant/child anchors (':has(S)',
    ':has(> S)') every link of the chain must sit BELOW `node`, so the
    walk starts at `node` -- O(subtree) per test. Sibling anchors
    (':has(~ S)', ':has(+ S)') can match anywhere under a following
    sibling, so they walk the document root (rare form; pages are
    small and the extraction UDF caches compiled selectors)."""
    doc_root = None
    for anchor_comb, chain in alternatives:
        if anchor_comb in (" ", ">"):
            walk_root = node
        else:
            if doc_root is None:
                doc_root = node
                while doc_root.parent is not None:
                    doc_root = doc_root.parent
            walk_root = doc_root
        full = ([(" ", _IsNode(node)), (anchor_comb, chain[0][1])]
                + chain[1:])
        for candidate, ancestors in _walk(walk_root):
            if candidate is node:
                continue
            if _chain_matches(full, candidate, ancestors):
                return True
    return False


def select(root, selector):
    """Convenience: compile + select."""
    return compile_selector(selector).select(root)
