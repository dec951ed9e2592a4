"""Readability-style main-content extraction over a Node tree.

From-scratch implementation of the public Mozilla Readability algorithm
(the reference delegates to go-shiori/go-readability,
/root/reference/internal/extract/extract.go:42-56; algorithm summarized in
SURVEY.md Appendix A.1):

  1. strip script/style and "unlikely candidate" elements by class/id regex
  2. score paragraph-like elements (p, td, pre, blockquote>p) by text length
     and comma count; propagate to ancestors with decaying dividers
  3. class/id weighting (+/-25) and link-density scaling on candidates
  4. pick the top candidate, ascend to a better-scoring parent, merge
     qualifying siblings
  5. return the winning subtree (cloned), ready for markdown serialization

Deterministic and pure: no randomness, no wall clock.
"""

from __future__ import annotations

import re

from .htmlparser import Node

_POSITIVE_RE = re.compile(
    r"article|body|content|entry|hentry|h-entry|main|page|pagination|post|"
    r"text|blog|story",
    re.I,
)
_NEGATIVE_RE = re.compile(
    r"-ad-|hidden|^hid$| hid$| hid |^hid |banner|combx|comment|com-|contact|"
    r"foot|footer|footnote|gdpr|masthead|media|meta|outbrain|promo|related|"
    r"scroll|share|shoutbox|sidebar|skyscraper|sponsor|shopping|tags|tool|"
    r"widget",
    re.I,
)
_UNLIKELY_RE = re.compile(
    r"-ad-|ai2html|banner|breadcrumbs|combx|comment|community|cover-wrap|"
    r"disqus|extra|footer|gdpr|header|legends|menu|related|remark|replies|"
    r"rss|shoutbox|sidebar|skyscraper|social|sponsor|supplemental|"
    r"ad-break|agegate|pagination|pager|popup|yom-remote",
    re.I,
)
_MAYBE_CANDIDATE_RE = re.compile(r"and|article|body|column|content|main|shadow", re.I)

_SCORE_TAGS = frozenset(("p", "td", "pre"))
_INIT_SCORES = {
    "div": 5,
    "pre": 3,
    "td": 3,
    "blockquote": 3,
    "address": -3,
    "ol": -3,
    "ul": -3,
    "dl": -3,
    "dd": -3,
    "dt": -3,
    "li": -3,
    "form": -3,
    "h1": -5,
    "h2": -5,
    "h3": -5,
    "h4": -5,
    "h5": -5,
    "h6": -5,
    "th": -5,
}

MIN_PARAGRAPH_LENGTH = 25
SIBLING_SCORE_FLOOR = 10.0
SIBLING_SCORE_RATIO = 0.2


def _class_id(node):
    return f"{node.attrs.get('class', '')} {node.attrs.get('id', '')}"


def _class_weight(node):
    weight = 0
    ident = _class_id(node)
    if ident.strip():
        if _NEGATIVE_RE.search(ident):
            weight -= 25
        if _POSITIVE_RE.search(ident):
            weight += 25
    return weight


def _link_density(node, tables=None):
    # raw text lengths on both sides of the ratio: same semantics as the
    # collapsed-text ratio to within whitespace noise, no regex cost
    if tables is not None:
        text_tbl, link_tbl = tables
        key = id(node)
        if key in text_tbl:
            total = text_tbl[key]
            if total == 0:
                return 0.0
            return min(1.0, link_tbl.get(key, 0) / total)
        # node outside the tabled subtree (ancestor above <body>, e.g.
        # <html>): fall through to the live computation so it does NOT
        # silently get density 0.0 and escape the penalty
    total = node.text_len()
    if total == 0:
        return 0.0
    link_len = sum(a.text_len() for a in node.find_all({"a"}))
    return min(1.0, link_len / total)


def _density_tables(root):
    """One post-order pass computing, per node id:
      text_tbl: raw text length excluding script/style subtrees
        (== Node.text_len)
      link_tbl: sum of text_len over DESCENDANT <a> elements
        (== sum(a.text_len() for a in node.find_all({'a'})), including
        the double-count of nested anchors that the find_all sum
        produces)
    Candidates are overlapping ancestors, so per-candidate subtree walks
    are O(n * depth); this is O(n) total."""
    text_tbl, link_tbl = {}, {}
    stack = [(root, False)]
    while stack:
        node, done = stack.pop()
        if node.tag in ("script", "style"):
            text_tbl[id(node)] = 0
            link_tbl[id(node)] = 0
            continue
        if node.tag is None:
            text_tbl[id(node)] = len(node.text)
            link_tbl[id(node)] = 0
            continue
        if not done:
            stack.append((node, True))
            stack.extend((child, False) for child in node.children)
            continue
        total = 0
        link = 0
        for child in node.children:
            child_total = text_tbl[id(child)]
            total += child_total
            # link contribution INCLUDING the child itself if it is <a>
            link += link_tbl[id(child)] + (
                child_total if child.tag == "a" else 0
            )
        text_tbl[id(node)] = total
        link_tbl[id(node)] = link
    return text_tbl, link_tbl


def _is_unlikely(node):
    ident = _class_id(node)
    if not ident.strip():
        return False
    return (
        _UNLIKELY_RE.search(ident)
        and not _MAYBE_CANDIDATE_RE.search(ident)
        and node.tag not in ("body", "a", "html", "article", "main")
    )


def extract_article(root, scores_out=None):
    """Return the extracted article subtree (a Node), or None.

    MUTATES the parsed tree (noise stripping + re-parenting the winning
    candidate and merged siblings out of it); callers parse fresh per
    document, so no defensive whole-tree clone is paid. The returned
    subtree holds the detached originals, not clones.

    scores_out: optional dict the caller supplies to receive the final
    per-candidate scores keyed by id(node) (link-density-scaled) --
    the node-table operator exports them as features; extraction
    behavior is unchanged.
    """
    body = _find_body(root)
    if body is None:
        return None

    work = body
    _strip_noise(work)

    scores = {}  # id(node) -> float
    nodes = {}  # id(node) -> node

    for para in work.find_all(_SCORE_TAGS):
        text = para.inner_text()
        if len(text) < MIN_PARAGRAPH_LENGTH:
            continue
        content_score = 1.0
        content_score += text.count(",") + text.count("、")
        content_score += min(3.0, len(text) / 100.0)

        ancestor = para.parent
        level = 0
        while ancestor is not None and ancestor.tag not in (None, "root"):
            key = id(ancestor)
            if key not in scores:
                scores[key] = float(_INIT_SCORES.get(ancestor.tag, 0)) + _class_weight(
                    ancestor
                )
                nodes[key] = ancestor
            divider = 1 if level == 0 else (2 if level == 1 else level * 3)
            scores[key] += content_score / divider
            ancestor = ancestor.parent
            level += 1
            if level > 5:
                break

    if not scores:
        # no scorable paragraphs: fall back to the whole body content
        return work if work.inner_text() else None

    density_tables = _density_tables(work)

    # scale by (1 - link density) and pick the top candidate
    best_key, best_score = None, float("-inf")
    for key, raw in scores.items():
        final = raw * (1.0 - _link_density(nodes[key], density_tables))
        scores[key] = final
        if final > best_score:
            best_key, best_score = key, final
    if scores_out is not None:
        scores_out.update(scores)

    top = nodes[best_key]

    # parent ascent: a parent scoring above the current top becomes the top
    # (public Readability behavior; this is what pulls sibling headers into
    # the article for the blog fixture)
    last_score = scores[best_key]
    threshold = last_score / 3.0
    parent = top.parent
    while parent is not None and parent.tag not in (None, "root", "body", "html"):
        parent_score = scores.get(id(parent))
        if parent_score is None:
            parent = parent.parent
            continue
        if parent_score < threshold:
            break
        if parent_score > last_score:
            top = parent
            break
        last_score = parent_score
        parent = parent.parent

    # sibling merge
    container = Node(top.tag if top.tag != "body" else "div")
    top_score = scores.get(id(top), best_score)
    sibling_threshold = max(SIBLING_SCORE_FLOOR, top_score * SIBLING_SCORE_RATIO)
    parent = top.parent
    siblings = list(parent.children) if parent is not None else [top]
    kept = []
    for sibling in siblings:
        if sibling.tag is None:
            continue
        keep = False
        if sibling is top:
            keep = True
        else:
            bonus = 0.0
            sib_class = sibling.attrs.get("class", "")
            if sib_class and sib_class == top.attrs.get("class", "") and sib_class:
                bonus = top_score * 0.2
            sib_score = scores.get(id(sibling))
            if sib_score is not None and sib_score + bonus >= sibling_threshold:
                keep = True
            elif sibling.tag == "p":
                text = sibling.inner_text()
                density = _link_density(sibling, density_tables)
                if len(text) > 80 and density < 0.25:
                    keep = True
                elif 0 < len(text) <= 80 and density == 0 and re.search(
                    r"\.( |$)", text
                ):
                    keep = True
        if keep:
            kept.append(sibling)
    # re-parent the originals (no deep clone -- the source tree is
    # single-use, parsed per document); detach first so the old parent's
    # child list stays consistent with sibling.parent
    for sibling in kept:
        sibling.detach()
        container.append(sibling)

    if not container.children:
        return None
    if len(container.children) == 1 and container.children[0].tag == top.tag:
        return container.children[0]
    return container


def _find_body(root):
    for node in root.iter_elements():
        if node.tag == "body":
            return node
    return root  # fragment input: treat the whole tree as body


def _strip_noise(work):
    """Remove script/style/noscript and unlikely-candidate containers."""
    removable = []
    for node in work.iter_elements():
        if node.tag in ("script", "style", "noscript", "iframe", "object", "embed"):
            removable.append(node)
        elif node.tag not in ("body",) and _is_unlikely(node):
            removable.append(node)
    for node in removable:
        if node.parent is not None:
            node.detach()
