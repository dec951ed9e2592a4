"""Selection/formatting parity: exact-output ports of
chunk_selection_test.go and context_calculator_test.go."""

import pytest

from sift_spark.core.counters import WORDS
from sift_spark.core.selection import (
    BEGINNING,
    END,
    MIDDLE,
    ChunkSelector,
    ChunkWithIndex,
    context_strategy,
    detect_field_type,
    remove_overlap_prefix,
)

TEST_CHUNKS = ["chunk0", "chunk1", "chunk2", "chunk3", "chunk4"]


def make_selector(max_units, strategy=BEGINNING):
    return ChunkSelector(WORDS, max_units, strategy)


# ---- strategy ordering (chunk_selection_test.go:507-560) ---------------------------


@pytest.mark.parametrize("strategy,expected", [
    (BEGINNING, ["chunk0", "chunk1", "chunk2", "chunk3", "chunk4"]),
    (END, ["chunk4", "chunk3", "chunk2", "chunk1", "chunk0"]),
    (MIDDLE, ["chunk2", "chunk3", "chunk1", "chunk4", "chunk0"]),
])
def test_strategy_order(strategy, expected):
    selector = make_selector(100, strategy)
    ordered = selector.prepare_for_strategy(TEST_CHUNKS)
    assert [c.text for c in ordered] == expected


# ---- document-order output (chunk_selection_test.go:562-639) -----------------------


@pytest.mark.parametrize("strategy,max_words,expected", [
    (BEGINNING, 2, "chunk0\nchunk1"),
    (END, 2, "chunk3\nchunk4"),
    (MIDDLE, 2, "chunk2\nchunk3"),
])
def test_output_order_with_size_constraints(strategy, max_words, expected):
    selector = make_selector(max_words, strategy)
    assert selector.apply_size_constraints(TEST_CHUNKS) == expected


def test_no_limit_returns_all_in_order():
    selector = make_selector(0, BEGINNING)
    result = selector.apply_size_constraints(["chunk1", "chunk2"])
    assert result == "chunk1\nchunk2"


def test_empty_chunks():
    selector = make_selector(10, BEGINNING)
    assert selector.apply_size_constraints([]) == ""


# ---- context windows (chunk_selection_test.go:641-789) -----------------------------

ALPHA = ["A", "B", "C", "D", "E", "F", "G"]

CONTEXT_CASES = [
    ("no context", [3], 0, 0, 10, "D"),
    ("before only", [3], 2, 0, 10, "B\nC\nD"),
    ("after only", [3], 0, 2, 10, "D\nE\nF"),
    ("symmetric", [3], 1, 1, 10, "C\nD\nE"),
    ("begin boundary", [0], 2, 1, 10, "A\nB"),
    ("end boundary", [6], 1, 2, 10, "F\nG"),
    ("overlapping targets", [2, 4], 1, 1, 10, "B\nC\nD\nE\nF"),
    ("size cutoff", [3], 2, 2, 3, "B\nC\nD"),
    ("large window", [3], 5, 5, 10, "A\nB\nC\nD\nE\nF\nG"),
]


@pytest.mark.parametrize("name,targets,before,after,max_words,expected",
                         CONTEXT_CASES, ids=[c[0] for c in CONTEXT_CASES])
def test_select_with_context_windows(name, targets, before, after, max_words,
                                     expected):
    selector = make_selector(max_words, BEGINNING)
    ordered = [ChunkWithIndex(ALPHA[i], i) for i in targets]
    result = selector.select(ordered, ALPHA, before, after)
    assert result == expected


# ---- overlap removal (chunk_selection_test.go:248-291) -----------------------------


@pytest.mark.parametrize("current,previous,expected", [
    ("current chunk content", "previous chunk content", "current chunk content"),
    ("overlap content here", "some text overlap content", "here"),
    ("same content", "prefix same content", ""),
    ("", "previous", ""),
])
def test_remove_overlap_prefix(current, previous, expected):
    assert remove_overlap_prefix(current, previous) == expected


# ---- search no-limit top-k (chunk_selection.go:589-649) ----------------------------


def test_search_no_limit_selects_relevant_with_context():
    all_chunks = ["chunk0", "chunk1", "chunk2", "chunk3", "chunk4", "chunk5"]
    scored = [("chunk2", 0.9, 2), ("chunk4", 0.7, 4), ("chunk1", 0.5, 1),
              ("chunk0", 0.3, 0), ("chunk3", 0.2, 3), ("chunk5", 0.1, 5)]
    selector = make_selector(0, BEGINNING)
    ordered = selector.prepare_for_search(scored)
    result = selector.select(ordered, all_chunks, 1, 2)
    # 6 pass threshold -> top 3 (50%) = chunks 2,4,1 with context 1/2
    # candidates: 2 -> 1,2,3,4; 4 -> 3..wait 4 -> 3,4,5,6(x) -> 5; 1 -> 0
    assert result.startswith("chunk0")
    assert "chunk2" in result and "chunk4" in result


def test_search_fallback_when_no_scores_pass():
    all_chunks = ["a", "b", "c"]
    scored = [("a", 0.0, 0), ("b", 0.0, 1), ("c", 0.0, 2)]
    selector = make_selector(0, BEGINNING)
    ordered = selector.prepare_for_search(scored)
    result = selector.select(ordered, all_chunks, 0, 0)
    # fallback: top 2 ordered chunks
    assert result == "a\nb"


def test_search_gap_marker():
    all_chunks = ["alpha one", "beta two", "gamma three", "delta four",
                  "epsilon five"]
    scored = [("alpha one", 0.9, 0), ("epsilon five", 0.8, 4),
              ("beta two", 0.0, 1), ("gamma three", 0.0, 2),
              ("delta four", 0.0, 3)]
    selector = make_selector(4, BEGINNING)
    ordered = selector.prepare_for_search(scored)
    result = selector.select(ordered, all_chunks, 0, 0)
    assert result == "alpha one\n\n---\n\nepsilon five"


# ---- field detection + strategies (context_calculator_test.go:11-224) --------------


@pytest.mark.parametrize("text,field,is_list", [
    ("# Main Title", "h1", False),
    ("## Section Header", "h2", False),
    ("#hashtag content", "body", False),
    ("- First bullet item", "body", True),
    ("1. First numbered item", "body", True),
    ("1.No space after period", "body", False),
    ("```python\ndef hello():\n    print('world')", "code", False),
    ("Use the `print()` function to output text", "code", False),
    ("This is **very important** information", "bold", False),
    ("This is *emphasized* text", "italic", False),
    ("", "body", False),
    ("This is regular paragraph text without any special formatting.",
     "body", False),
])
def test_detect_field_type(text, field, is_list):
    assert detect_field_type(text) == (field, is_list)


@pytest.mark.parametrize("field,is_list,before,after,name", [
    ("h1", False, 0.2, 0.8, "header-following"),
    ("body", True, 0.8, 0.2, "list-preceding"),
    ("code", False, 0.3, 0.7, "code-following"),
    ("body", False, 0.5, 0.5, "balanced"),
    ("bold", False, 0.65, 0.35, "emphasis-preceding"),
])
def test_context_strategy(field, is_list, before, after, name):
    assert context_strategy(field, is_list) == (before, after, name)


# ---- smart context budget (context_calculator_test.go:226-313) ---------------------


def test_smart_context_respects_budget():
    from sift_spark.core.counters import Counter
    from sift_spark.core.selection import ContextCalculator

    counter = Counter(WORDS)
    calc = ContextCalculator(counter, 100)
    all_chunks = ["Before chunk", "This is the target chunk with some content",
                  "After chunk"]
    target = ChunkWithIndex(all_chunks[1], 1, 1.0)
    chunks = calc.smart_context(target, all_chunks, 100)
    total = sum(counter.count(c.text) for c in chunks)
    assert total <= 100
    assert any(c.index == 1 for c in chunks)


def test_smart_context_target_exceeds_budget():
    from sift_spark.core.counters import Counter
    from sift_spark.core.selection import ContextCalculator

    counter = Counter(WORDS)
    calc = ContextCalculator(counter, 5)
    text = "This is a very long target chunk with many words that exceeds the budget"
    target = ChunkWithIndex(text, 1, 1.0)
    chunks = calc.smart_context(target, ["Before", text, "After"], 5)
    assert len(chunks) == 1
    assert counter.count(chunks[0].text) <= 5
