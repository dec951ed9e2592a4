"""Chunking parity: ports of chunk_test.go tables (exact counts/ranges)."""

import pytest

from sift_spark.core.chunker import split_text

EXACT_COUNT_CASES = [
    ("empty", "", 100, 0),
    ("whitespace", "   \n\t   ", 100, 0),
    ("fits single", "This is a short text that fits in one chunk.", 100, 1),
    ("zero max", "Some text", 0, 0),
    ("basic word", "This is a long text that needs to be split into multiple "
                   "chunks for testing purposes.", 30, 3),
    ("paragraphs", "First paragraph.\n\nSecond paragraph.\n\nThird paragraph.",
     25, 3),
    ("sentences", "First sentence. Second sentence. Third sentence.", 20, 3),
    ("questions", "First question? Second question? Third question?", 20, 3),
    ("exclamations", "First exclamation! Second exclamation! Third exclamation!",
     25, 3),
    ("oversized word", "short supercalifragilisticexpialidocious word", 20, 3),
]


@pytest.mark.parametrize("name,text,max_size,expected",
                         EXACT_COUNT_CASES, ids=[c[0] for c in EXACT_COUNT_CASES])
def test_exact_chunk_counts(name, text, max_size, expected):
    result = split_text(text, max_size)
    assert len(result) == expected, result
    for chunk in result:
        if len(chunk) > max_size:
            assert len(chunk.split()) == 1, f"multi-word oversize: {chunk!r}"
        assert chunk.strip() != ""


def test_negative_max_size():
    assert split_text("This is test content for validation.", -5) == []


RANGE_CASES = [
    ("single oversized", "supercalifragilisticexpialidocious", 20, 1, 1,
     ["supercalifragilisticexpialidocious"]),
    ("multiple oversized", "antidisestablishmentarianism pseudopseudohypoparathyroidism",
     25, 2, 2, ["antidisestablishmentarianism", "pseudopseudohypoparathyroidism"]),
    ("mixed", "The antidisestablishmentarianism was quite extraordinary indeed",
     15, 2, 6, ["antidisestablishmentarianism"]),
    ("oversized with punct", "This supercalifragilisticexpialidocious. Next sentence here.",
     20, 2, 3, ["supercalifragilisticexpialidocious."]),
    ("extremely long", "This " + "verylongword" * 10 + " is massive", 30, 2, 3,
     ["verylongword" * 10]),
    ("unicode oversized",
     "The café's encyclopædiasupercalifragilisticexpialidocious menu was extraordinäry",
     20, 3, 5, ["encyclopædiasupercalifragilisticexpialidocious"]),
]


@pytest.mark.parametrize("name,text,max_size,lo,hi,contains",
                         RANGE_CASES, ids=[c[0] for c in RANGE_CASES])
def test_oversized_words(name, text, max_size, lo, hi, contains):
    result = split_text(text, max_size)
    assert lo <= len(result) <= hi, result
    for expected in contains:
        assert any(expected in chunk for chunk in result), (expected, result)
    # no data loss: word counts preserved (chunk_test.go:394-403)
    original_words = text.split()
    result_words = [w for chunk in result for w in chunk.split()]
    assert len(original_words) == len(result_words)


SENTENCE_CASES = [
    ("mixed delimiters",
     "This is a statement. Is this a question? This is exciting! Another statement.",
     30, 3, 4),
    ("question preservation", "Are you coming? Maybe you should? I think so?", 25, 2, 3),
    ("exclamation preservation", "Wow! Amazing! Incredible stuff here!", 15, 3, 4),
    ("consecutive delimiters", "Really?! Are you sure?! Absolutely!", 20, 2, 4),
    ("no trailing space", "Question?Another sentence.Final!", 15, 1, 3),
    ("long mixed",
     "This is a very long statement that should be chunked. But will this "
     "question work properly? And what about this exclamation!", 40, 3, 5),
    ("boundaries", "Short. Question? Exclamation! Another.", 12, 3, 5),
    ("empty segments", "Start. ? ! End.", 10, 2, 4),
]


@pytest.mark.parametrize("name,text,max_size,lo,hi",
                         SENTENCE_CASES, ids=[c[0] for c in SENTENCE_CASES])
def test_sentence_delimiters(name, text, max_size, lo, hi):
    result = split_text(text, max_size)
    assert lo <= len(result) <= hi, result
    for chunk in result:
        assert chunk.strip() != ""


MERGE_CASES = [
    ("initials", "G. W. F. Hegel was a German philosopher.", 25, 1, 3),
    ("abbreviations", "Dr. Smith works at MIT. He has a Ph.D. in Computer Science.",
     30, 1, 3),
    ("mixed short/long",
     "A. B. This is a longer sentence that should remain separate. C. D.", 40, 3, 4),
    ("cannot merge", "This is a very long sentence that cannot be merged. A.", 25, 2, 4),
    ("tolkien", "J. R. R. Tolkien wrote The Lord of the Rings.", 30, 1, 3),
    ("tiny max", "A. B. C.", 5, 1, 3),
    ("min size edge", "X. Y.", 10, 1, 2),
]


@pytest.mark.parametrize("name,text,max_size,lo,hi",
                         MERGE_CASES, ids=[c[0] for c in MERGE_CASES])
def test_short_segment_merging(name, text, max_size, lo, hi):
    result = split_text(text, max_size)
    assert lo <= len(result) <= hi, result
    # short chunks should be a minority (chunk_test.go:671-691)
    min_size = max(3, int(max_size * 0.15))
    short = sum(1 for c in result if len(c) < min_size)
    assert short <= len(result) // 2, result
