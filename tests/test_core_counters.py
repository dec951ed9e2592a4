"""Counter parity: ports of counter_test.go."""

import math

import pytest

from sift_spark.core.counters import CHARS, TOKENS, WORDS, Counter
from sift_spark.core.ranking import TfidfCorpus, tfidf_tokenize


@pytest.mark.parametrize("text,expected", [
    ("", 0), ("hello", 1), ("hello world test", 3),
    ("  hello   world  ", 2), ("café naïve résumé", 3),
])
def test_word_counter(text, expected):
    assert Counter(WORDS).count(text) == expected


@pytest.mark.parametrize("text,expected", [
    ("", 0), ("a", 1), ("hello", 5), ("café", 4), ("a b", 3), ("hello 👋", 7),
])
def test_char_counter(text, expected):
    assert Counter(CHARS).count(text) == expected


def test_token_counter_positive():
    counter = Counter(TOKENS)
    assert counter.count("") == 0
    assert counter.count("hello world") > 0
    assert counter.count("Hello, world!") > 0


def test_token_partial_is_prefix():
    counter = Counter(TOKENS)
    text = "Hello world, this is a test sentence with punctuation!"
    for limit in (1, 3, 5, 100):
        partial = counter.partial(text, limit)
        assert text.startswith(partial)
        assert counter.count(partial) <= max(limit, counter.count(text))
    assert counter.partial(text, 0) == ""
    assert counter.partial(text, -1) == ""
    assert counter.partial("Short", 10) == "Short"


def test_word_partial():
    counter = Counter(WORDS)
    assert counter.partial("one two three four", 2) == "one two"
    assert counter.partial("one two", 10) == "one two"


def test_char_partial_backs_to_word_boundary():
    counter = Counter(CHARS)
    assert counter.partial("hello world extra", 13) == "hello world"
    assert counter.partial("hi", 10) == "hi"


# ---- tfidf exact values (tfidf_test.go / tfidf.go:102-202) -------------------------


def test_tfidf_tokenize():
    assert tfidf_tokenize("") == []
    assert tfidf_tokenize("hello world") == ["hello", "world"]
    assert tfidf_tokenize("hello, world!") == ["hello", "world"]
    assert tfidf_tokenize("Hello World") == ["hello", "world"]
    assert tfidf_tokenize("a an to") == []  # < 3 chars filtered
    assert tfidf_tokenize("well-known co_op") == ["well-known", "co_op"]


def test_tfidf_exact_scores():
    docs = [
        "the quick brown fox jumps over the lazy dog",
        "the brown dog runs quickly",
        "a fox and a dog are animals",
    ]
    corpus = TfidfCorpus(docs)
    assert corpus.total_documents == 3

    # doc0 tokens (len>=3): the quick brown fox jumps over the lazy dog = 9
    # tf(fox, doc0) = 1/9; df(fox)=2; idf = ln(3/2)
    expected_fox = (1 / 9) * math.log(3 / 2)
    # brown: tf 1/9, df 2
    expected_brown = (1 / 9) * math.log(3 / 2)
    assert corpus.score("brown fox", 0) == pytest.approx(
        expected_fox + expected_brown)

    assert corpus.score("elephant", 0) == 0.0
    assert corpus.score("", 0) == 0.0
    assert corpus.score("brown", 10) == 0.0

    # "the" appears in docs 0,1 -> df=2, tf(doc1) = 1/5
    assert corpus.score("the", 1) == pytest.approx((1 / 5) * math.log(3 / 2))


# ---- engine-portable fallback spec --------------------------------------------------


def test_fallback_pattern_is_engine_portable():
    """The fallback pre-tokenizer must stay in the Python-re / Java-regex
    / RE2 common subset so the driver's DuckDB oracle can re-derive the
    count (the n_tokens_fallback column of the token_counts gate query).
    Checked directly against DuckDB here; the Spark side is checked by
    tests/test_entry_oracle.py."""
    import duckdb

    from sift_spark.core.counters import FALLBACK_PATTERN, FallbackTokenizer

    assert "(?!" not in FALLBACK_PATTERN  # no lookahead (RE2)
    assert "(?<" not in FALLBACK_PATTERN  # no lookbehind (RE2)

    tok = FallbackTokenizer()
    con = duckdb.connect()
    pattern_sql = FALLBACK_PATTERN.replace("'", "''")
    cases = [
        "hello world", "it's Tom's   dog", "a_b__c_d", "12345 678 9",
        "line one\nline two\r\nthree", "café naïve",
        "trailing   ", "   leading", "emoji \U0001f44b x  nbsp",
        "supercalifragilisticexpialidocious", "!!!???...", "", "x",
        # \x0b (vertical tab): Python re.ASCII \s includes it, RE2 \s does
        # not -- the pattern uses explicit classes so all engines agree
        "a \x0b b", "\x0b", "x\x0b\x0by", "tab\tvt\x0bff\x0cend",
    ]
    for text in cases:
        assert "".join(tok.encode_spans(text)) == text  # spans partition
        # the count-only fast path must agree with the span list
        assert tok.count(text) == len(tok.encode_spans(text))
        duck = con.sql(
            "SELECT CAST(coalesce(list_sum(list_transform("
            f"regexp_extract_all(?, '{pattern_sql}'), "
            "p -> CASE WHEN length(p) <= 5 THEN 1 "
            "ELSE CAST(ceil(length(p)/4.0) AS BIGINT) END)), 0) AS BIGINT)",
            params=[text],
        ).fetchone()[0]
        assert tok.count(text) == duck, text
    con.close()


def test_char_partial_uses_byte_semantics():
    """The reference slices BYTES in chars mode (chunk_selection.go:
    341-355): 'ééé ééé' at 5 remaining backs up through bytes, not
    runes."""
    from sift_spark.core.counters import CHARS, Counter

    counter = Counter(CHARS)
    # utf-8: 'ééé' = 6 bytes; no space within the first 5 bytes ->
    # no boundary -> byte-slice cut, partial rune dropped
    assert counter.partial("ééé ééé", 5) == "éé"
    # boundary found when the budget reaches past the space (byte 7)
    assert counter.partial("ééé ééé", 8) == "ééé"
    # pure ASCII unchanged
    assert counter.partial("abc def", 5) == "abc"
    assert counter.partial("abcdef", 4) == "abcd"
