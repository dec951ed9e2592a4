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
