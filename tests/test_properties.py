"""Property-based invariants (hypothesis) for the core kernels."""

from hypothesis import given, settings
from hypothesis import strategies as st

from sift_spark.core.chunker import split_text
from sift_spark.core.classify import threshold
from sift_spark.core.counters import WORDS
from sift_spark.core.pipeline import apply_simple_size_limit
from sift_spark.core.selection import remove_overlap_prefix
from sift_spark.core.stemmer import stem

text_strategy = st.text(
    alphabet=st.sampled_from(
        list("abcdefghijklmnopqrstuvwxyz ABCDEFG.!?\n\t,-'")
    ),
    max_size=400,
)

# words that contain letters: the reference's delimiter-restoration
# legitimately drops delimiter-only "words" like a bare "?" (empty split
# parts are skipped, chunk.go:137-181), so conservation only holds for
# real words
word_text_strategy = st.lists(
    st.from_regex(r"[a-zA-Z]{1,8}[.!?,]{0,2}", fullmatch=True),
    min_size=0, max_size=60,
).flatmap(
    lambda words: st.lists(
        st.sampled_from([" ", "  ", "\n", "\n\n", "\t "]),
        min_size=max(len(words) - 1, 0), max_size=max(len(words) - 1, 0),
    ).map(
        lambda seps: "".join(
            w + (seps[i] if i < len(seps) else "")
            for i, w in enumerate(words)
        )
    )
)


@given(word_text_strategy, st.integers(min_value=1, max_value=120))
@settings(max_examples=200, deadline=None)
def test_split_text_conserves_words(text, max_size):
    chunks = split_text(text, max_size)
    original_words = text.split()
    result_words = [w for chunk in chunks for w in chunk.split()]
    # multiset conservation (the reference's own guarantee,
    # chunk_test.go:394-403: word-count equality). Document order can be
    # violated by the wave algorithm itself when an early chunk stays
    # oversized while a later one already fits -- faithful to the Go.
    assert sorted(result_words) == sorted(original_words)
    for chunk in chunks:
        assert chunk.strip() != ""
        if len(chunk.encode()) > max_size:
            assert len(chunk.split()) == 1  # only oversized single words


@given(text_strategy, st.integers(min_value=1, max_value=50))
@settings(max_examples=200, deadline=None)
def test_simple_size_limit_is_prefix_and_bounded(text, max_units):
    result = apply_simple_size_limit(text, max_units, WORDS)
    # result is a prefix of the input modulo trailing-whitespace trim
    assert text.startswith(result) or text.rstrip(" \t\n\r").startswith(result)
    assert len(result.split()) <= max_units


@given(st.lists(st.text(alphabet="abcdef ", min_size=1, max_size=30),
                min_size=1, max_size=8),
       st.lists(st.text(alphabet="abcdef ", min_size=1, max_size=30),
                min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_overlap_prefix_result_is_word_suffix(current, previous):
    cur = " ".join(current)
    prev = " ".join(previous)
    result = remove_overlap_prefix(cur, prev)
    cur_words = cur.split()
    res_words = result.split()
    assert res_words == cur_words[len(cur_words) - len(res_words):]


@given(st.integers(min_value=-5, max_value=50),
       st.integers(min_value=-5, max_value=50))
@settings(max_examples=300, deadline=None)
def test_threshold_bounds(idx, total):
    value = threshold(idx, total)
    assert 0.1 - 1e-12 <= value <= 0.5 + 1e-12


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz'", min_size=1,
               max_size=20))
@settings(max_examples=300, deadline=None)
def test_stem_output_sane(word):
    result = stem(word)
    assert isinstance(result, str)
    assert len(result) <= len(word) + 1  # at most one char added ('e')
    assert result == result.lower()


@given(st.text(max_size=400))
@settings(max_examples=300, deadline=None)
def test_fallback_tokenizer_spans_partition_any_text(text):
    """The fallback tokenizer's spans must partition EVERY input exactly
    (decode(encode[:k]) is a strict prefix -- the invariant
    CreatePartialText budgeting depends on), and the count must be
    positive iff the text is non-empty."""
    from sift_spark.core.counters import FallbackTokenizer

    tok = FallbackTokenizer()
    spans = tok.encode_spans(text)
    assert "".join(spans) == text
    assert all(spans), "no empty spans"
    assert tok.count(text) == len(spans) if text else tok.count(text) == 0
    if spans:
        prefix = tok.partial(text, max(1, len(spans) // 2))
        assert text.startswith(prefix)
