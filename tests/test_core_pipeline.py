"""Single-document pipeline parity: ports of sift_test.go plus
simple-size-limit behavior (sift.go:305-372)."""

from sift_spark.core.counters import WORDS
from sift_spark.core.pipeline import (
    SiftParams,
    apply_content_transformations,
    apply_simple_size_limit,
    combine_documents,
    run_sift,
)
from sift_spark.core.selection import BEGINNING, MIDDLE
from tests.fixtures import COMPOSITE_DOC, SIMPLE_HTML


def test_simple_size_limit_word_mode():
    text = "sugar " * 100
    result = apply_simple_size_limit(text, 50, WORDS)
    assert len(result.split()) == 50
    assert result == ("sugar " * 50).rstrip()


def test_simple_size_limit_preserves_formatting():
    text = "line one\n\nline two\nline three"
    result = apply_simple_size_limit(text, 4, WORDS)
    assert result == "line one\n\nline two"


def test_simple_size_limit_no_limit():
    assert apply_simple_size_limit("anything here", 0, WORDS) == "anything here"


def test_word_limit_enforced_through_transformations():
    text = "sugar " * 100
    for include_all in (False, True):
        params = SiftParams(counting_method=WORDS, max_units=50,
                            strategy=MIDDLE, include_all=include_all)
        result = apply_content_transformations(text, params)
        assert len(result.split()) <= 50
        assert result != ""


def test_empty_text_transformations():
    params = SiftParams(counting_method=WORDS, max_units=50)
    assert apply_content_transformations("", params) == ""


def test_include_all_bypasses_filtering():
    """sift_test.go:115-208: classifier drops boilerplate unless
    include_all."""
    base = dict(counting_method=WORDS, max_units=1000, strategy=BEGINNING)

    filtered = apply_content_transformations(
        COMPOSITE_DOC, SiftParams(include_all=False, **base))
    unfiltered = apply_content_transformations(
        COMPOSITE_DOC, SiftParams(include_all=True, **base))

    for marker, in_filtered, in_unfiltered in [
        ("Copyright 2025", False, True),
        ("Home About Profile", False, True),
        ("ISBN 04550", False, True),
        ("References:", False, True),
    ]:
        assert (marker in filtered) is in_filtered, marker
        assert (marker in unfiltered) is in_unfiltered, marker

    for text in (filtered, unfiltered):
        assert "carrot cake recipe" in text
        assert "sifting flour" in text


def test_run_sift_end_to_end():
    params = SiftParams(counting_method=WORDS, max_units=20)
    result, error = run_sift(SIMPLE_HTML, params)
    assert error is None
    assert "Main Article Title" in result
    assert len(result.split()) <= 20


def test_run_sift_selector_error():
    result, error = run_sift(SIMPLE_HTML, SiftParams(selector=".missing"))
    assert error is not None and result == ""


def test_run_sift_search():
    params = SiftParams(counting_method=WORDS, max_units=0,
                        search_query="important information")
    result, error = run_sift(SIMPLE_HTML, params)
    assert error is None
    assert "important information" in result


def test_combine_documents():
    assert combine_documents(["a", "", "b", None, "c"]) == "a\n\nb\n\nc"
    assert combine_documents([]) == ""
