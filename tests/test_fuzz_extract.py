"""Crash-robustness fuzz: the extraction kernel must NEVER raise on
arbitrary input -- on a 100 TB crawl a single raising document kills a
task and, after retries, the job. Errors must flow to the error column."""

from hypothesis import given, settings
from hypothesis import strategies as st

from sift_spark.core.counters import WORDS
from sift_spark.core.pipeline import SiftParams, run_sift

PARAMS = [
    SiftParams(counting_method=WORDS, max_units=20),
    SiftParams(counting_method=WORDS, max_units=0, search_query="data"),
    SiftParams(selector="p"),
    SiftParams(include_all=True, max_units=15, counting_method=WORDS),
]

html_ish = st.text(
    alphabet=st.sampled_from(
        list("<>/=\"' abcdefghij&#;!-\n\tpdivspanbr0123ARTICLEé中")
    ),
    max_size=300,
)


@given(html_ish)
@settings(max_examples=500, deadline=None)
def test_never_raises_on_garbage(html):
    for params in PARAMS:
        text, error = run_sift(html, params)
        assert text is not None or error is not None
        assert isinstance(text, str)


@given(st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_never_raises_on_binary(raw):
    from sift_spark.operators.extract import _run_one
    from sift_spark.core.counters import Counter

    counter = Counter(WORDS)
    for params in PARAMS:
        text, error, n_chunks, n_units = _run_one(bytes(raw), params, counter)
        assert error is None or isinstance(error, str)


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_unicode_robustness(html):
    text, error = run_sift(html, SiftParams(counting_method=WORDS,
                                            max_units=10))
    assert isinstance(text, str)
