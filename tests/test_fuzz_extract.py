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
    SiftParams(selector="*|p, svg|title"),
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


@given(st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_warc_parse_never_raises_on_garbage(raw):
    """Crawl segments arrive corrupted; the WARC parse must convert any
    framing damage into an error row, never a task-killing exception --
    including truncated gzip members (the b'\\x1f\\x8b' prefix path)."""
    import gzip

    from sift_spark.sources.warc import iter_warc_pages

    # valid gzip magic+method header followed by garbage deflate bytes
    # raises zlib.error from the reader, not OSError -- the case the
    # round-5 review caught
    bad_deflate = bytes([0x1F, 0x8B, 0x08, 0, 0, 0, 0, 0, 0, 255]) + raw
    for data in (raw, b"\x1f\x8b" + raw, gzip.compress(raw)[:-3],
                 bad_deflate):
        for page in iter_warc_pages(data, "fuzz"):
            assert page["error"] is None or isinstance(page["error"], str)


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_unicode_robustness(html):
    text, error = run_sift(html, SiftParams(counting_method=WORDS,
                                            max_units=10))
    assert isinstance(text, str)


@given(html_ish)
@settings(max_examples=150, deadline=None)
def test_density_tables_match_naive_walk(html):
    """The one-pass link-density tables must agree with the naive
    per-node subtree walk on EVERY node of arbitrary trees (including
    nested <a>, script/style exclusion, text-only fragments)."""
    from sift_spark.core import htmlparser
    from sift_spark.core.readability import _density_tables, _link_density

    root = htmlparser.parse(html)
    tables = _density_tables(root)
    for node in root.iter_elements():
        assert _link_density(node, tables) == _link_density(node), html


def test_density_tables_nested_anchor_semantics():
    """Nested <a> double-counts in the naive find_all sum; the tables
    must reproduce that exactly (plus script/style exclusion)."""
    from sift_spark.core import htmlparser
    from sift_spark.core.readability import _density_tables, _link_density

    html = ('<html><body><div id="x">plain text '
            '<a href="/">outer <a href="/in">inner</a> tail</a>'
            '<script>var x = "ignored";</script>'
            '<p>para <a href="/p">link</a></p></div></body></html>')
    root = htmlparser.parse(html)
    tables = _density_tables(root)
    checked = 0
    for node in root.iter_elements():
        assert _link_density(node, tables) == _link_density(node), node.tag
        checked += 1
    assert checked >= 6
    div = [n for n in root.iter_elements() if n.attr("id") == "x"][0]
    assert 0.0 < _link_density(div, tables) <= 1.0
