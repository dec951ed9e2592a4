"""Golden byte-freeze: full output bytes per (fixture url, params).

Per FIXTURES.md §4: after the assertion-parity tests go green, the full
output bytes are frozen here (tests/golden/extraction.json) and every
later run must reproduce them EXACTLY -- this guards regressions and the
byte-stability half of the scaling requirement. The file is generated on
first run (pure core kernel, no Spark) and committed.
"""

import json
import os

import pytest

from sift_spark.core.counters import CHARS, TOKENS, WORDS
from sift_spark.core.pipeline import SiftParams, run_sift
from sift_spark.sources.fixtures import big_page_html, fixture_rows

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "extraction.json")

PARAM_GRID = {
    "default": SiftParams(),  # tokens/2500 (fallback tokenizer), beginning
    "words50": SiftParams(counting_method=WORDS, max_units=50),
    "chars200": SiftParams(counting_method=CHARS, max_units=200),
    "middle30": SiftParams(counting_method=WORDS, max_units=30,
                           strategy="middle"),
    "end30": SiftParams(counting_method=WORDS, max_units=30, strategy="end"),
    "include_all": SiftParams(counting_method=WORDS, max_units=0,
                              include_all=True),
    "search": SiftParams(counting_method=WORDS, max_units=0,
                         search_query="sifting flour"),
    "search_budget": SiftParams(counting_method=WORDS, max_units=40,
                                search_query="sifting flour"),
    "smart_context": SiftParams(counting_method=WORDS, max_units=0,
                                search_query="sifting flour",
                                context_units=30, use_smart_context=True),
    "selector_p": SiftParams(selector="p", counting_method=WORDS,
                             max_units=0),
    "tokens120": SiftParams(counting_method=TOKENS, max_units=120),
}


def _corpus():
    docs = [(url, bytes(html).decode("utf-8"))
            for url, _ts, html, _t, _l in fixture_rows()]
    docs += [(f"synthetic://big-{k}", big_page_html(k)) for k in range(4)]
    return docs


def _generate():
    golden = {}
    for url, html in _corpus():
        for param_name, params in PARAM_GRID.items():
            text, error = run_sift(html, params)
            golden[f"{url}|{param_name}"] = {
                "text": text, "error": error,
            }
    return golden


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN_PATH):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as fh:
            json.dump(_generate(), fh, indent=1, sort_keys=True)
    with open(GOLDEN_PATH) as fh:
        return json.load(fh)


def test_golden_bytes(golden):
    generated = _generate()
    assert set(generated) == set(golden)
    for key, expected in golden.items():
        got = generated[key]
        assert got["error"] == expected["error"], key
        assert got["text"] == expected["text"], (
            f"byte drift at {key}: {got['text']!r} != {expected['text']!r}"
        )


def test_golden_covers_grid(golden):
    urls = {key.split("|")[0] for key in golden}
    assert "fixture://simple" in urls and "synthetic://big-0" in urls
    assert len(golden) == len(_corpus()) * len(PARAM_GRID)
