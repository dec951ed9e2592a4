"""Classifier parity: ports of classify_test.go verdict tables."""

import pytest

from sift_spark.core.classify import is_extraneous, threshold

VERDICTS = [
    ("empty chunk", "", 0, 1, True),
    ("whitespace only", "   \n\t  ", 0, 1, True),
    ("copyright footer at end",
     "Copyright 2026. All rights reserved. This text may not be reproduced "
     "without permission.", 9, 10, True),
    ("navigation header at beginning",
     "Home About Profile Share Content Navigation Footer", 0, 10, True),
    ("main content in middle",
     "The carrot cake recipe requires sifting flour through a fine mesh sieve "
     "to achieve the perfect texture. This traditional baking technique "
     "removes lumps and aerates the flour, ensuring a light and fluffy cake.",
     5, 10, False),
    ("mixed content moderate stopwords",
     "The baker carefully sifted confectioner sugar for the icing. The page "
     "contained detailed instructions for this important step in carrot cake "
     "preparation.", 3, 8, False),
    ("isbn publishing info",
     "ISBN 479-04550 Published by Publications Department of Federal "
     "Publishing Standards", 0, 5, True),
    ("single chunk document",
     "This is the complete content of a very short document about sifting "
     "flour for baking.", 0, 1, False),
    ("academic appendix",
     "Appendix A: Figure 1 References: Lorem Ipsum Foundation Publications, "
     "2023.", 7, 8, True),
]


@pytest.mark.parametrize("name,text,idx,total,expected",
                         VERDICTS, ids=[v[0] for v in VERDICTS])
def test_is_extraneous(name, text, idx, total, expected):
    assert is_extraneous(text, idx, total) is expected


def test_position_sensitivity():
    """Same text extraneous at edges, kept in middle
    (classify_test.go:112-166)."""
    text = ("Hello there! This is some valid text that contains a bit of "
            "publishing terminology copyright 2025")
    assert is_extraneous(text, 0, 10) is True
    assert is_extraneous(text, 9, 10) is True
    assert is_extraneous(text, 5, 10) is False


EDGE_CASES = [
    ("zero total", "some text", 0, 0, False),
    ("negative index", "some text", -1, 5, False),
    ("index beyond total", "some text", 10, 5, False),
    ("long text no stopwords",
     "Lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
     "tempor incididunt ut labore et dolore magna aliqua ut enim ad minim "
     "veniam quis nostrud exercitation ullamco laboris nisi ut aliquip ex ea "
     "commodo consequat duis aute irure dolor in reprehenderit in voluptate "
     "velit esse cillum dolore eu fugiat nulla pariatur", 2, 5, False),
]


@pytest.mark.parametrize("name,text,idx,total,expected",
                         EDGE_CASES, ids=[e[0] for e in EDGE_CASES])
def test_edge_cases(name, text, idx, total, expected):
    assert is_extraneous(text, idx, total) is expected


def test_threshold_curve():
    """Inverted-V interpolation (classify.go:139-166)."""
    assert threshold(0, 0) == 0.33
    assert threshold(-1, 5) == 0.33
    assert threshold(5, 5) == 0.33
    assert threshold(0, 3) == 0.5
    assert threshold(0, 10) == pytest.approx(0.1)
    assert threshold(9, 10) == pytest.approx(0.1)
    mid = threshold(5, 11)  # exact middle of 11 chunks
    assert mid == pytest.approx(0.33)
    assert threshold(2, 10) > threshold(1, 10) > threshold(0, 10)


def test_tokenize_ascii_boundary_parity():
    """RE2 \\b is ASCII-only: 'café' must tokenize to ['caf'] exactly as
    the Go reference does, not to [] (Python Unicode \\b)."""
    from sift_spark.core.classify import tokenize

    assert tokenize("café") == ["caf"]
    assert tokenize("naïve test") == ["na", "ve", "test"]
