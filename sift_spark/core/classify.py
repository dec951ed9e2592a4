"""Extraneous-content classifier: stopword ratio + positional threshold.

Semantics from /root/reference/internal/classify/classify.go:20-166:
tokenize ASCII-alpha words, lowercase, Porter2-stem, count hits against the
43-entry stemmed stopword set, compare the ratio against a
position-adjusted threshold (inverted-V: 0.10 at document edges -> 0.33 in
the middle; flat 0.5 for docs of <= 3 chunks; 0.33 for invalid inputs).

The threshold math is exposed separately (`threshold`) because the Spark
relational path computes it as pure column arithmetic
(SURVEY.md §2.3), while `is_extraneous` is the UDF-side scalar form.
"""

from __future__ import annotations

import re

from .stemmer import stem

# stemmed stopwords indicating publishing/navigation/legal/reference
# boilerplate (classify.go:20-71)
EXTRANEOUS_STOPWORDS = frozenset(
    """author appendix book chapter content edit ebook footer glossari
    gutenberg navig note page project publish text
    about locat profil share updat
    copyright manag permiss polici privaci public purpos reproduc reserv
    right risk standard term use
    citat depart edu feder foundat https isbn refer""".split()
)

# re.ASCII pins \b to ASCII word chars, matching the Go reference's RE2
# semantics (classify.go): without it, Python's Unicode \b extracts no
# token from 'café' while RE2 extracts 'caf' -- divergent stopword
# ratios on non-ASCII text
_TOKEN_RE = re.compile(r"\b[a-zA-Z]+\b", re.ASCII)


def tokenize(text):
    return _TOKEN_RE.findall(text.lower())


def stopword_ratio(text):
    """(ratio, n_tokens); ratio 0.0 when no tokens."""
    tokens = tokenize(text)
    if not tokens:
        return 0.0, 0
    hits = sum(1 for token in tokens if stem(token) in EXTRANEOUS_STOPWORDS)
    return hits / len(tokens), len(tokens)


def threshold(chunk_index, total_chunks):
    """Position-adjusted threshold (classify.go:139-166)."""
    if total_chunks <= 0:
        return 0.33
    if chunk_index < 0 or chunk_index >= total_chunks:
        return 0.33
    if total_chunks <= 3:
        return 0.5
    relative_position = chunk_index / (total_chunks - 1)
    position_factor = 1.0 - abs(2.0 * relative_position - 1.0)
    return 0.1 + (0.33 - 0.1) * position_factor


def is_extraneous(chunk_text, chunk_index, total_chunks):
    if total_chunks <= 0 or chunk_index < 0 or chunk_index >= total_chunks:
        return False
    ratio, n_tokens = stopword_ratio(chunk_text)
    if n_tokens == 0:
        return True  # empty chunks are extraneous (classify.go:104-107)
    return ratio > threshold(chunk_index, total_chunks)
