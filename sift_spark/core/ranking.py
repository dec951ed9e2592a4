"""Lexical ranking: field-weighted BM25 (bm25md-style) and TF-IDF.

TF-IDF follows /root/reference/internal/tfidf/tfidf.go EXACTLY (tokenize:
lowercase, split on [^a-zA-Z0-9_-]+, keep length >= 3; tf = relative
frequency; idf = ln(N/df); score = sum tf*idf over query terms) -- it is
fully specified in-repo and anchors exact-value tests.

BM25 follows the BM25F form of SURVEY.md Appendix A.3. The reference
delegates to the external chriscorrea/bm25md package
(/root/reference/internal/app/sift.go:269-293) whose exact constants are
not vendored; k1/b/field weights here are conventional defaults and are
explicitly configuration, not parity surface (the reference asserts no
exact BM25 scores anywhere in its tests).
"""

from __future__ import annotations

import math
import re

_TFIDF_SPLIT_RE = re.compile(r"[^a-zA-Z0-9_-]+")

K1 = 1.2
B = 0.75
FIELD_WEIGHTS = {
    "h1": 2.0, "h2": 1.8, "h3": 1.6, "h4": 1.4, "h5": 1.3, "h6": 1.2,
    "bold": 1.4, "italic": 1.1, "code": 0.9, "body": 1.0,
}

_MD_HEADER_RE = re.compile(r"^(#{1,6})\s+(.*)$")
_MD_BOLD_RE = re.compile(r"\*\*([^*]+)\*\*")
_MD_ITALIC_RE = re.compile(r"(?<!\*)\*([^*\s][^*]*)\*(?!\*)")
_MD_CODE_RE = re.compile(r"`([^`]+)`")


def tfidf_tokenize(text):
    """tfidf.go:151-172."""
    if not text:
        return []
    return [t for t in _TFIDF_SPLIT_RE.split(text.lower()) if len(t.strip()) >= 3]


def parse_markdown_fields(chunk_text):
    """Split a markdown chunk into per-field term bags
    (bm25md MarkdownFieldParser equivalent; fields per
    context_calculator.go:177-226). Tokens are assigned to the most
    specific field; remaining prose goes to body.
    Returns {field: [tokens...]}."""
    fields = {}

    def add(field, text):
        tokens = tfidf_tokenize(text)
        if tokens:
            fields.setdefault(field, []).extend(tokens)

    remainder_lines = []
    for line in chunk_text.split("\n"):
        header = _MD_HEADER_RE.match(line.strip())
        if header:
            add(f"h{min(len(header.group(1)), 6)}", header.group(2))
        else:
            remainder_lines.append(line)
    remainder = "\n".join(remainder_lines)

    for pattern, field in (
        (_MD_CODE_RE, "code"),
        (_MD_BOLD_RE, "bold"),
        (_MD_ITALIC_RE, "italic"),
    ):
        for match in pattern.finditer(remainder):
            add(field, match.group(1))
        remainder = pattern.sub(" ", remainder)

    add("body", remainder)
    return fields


class BM25Corpus:
    """Per-request corpus over one document's chunks (sift.go:255-301)."""

    def __init__(self, chunks, k1=K1, b=B, field_weights=None):
        self.k1 = k1
        self.b = b
        self.weights = field_weights or FIELD_WEIGHTS
        self.docs = []  # list of {field: {term: tf}}
        self.doc_lens = []
        df = {}
        for chunk in chunks:
            fields = parse_markdown_fields(chunk)
            term_counts = {}
            total = 0
            for field, tokens in fields.items():
                bag = {}
                for token in tokens:
                    bag[token] = bag.get(token, 0) + 1
                    total += 1
                term_counts[field] = bag
            self.docs.append(term_counts)
            self.doc_lens.append(total)
            seen = {t for bag in term_counts.values() for t in bag}
            for term in seen:
                df[term] = df.get(term, 0) + 1
        self.df = df
        self.n_docs = len(chunks)
        self.avgdl = (sum(self.doc_lens) / self.n_docs) if self.n_docs else 0.0

    def idf(self, term):
        df = self.df.get(term, 0)
        if df == 0:
            return 0.0
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def score(self, query, doc_index):
        if not (0 <= doc_index < self.n_docs):
            return 0.0
        terms = tfidf_tokenize(query)
        if not terms:
            return 0.0
        doc = self.docs[doc_index]
        dl = self.doc_lens[doc_index]
        avgdl = self.avgdl or 1.0
        total = 0.0
        for term in terms:
            wtf = 0.0
            for field, bag in doc.items():
                tf = bag.get(term, 0)
                if tf:
                    wtf += self.weights.get(field, 1.0) * tf
            if wtf == 0.0:
                continue
            denom = self.k1 * (1.0 - self.b + self.b * dl / avgdl) + wtf
            total += self.idf(term) * wtf * (self.k1 + 1.0) / denom
        return total


class TfidfCorpus:
    """Exact counterpart of tfidf.Corpus (tfidf.go:49-202)."""

    def __init__(self, documents):
        self.documents = list(documents)
        self.term_frequencies = []
        self.doc_frequencies = {}
        self.total_documents = len(self.documents)
        for doc in self.documents:
            tokens = tfidf_tokenize(doc)
            self.term_frequencies.append(_term_frequency(tokens))
            for term in set(tokens):
                self.doc_frequencies[term] = self.doc_frequencies.get(term, 0) + 1

    def score(self, query, doc_index):
        if not (0 <= doc_index < self.total_documents):
            return 0.0
        query_terms = tfidf_tokenize(query)
        if not query_terms:
            return 0.0
        doc_tf = self.term_frequencies[doc_index]
        total = 0.0
        for term in query_terms:
            tf = doc_tf.get(term, 0.0)
            if tf == 0.0:
                continue
            df = self.doc_frequencies.get(term, 0)
            if df == 0:
                continue
            total += tf * math.log(self.total_documents / df)
        return total


def _term_frequency(tokens):
    """tf as relative frequency (tfidf.go:184-202)."""
    if not tokens:
        return {}
    counts = {}
    for token in tokens:
        counts[token] = counts.get(token, 0) + 1
    total = float(len(tokens))
    return {term: count / total for term, count in counts.items()}


def lexical_search(chunks, query):
    """Score all chunks and sort by score desc (sift.go:255-301).

    Go's sort.Slice is not stable; ties keep *some* order. We sort stably
    by (-score, index) which matches Go's observable behavior on the
    reference's test data and is deterministic across partitions."""
    corpus = BM25Corpus(chunks)
    scored = [(chunk, corpus.score(query, i), i) for i, chunk in enumerate(chunks)]
    scored.sort(key=lambda item: (-item[1], item[2]))
    return scored
