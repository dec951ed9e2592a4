"""Unit counters: tokens / words / characters.

Mirrors /root/reference/internal/counter/: WordCounter = strings.Fields
(unicode-whitespace split, empties dropped) -> Python str.split();
CharCounter = UTF-8 rune count -> Python len(str); TokenCounter =
cl100k_base BPE via tiktoken-go.

The cl100k_base merge table (~1.7 MB asset) is not available offline, so
token mode is pluggable (SURVEY.md §7 risk "cl100k_base without
tiktoken"):

  * if the real tiktoken-format vocab file is supplied via
    $SIFT_SPARK_CL100K_PATH, a from-scratch BPE encoder uses it (exact
    parity with the reference's token counts);
  * otherwise a deterministic fallback segmenter applies a cl100k-style
    pre-tokenizer regex (FALLBACK_PATTERN, engine-portable: identical in
    Python re / Java regex / RE2) and splits long pieces every 4
    characters -- stable, order-free, and span-preserving, so
    CreatePartialText semantics (encode, slice, decode = exact prefix of
    the input) hold, and the count is oracle-checked cross-engine by the
    driver gate (the n_tokens_fallback column of the token_counts query).

The reference's own tests never assert exact token counts
(counter_test.go:85-97), only positivity and empty->0.
"""

from __future__ import annotations

import base64
import os
import re

TOKENS = "tokens"
WORDS = "words"
CHARS = "chars"

# Fallback pre-tokenizer: a cl100k-STYLE pattern (contractions, letter
# runs, short digit runs, punct with attached leading space, newline
# handling, whitespace runs) deliberately restricted to the common
# subset of Python re / Java regex / RE2 -- explicit ASCII classes, no
# lookahead, ordered alternation. The SAME pattern string therefore
# tokenizes identically in the Python kernel, in Spark-native
# regexp_extract_all, and in a DuckDB oracle, which is what lets the
# driver gate hash-check the real encoder (the n_tokens_fallback column of the token_counts query).
# Every character is covered by some branch, so the matches partition
# the input (span-preserving: decode(encode[:k]) is an exact prefix).
# whitespace is the EXPLICIT class [ \t\r\n\f], not \s: Python re.ASCII
# \s includes \x0b (vertical tab) but RE2's \s does not, so \s-based
# branches tokenize 'a \x0b b' differently across engines. \x0b now
# consistently falls to the punctuation branch in all three engines.
FALLBACK_PATTERN = (
    r"'(?i:[sdmt]|ll|ve|re)"
    r"|[A-Za-z]+"
    r"|[0-9]{1,3}"
    r"| ?[^ \t\r\n\fA-Za-z0-9]+[\r\n]*"
    r"|[ \t\r\n\f]*[\r\n]"
    r"|[ \t\r\n\f]+"
)
_PRETOKEN_RE = re.compile(FALLBACK_PATTERN, re.ASCII)
_FALLBACK_PIECE = 4  # chars per sub-token for long word pieces


def word_count(text):
    return len(text.split()) if text else 0


def char_count(text):
    return len(text) if text else 0


# ---- token mode -----------------------------------------------------------------


class FallbackTokenizer:
    """Deterministic span tokenizer: cl100k-style pre-tokenization, long
    pieces split into 4-char sub-spans. Spans partition the input, so
    decode(encode(text)[:k]) is an exact prefix."""

    name = "tokens (deterministic-fallback)"

    def encode_spans(self, text):
        spans = []
        pos = 0
        for match in _PRETOKEN_RE.finditer(text):
            start, end = match.span()
            if start > pos:  # unmatched residue (shouldn't happen)
                spans.append(text[pos:start])
            piece = match.group()
            if len(piece) <= _FALLBACK_PIECE + 1:
                spans.append(piece)
            else:
                # leading space stays attached to the first sub-span
                for i in range(0, len(piece), _FALLBACK_PIECE):
                    spans.append(piece[i : i + _FALLBACK_PIECE])
            pos = end
        if pos < len(text):
            spans.append(text[pos:])
        return spans

    def count(self, text):
        """Span count WITHOUT materializing the span substrings --
        counting is the kernel's hottest call (budget loops count every
        chunk), and len(encode_spans(text)) built ~N string slices per
        call just to take len(). Arithmetic over match spans gives the
        identical number (parity property-tested)."""
        if not text:
            return 0
        n = 0
        pos = 0
        for match in _PRETOKEN_RE.finditer(text):
            start, end = match.span()
            if start > pos:  # unmatched residue (shouldn't happen)
                n += 1
            piece_len = end - start
            if piece_len <= _FALLBACK_PIECE + 1:
                n += 1
            else:
                n += -(-piece_len // _FALLBACK_PIECE)  # ceil division
            pos = end
        if pos < len(text):
            n += 1
        return n

    def partial(self, text, max_tokens):
        if max_tokens <= 0 or not text:
            return ""
        spans = self.encode_spans(text)
        if len(spans) <= max_tokens:
            return text
        return "".join(spans[:max_tokens])


class BPETokenizer:
    """From-scratch byte-pair encoder over a tiktoken-format rank file
    (base64-token<space>rank per line). Used when the real cl100k asset is
    available; exact parity with the reference's counter."""

    name = "tokens (cl100k_base)"

    def __init__(self, ranks):
        self.ranks = ranks  # bytes -> rank
        self.decoder = {rank: token for token, rank in ranks.items()}

    @classmethod
    def from_file(cls, path):
        ranks = {}
        with open(path, "rb") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                token_b64, rank = line.split()
                ranks[base64.b64decode(token_b64)] = int(rank)
        return cls(ranks)

    def _bpe(self, piece):
        parts = [piece[i : i + 1] for i in range(len(piece))]
        while len(parts) > 1:
            best_rank = None
            best_idx = -1
            for i in range(len(parts) - 1):
                rank = self.ranks.get(parts[i] + parts[i + 1])
                if rank is not None and (best_rank is None or rank < best_rank):
                    best_rank = rank
                    best_idx = i
            if best_idx < 0:
                break
            parts[best_idx : best_idx + 2] = [
                parts[best_idx] + parts[best_idx + 1]
            ]
        return parts

    def encode(self, text):
        ids = []
        for match in _PRETOKEN_RE.finditer(text):
            piece = match.group().encode("utf-8")
            if piece in self.ranks:
                ids.append(self.ranks[piece])
            else:
                ids.extend(self.ranks.get(p, -1) for p in self._bpe(piece))
        return ids

    def count(self, text):
        return len(self.encode(text)) if text else 0

    def partial(self, text, max_tokens):
        if max_tokens <= 0 or not text:
            return ""
        ids = self.encode(text)
        if len(ids) <= max_tokens:
            return text
        raw = b"".join(self.decoder.get(i, b"") for i in ids[:max_tokens])
        return raw.decode("utf-8", errors="ignore")


_tokenizers = {}  # resolved path (or None) -> tokenizer instance


def get_tokenizer(path=None):
    """Tokenizer for `path` (tiktoken-format rank file), falling back to
    $SIFT_SPARK_CL100K_PATH, then to the deterministic fallback.

    Cached per resolved path: pandas-UDF bodies construct a Counter per
    Arrow batch, and re-parsing a multi-MB vocab per batch would dominate
    the kernel. The explicit `path` parameter exists so Spark plans can
    capture the path DRIVER-side at plan build (closure) instead of
    relying on worker-process env -- worker daemons inherit env from the
    JVM at launch, so env set after session start never reaches them,
    and on a real cluster the env would have to be replicated per node."""
    resolved = None
    for candidate in (path, os.environ.get("SIFT_SPARK_CL100K_PATH")):
        if candidate and os.path.exists(candidate):
            resolved = candidate
            break
    if resolved not in _tokenizers:
        _tokenizers[resolved] = (
            BPETokenizer.from_file(resolved) if resolved
            else FallbackTokenizer()
        )
    return _tokenizers[resolved]


# ---- counter facade ---------------------------------------------------------------


class Counter:
    """Factory facade matching counter.NewCounter (counter.go:58-69)."""

    def __init__(self, method, vocab_path=None):
        if method not in (TOKENS, WORDS, CHARS):
            method = TOKENS
        self.method = method
        self._tok = get_tokenizer(vocab_path) if method == TOKENS else None

    @property
    def name(self):
        if self.method == WORDS:
            return "words"
        if self.method == CHARS:
            return "characters"
        return self._tok.name

    def count(self, text):
        if self.method == WORDS:
            return word_count(text)
        if self.method == CHARS:
            return char_count(text)
        return self._tok.count(text)

    def partial(self, text, remaining_units):
        """createPartialChunk semantics (chunk_selection.go:315-370)."""
        if remaining_units <= 0:
            return ""
        if self.method == WORDS:
            words = text.split()
            if not words:
                return ""
            return " ".join(words[: min(remaining_units, len(words))])
        if self.method == CHARS:
            # the reference indexes BYTES here (Go len()/slicing,
            # chunk_selection.go:341-355), not runes -- mirror that so
            # partial boundaries match on non-ASCII text. The
            # no-boundary branch can split a rune in Go (emitting
            # invalid UTF-8); Python strings cannot hold that, so the
            # split rune is dropped (documented deviation, ASCII
            # behavior identical).
            data = text.encode("utf-8")
            if len(data) <= remaining_units:
                return text
            cutoff = remaining_units
            while 0 < cutoff < len(data) and data[cutoff - 1] != 0x20:
                cutoff -= 1
            if cutoff > 0:
                # boundary is a space byte, so the prefix is whole runes
                return data[:cutoff].decode("utf-8").strip()
            return data[:remaining_units].decode("utf-8", errors="ignore")
        return self._tok.partial(text, remaining_units)
