"""Iterative strategy-based text chunking.

Semantics match the reference's chunk package
(/root/reference/internal/chunk/chunk.go:35-342): waves of splitting
strategies ordered from largest semantic unit to smallest (paragraph ->
sentence -> question -> exclamation -> line -> word), delimiter
restoration, word packing, and short-segment merging (min size =
max(3, 25% of max), chunk.go:244-251). Sizing uses UTF-8 BYTE length,
matching Go `len(string)`; Python `len(str)` counts runes, so multibyte
inputs would otherwise split differently (chunk_test.go:346-353
exercises unicode sizing).
"""

from __future__ import annotations

STRATEGIES = (
    ("paragraph", "\n\n"),
    ("sentence", ". "),
    ("sentence-question", "? "),
    ("sentence-exclamation", "! "),
    ("line", "\n"),
    ("word", " "),
)

_SENTENCE_SUFFIX = {
    "sentence": ".",
    "sentence-question": "?",
    "sentence-exclamation": "!",
}


def _blen(text):
    """Byte length (Go len semantics). ASCII fast path: rune count ==
    byte count, and str.isascii() is a C-speed scan while encode()
    allocates a bytes copy -- this function runs per segment in the
    chunk cascade, the extraction kernel's hottest loop."""
    if text.isascii():
        return len(text)
    return len(text.encode("utf-8", "surrogatepass"))


def trim_spaces_only(text):
    return text.strip(" \t")


def split_text(text, max_chunk_size):
    """Break text into chunks of at most max_chunk_size bytes (except
    single oversized words, preserved intact)."""
    if max_chunk_size <= 0:
        return []
    if text.strip() == "":
        return []
    text = trim_spaces_only(text)
    if _blen(text) <= max_chunk_size:
        return [text]

    final_chunks = []
    to_process = [text]

    for name, delimiter in STRATEGIES:
        if not to_process:
            break
        next_queue = []
        for chunk in to_process:
            if _blen(chunk) <= max_chunk_size:
                final_chunks.append(chunk)
                continue
            for sub in _split_by_delimiter(chunk, delimiter, name, max_chunk_size):
                trimmed = trim_spaces_only(sub)
                if trimmed:
                    next_queue.append(trimmed)
        to_process = next_queue

    for chunk in to_process:
        trimmed = trim_spaces_only(chunk)
        if trimmed:
            final_chunks.append(trimmed)

    return final_chunks


def _split_by_delimiter(text, delimiter, name, max_chunk_size):
    if delimiter not in text:
        return [text]
    parts = text.split(delimiter)

    segments = []
    if name in _SENTENCE_SUFFIX:
        suffix = _SENTENCE_SUFFIX[name]
        last = len(parts) - 1
        for i, part in enumerate(parts):
            trimmed = trim_spaces_only(part)
            if trimmed == "":
                continue
            segments.append(trimmed + suffix if i < last else trimmed)
    elif name == "line":
        last = len(parts) - 1
        for i, part in enumerate(parts):
            trimmed = trim_spaces_only(part)
            if trimmed:
                segments.append(trimmed + "\n" if i < last else trimmed)
    elif name == "paragraph":
        last = len(parts) - 1
        for i, part in enumerate(parts):
            trimmed = trim_spaces_only(part)
            if trimmed:
                segments.append(trimmed + "\n\n" if i < last else trimmed)
    else:  # word
        for part in parts:
            trimmed = trim_spaces_only(part)
            if trimmed:
                segments.append(trimmed)

    min_chunk_size = _minimum_chunk_size(max_chunk_size)
    return _pack_segments(segments, name, max_chunk_size, min_chunk_size)


def _minimum_chunk_size(max_chunk_size):
    return max(3, int(max_chunk_size * 0.25))


def _pack_segments(segments, name, max_chunk_size, min_chunk_size):
    if not segments:
        return []
    if name == "word":
        return _pack_words(segments, max_chunk_size)
    return _merge_short_segments(segments, max_chunk_size, min_chunk_size)


def _pack_words(segments, max_chunk_size):
    result = []
    current = []
    current_len = 0
    for segment in segments:
        blen = _blen(segment)
        needed = blen + (1 if current else 0)
        if current and current_len + needed > max_chunk_size:
            packed = trim_spaces_only(" ".join(current))
            if packed:
                result.append(packed)
            current = []
            current_len = 0
        if current:
            current_len += 1
        current.append(segment)
        current_len += blen
    if current:
        packed = trim_spaces_only(" ".join(current))
        if packed:
            result.append(packed)
    return result


def _merge_short_segments(segments, max_chunk_size, min_chunk_size):
    """Merge segments below min_chunk_size with neighbors
    (chunk.go:289-342): try next first, then previous, else keep."""
    if len(segments) <= 1:
        return segments
    segments = list(segments)
    result = []
    i = 0
    while i < len(segments):
        current = segments[i]
        if _blen(current) >= min_chunk_size:
            result.append(current)
            i += 1
            continue
        if i + 1 < len(segments):
            combined = current + " " + segments[i + 1]
            if _blen(combined) <= max_chunk_size:
                segments[i + 1] = combined
                i += 1
                continue
        if result:
            combined = result[-1] + " " + current
            if _blen(combined) <= max_chunk_size:
                result[-1] = combined
                i += 1
                continue
        result.append(current)
        i += 1
    return result
