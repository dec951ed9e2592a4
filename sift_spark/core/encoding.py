"""Charset sniffing for binary HTML (Common-Crawl pages are NOT all
UTF-8).

Simplified WHATWG encoding-sniffing algorithm (public spec,
https://html.spec.whatwg.org/multipage/parsing.html#determining-the-character-encoding):

  1. byte-order mark (UTF-8 / UTF-16 LE / UTF-16 BE)
  2. <meta charset=...> / <meta http-equiv="content-type"
     content="...; charset=..."> scanned ASCII-wise in the first 1024
     bytes
  3. strict UTF-8 attempt
  4. windows-1252 (the WHATWG fallback; supersedes latin-1, decodes any
     byte sequence)

The reference reaches the same behavior through golang.org/x/net/html
charset sniffing inside go-readability
(/root/reference/internal/extract/extract.go:42-56).
"""

from __future__ import annotations

import codecs
import re

_META_RE = re.compile(
    rb"""<meta[^>]+?(?:
        charset\s*=\s*["']?\s*([a-zA-Z0-9_.:-]+)
      | content\s*=\s*["'][^"'>]*charset\s*=\s*([a-zA-Z0-9_.:-]+)
    )""",
    re.I | re.X,
)

# WHATWG maps these labels to windows-1252 (its superset)
_WIN1252_LABELS = frozenset((
    "latin1", "latin-1", "latin_1", "iso-8859-1", "iso8859-1",
    "iso_8859-1", "ascii", "us-ascii", "windows-1252", "cp1252",
))


def sniff_encoding(raw):
    """Declared/BOM encoding name, or None when undeclared."""
    if raw.startswith(codecs.BOM_UTF8):
        return "utf-8-sig"
    if raw.startswith(codecs.BOM_UTF16_LE):
        return "utf-16-le"
    if raw.startswith(codecs.BOM_UTF16_BE):
        return "utf-16-be"
    match = _META_RE.search(raw[:1024])
    if match:
        label = (match.group(1) or match.group(2)).decode("ascii").lower()
        if label in _WIN1252_LABELS:
            return "windows-1252"
        if label in ("utf-16", "utf-16le", "utf-16be", "utf16", "unicode"):
            # WHATWG: a meta-declared UTF-16 label is remapped to UTF-8 --
            # the declaration was found by an ASCII scan, so the stream
            # cannot actually be UTF-16 (mislabeled pages are common)
            return "utf-8"
        try:
            codecs.lookup(label)
            return label
        except LookupError:
            return None  # unknown label: fall through to content sniff
    return None


def decode_html(raw):
    """bytes -> str via the sniffing cascade (never raises)."""
    raw = bytes(raw)
    declared = sniff_encoding(raw)
    if declared:
        # BOM encodings skip the marker via the codec itself (utf-8-sig)
        # or need it stripped (utf-16-le/be keep data after 2 bytes)
        if declared in ("utf-16-le", "utf-16-be"):
            raw = raw[2:]
        try:
            return raw.decode(declared, errors="replace")
        except LookupError:  # pragma: no cover - filtered in sniff
            pass
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("windows-1252", errors="replace")
