"""Charset sniffing (core/encoding.py): BOMs, meta declarations,
UTF-8-first content sniff, windows-1252 fallback -- Common-Crawl pages
are not all UTF-8 and the reference decodes them via x/net/html charset
sniffing inside go-readability."""

import codecs

import pytest

from sift_spark.core.encoding import decode_html, sniff_encoding

CAFE = "café résumé"


@pytest.mark.parametrize("raw,expected", [
    (CAFE.encode("utf-8"), CAFE),                       # plain utf-8
    (codecs.BOM_UTF8 + CAFE.encode("utf-8"), CAFE),     # BOM stripped
    (codecs.BOM_UTF16_LE + CAFE.encode("utf-16-le"), CAFE),
    (codecs.BOM_UTF16_BE + CAFE.encode("utf-16-be"), CAFE),
    # declared charsets
    (b'<html><head><meta charset="iso-8859-1"></head><body>'
     + CAFE.encode("latin-1") + b"</body></html>", CAFE),
    (b'<meta http-equiv="Content-Type" '
     b'content="text/html; charset=windows-1252">'
     + "sm’art €uro".encode("windows-1252"),
     "sm’art €uro"),
    (b'<META CHARSET=GBK>' + "中文页面".encode("gbk"),
     "中文页面"),
    (b"<meta charset='shift_jis'>" + "日本語".encode("shift_jis"),
     "日本語"),
])
def test_declared_and_bom_decodes(raw, expected):
    assert expected in decode_html(raw)


def test_undeclared_latin1_falls_back_to_win1252():
    raw = b"<html><body>caf\xe9 \x93quoted\x94</body></html>"
    text = decode_html(raw)
    assert "café" in text
    assert "“quoted”" in text  # win-1252 smart quotes, not latin-1 C1


def test_unknown_label_falls_through_to_content_sniff():
    raw = b'<meta charset="no-such-enc">' + CAFE.encode("utf-8")
    assert sniff_encoding(raw) is None
    assert CAFE in decode_html(raw)


def test_utf8_strict_wins_when_undeclared():
    assert decode_html(CAFE.encode("utf-8")) == CAFE


def test_never_raises_on_garbage():
    assert isinstance(decode_html(bytes(range(256)) * 4), str)


def test_spark_extraction_decodes_declared_latin1(spark):
    from sift_spark.core.pipeline import SiftParams
    from sift_spark.operators.extract import extract_pages

    body = "le café du coin est ouvert toute la journée."
    html = ('<html><head><meta charset="iso-8859-1"></head><body><div><p>'
            + body * 3 + "</p></div></body></html>").encode("latin-1")
    pages = spark.createDataFrame(
        [("enc://1", bytearray(html))], "url string, html binary"
    )
    row = extract_pages(pages, SiftParams(max_units=0)).collect()[0]
    assert row["error"] is None
    assert "café" in row["text"]
    assert "�" not in row["text"]  # no replacement chars


def test_meta_declared_utf16_remaps_to_utf8():
    """WHATWG: a meta-declared UTF-16 label found by ASCII scan cannot be
    real UTF-16 -- remap to UTF-8 instead of producing CJK mojibake."""
    raw = (b'<html><head><meta charset="utf-16"></head><body>'
           b"Hello plain ascii body</body></html>")
    assert sniff_encoding(raw) == "utf-8"
    assert "Hello plain ascii body" in decode_html(raw)
