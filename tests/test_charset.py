"""Charset detection golden fixtures — content-based fallback parity with
the reference's ICU detection (util/CharsetIdentification.java,
JSoupParserBolt.java:217-233): legacy-encoding pages without BOM/header/
meta must not mojibake."""

from __future__ import annotations

from incubator_stormcrawler_spark.parse.html import (
    detect_charset,
    parse_html_page,
    sniff_charset_statistical,
)

LATIN1_HTML = (
    "<html><body><p>Le café coûte 3€... "
    "naïve résumé déjà vu</p></body></html>"
).encode("iso-8859-1", errors="replace")

SJIS_HTML = (
    "<html><body><p>日本語のページです。"
    "東京と大阪</p></body></html>"
).encode("shift_jis")

UTF8_HTML = "<html><body><p>café 日本</p></body></html>".encode()


def test_statistical_utf8():
    assert sniff_charset_statistical(UTF8_HTML) == "utf-8"
    assert detect_charset(UTF8_HTML) == "utf-8"


def test_statistical_latin1():
    assert sniff_charset_statistical(LATIN1_HTML) == "iso-8859-1"
    assert detect_charset(LATIN1_HTML) == "iso-8859-1"


def test_statistical_shift_jis():
    assert sniff_charset_statistical(SJIS_HTML) == "shift_jis"
    assert detect_charset(SJIS_HTML) == "shift_jis"


def test_explicit_sources_still_win():
    # header beats content heuristic
    assert detect_charset(LATIN1_HTML, "text/html; charset=windows-1252") == \
        "windows-1252"
    # meta beats heuristic
    meta = b'<html><head><meta charset="euc-jp"></head><body></body></html>'
    assert detect_charset(meta) == "euc-jp"
    # BOM beats everything
    assert detect_charset(b"\xef\xbb\xbf" + LATIN1_HTML) == "utf-8"


def test_parse_roundtrips_latin1_text():
    page = parse_html_page("https://fr.example/", LATIN1_HTML)
    assert page.charset == "iso-8859-1"
    assert "café coûte" in page.text
    assert "�" not in page.text  # no replacement chars


def test_parse_roundtrips_shift_jis_text():
    page = parse_html_page("https://jp.example/", SJIS_HTML)
    assert page.charset == "shift_jis"
    assert "日本語のページです" in page.text
    assert "�" not in page.text
