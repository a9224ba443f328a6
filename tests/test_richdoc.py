"""Rich-document (Tika-equivalent) parse tests — golden fixtures in the
reference's ParsingTester style (external/tika/.../ParserBolt.java:74)."""

from __future__ import annotations

import zlib

from incubator_stormcrawler_spark.parse.richdoc import (
    build_pdf,
    extract_pdf,
    parse_richdocs,
)


def test_roundtrip_single_page():
    text = "hello world this is a short test document"
    d = extract_pdf(build_pdf(text))
    assert d["text"] == text
    assert d["n_pages"] == 1
    assert d["title"] is None
    assert d["outlinks"] == []


def test_roundtrip_multipage_with_title_and_link():
    text = " ".join(f"tok{i}" for i in range(450))  # 5 pages at 100 tok/page
    d = extract_pdf(
        build_pdf(text, title="My (Annual) Report", link="https://ex.ample/x")
    )
    assert d["text"] == text
    assert d["n_pages"] == 5
    assert d["title"] == "My (Annual) Report"  # escaped parens round-trip
    assert d["outlinks"] == ["https://ex.ample/x"]


def test_roundtrip_special_chars():
    text = "parens (x) and \\ backslash and unicode café ünïcode"
    d = extract_pdf(build_pdf(text))
    assert d["text"] == text


def test_golden_handcrafted_pdf():
    """Uncompressed stream, octal escape, hex string, TJ array with kerning
    numbers, /Title with octal, /URI annotation — the operator zoo."""
    raw = (
        b"%PDF-1.4\n1 0 obj\n<< /Type /Page >>\nendobj\n"
        b"2 0 obj\n<< /Length 99 >>\nstream\n"
        b"BT (Hello\\040World) Tj <21> Tj [(A) -120 (B) 5 <43>] TJ ET\n"
        b"endstream\nendobj\n"
        b"3 0 obj\n<< /Title (T\\151tle) >>\nendobj\n"
        b"4 0 obj\n<< /Type /Annot /A << /S /URI /URI (http://a.b/c) >> >>\n"
        b"endobj\n"
    )
    d = extract_pdf(raw)
    assert d["text"] == "Hello World!ABC"
    assert d["title"] == "Title"
    assert d["outlinks"] == ["http://a.b/c"]
    assert d["n_pages"] == 1


def test_golden_flate_stream():
    body = b"BT (compressed text) Tj ET"
    comp = zlib.compress(body)
    raw = (
        b"%PDF-1.4\n1 0 obj\n<< /Type /Page >>\nendobj\n"
        b"2 0 obj\n<< /Length " + str(len(comp)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + comp
        + b"\nendstream\nendobj\n"
    )
    assert extract_pdf(raw)["text"] == "compressed text"


def test_corrupt_stream_does_not_fail():
    raw = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 5 /Filter /FlateDecode >>\n"
        b"stream\nnotzlib\nendstream\nendobj\n"
    )
    d = extract_pdf(raw)
    assert d["text"] == ""
    assert d["n_pages"] == 1  # floor of 1, like Tika's single-doc handling


def test_router_routes_pdf_to_richdoc_branch(spark):
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.parse.router import parse_routed

    pages = spark.createDataFrame(
        [
            Row(
                url="https://a.example/doc.pdf",
                content=bytearray(
                    build_pdf("riched doc text", link="https://a.example/next")
                ),
            ),
            Row(
                url="https://a.example/page.html",
                content=bytearray(b"<html><body>hi</body></html>"),
            ),
            Row(url="https://a.example/img.png",
                content=bytearray(b"\x89PNG\r\n\x1a\nxxxx")),
        ]
    )
    routed = parse_routed(pages)
    rich = routed["richdocs"].collect()
    assert len(rich) == 1
    assert rich[0].url == "https://a.example/doc.pdf"
    assert rich[0].text == "riched doc text"
    assert list(rich[0].outlinks) == ["https://a.example/next"]
    other = routed["other"].collect()
    assert [r.url for r in other] == ["https://a.example/img.png"]


def test_parse_richdocs_stage_schema(spark):
    from pyspark.sql import Row

    pages = spark.createDataFrame(
        [Row(url="u1", content=bytearray(build_pdf("alpha beta")))]
    )
    out = parse_richdocs(pages)
    assert out.columns == ["url", "text", "title", "n_pages", "outlinks"]
    r = out.collect()[0]
    assert r.text == "alpha beta" and r.n_pages == 1


def build_docx(paragraphs, title=None, link=None) -> bytes:
    """Minimal OOXML fixture builder (golden-test helper)."""
    import io
    import zipfile

    body = "".join(
        f"<w:p><w:r><w:t>{p}</w:t></w:r></w:p>" for p in paragraphs
    )
    doc = (
        '<?xml version="1.0"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>' + body +
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("word/document.xml", doc)
        if title:
            zf.writestr(
                "docProps/core.xml",
                '<cp:coreProperties xmlns:cp="http://schemas.openxmlformats'
                '.org/package/2006/metadata/core-properties" xmlns:dc='
                '"http://purl.org/dc/elements/1.1/"><dc:title>' + title +
                "</dc:title></cp:coreProperties>",
            )
        if link:
            zf.writestr(
                "word/_rels/document.xml.rels",
                '<Relationships xmlns="http://schemas.openxmlformats.org/'
                'package/2006/relationships"><Relationship Id="rId1" Type='
                '"http://schemas.openxmlformats.org/officeDocument/2006/'
                'relationships/hyperlink" Target="' + link +
                '" TargetMode="External"/></Relationships>',
            )
    return buf.getvalue()


def test_docx_extraction():
    from incubator_stormcrawler_spark.parse.richdoc import extract_richdoc

    raw = build_docx(
        ["First paragraph.", "Second paragraph."],
        title="Quarterly Report",
        link="https://ex.ample/ref",
    )
    d = extract_richdoc(raw)
    assert d["text"] == "First paragraph.\nSecond paragraph."
    assert d["title"] == "Quarterly Report"
    assert d["outlinks"] == ["https://ex.ample/ref"]
    assert d["n_pages"] == 1


def test_docx_routed_to_richdoc_branch(spark):
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.parse.router import parse_routed

    pages = spark.createDataFrame(
        [
            Row(url="https://a.example/report.docx",
                content=bytearray(build_docx(["docx body text"]))),
            # a plain (non-OOXML) zip stays in the unsupported branch
            Row(url="https://a.example/archive.zip",
                content=bytearray(b"PK\x03\x04randomzipbytes")),
        ]
    )
    routed = parse_routed(pages)
    rich = routed["richdocs"].collect()
    assert [r.url for r in rich] == ["https://a.example/report.docx"]
    assert rich[0].text == "docx body text"
    assert [r.url for r in routed["other"].collect()] == [
        "https://a.example/archive.zip"
    ]


# -- legacy Word binary (.doc) — parse/ole2doc.py ---------------------------

def test_doc_roundtrip_both_piece_encodings():
    from incubator_stormcrawler_spark.parse.ole2doc import (
        build_doc,
        extract_doc,
    )

    text = "Legacy body text.\nSecond paragraph."
    for enc in ("utf-16", "cp1252"):
        d = extract_doc(
            build_doc(text, title="Old Report", link="https://ex.ample/ref",
                      encoding=enc)
        )
        assert d["text"] == text, enc
        assert d["title"] == "Old Report"
        assert d["outlinks"] == ["https://ex.ample/ref"]
        assert d["n_pages"] == 1


def test_doc_large_stream_uses_regular_fat():
    """Past the 4096-byte mini-stream cutoff the WordDocument stream must
    live in regular FAT sectors; round trip proves both container paths."""
    from incubator_stormcrawler_spark.parse.ole2doc import (
        build_doc,
        extract_doc,
        ole2_streams,
    )

    big = " ".join(f"tok{i}" for i in range(3000))
    raw = build_doc(big, title="big")
    streams = ole2_streams(raw)
    assert len(streams["WordDocument"]) >= 4096
    assert len(streams["0Table"]) < 4096  # stays in the mini stream
    assert extract_doc(raw)["text"] == big


def test_doc_unicode_text_and_title():
    from incubator_stormcrawler_spark.parse.ole2doc import (
        build_doc,
        extract_doc,
    )

    d = extract_doc(build_doc("café 日本語 text", title="título"))
    assert d["text"] == "café 日本語 text"
    assert d["title"] == "título"


def test_doc_field_runs_resolved():
    """Field code part (\\x13..\\x14) is dropped, result kept, target
    surfaced as outlink — Word stores hyperlinks as text-level fields."""
    from incubator_stormcrawler_spark.parse.ole2doc import _field_text

    raw = 'before \x13 HYPERLINK "https://t.example/x" \x14shown label\x15 after'
    text, links = _field_text(raw)
    assert text == "before shown label after"
    assert links == ["https://t.example/x"]


def test_doc_malformed_container_routes_to_error_not_crash():
    from incubator_stormcrawler_spark.parse.richdoc import extract_richdoc

    junk = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 100
    d = extract_richdoc(junk)
    assert d == {"text": "", "title": None, "n_pages": 0, "outlinks": []}


def test_doc_routed_to_richdoc_branch(spark):
    from pyspark.sql import Row

    from incubator_stormcrawler_spark.parse.ole2doc import build_doc
    from incubator_stormcrawler_spark.parse.router import parse_routed

    pages = spark.createDataFrame(
        [
            Row(url="https://a.example/memo.doc",
                content=bytearray(build_doc("legacy doc body",
                                            title="Memo"))),
        ]
    )
    rich = parse_routed(pages)["richdocs"].collect()
    assert [r.url for r in rich] == ["https://a.example/memo.doc"]
    assert rich[0].text == "legacy doc body"
    assert rich[0].title == "Memo"
