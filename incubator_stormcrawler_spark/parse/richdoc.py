"""Rich-document parsing — the Tika ParserBolt equivalent
(external/tika/src/main/java/org/apache/stormcrawler/tika/ParserBolt.java:74:
text + metadata extraction, outlink emission, same filter machinery; the
RedirectionBolt shunt in parse/router.py routes non-HTML here).

Scope: PDF and DOCX are the dominant rich-doc types in a real crawl, and
both extract natively here:

* **PDF** — content streams located in the raw bytes, FlateDecode'd with
  stdlib zlib, text operators (Tj, ', TJ arrays, literal + hex strings
  with full escape handling) evaluated in document order; ``/URI``
  annotations become outlinks, the ``/Info`` dictionary yields the title.
  ``pdfminer.six`` is preferred when importable (broader codec/font
  coverage).
* **DOCX** — OOXML zip (stdlib zipfile): ``word/document.xml`` text runs
  (``w:t``) concatenated, paragraphs separated by newlines; title from
  ``docProps/core.xml``; hyperlink targets from the relationships part.

The Spark stage is one Arrow-batched ``mapInPandas`` over (url, content) —
the same batch shape as the HTML parser; no per-row Python round trips.
"""

from __future__ import annotations

import re
import zlib

from pyspark.sql import DataFrame

# -- byte-level PDF scanning ------------------------------------------------

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.DOTALL)
_URI_RE = re.compile(rb"/URI\s*\(((?:[^()\\]|\\.)*)\)")
_TITLE_RE = re.compile(rb"/Title\s*\(((?:[^()\\]|\\.)*)\)")
_PAGE_RE = re.compile(rb"/Type\s*/Page(?![a-zA-Z])")

# text-showing operators inside a BT..ET block
_BT_ET_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
_TEXT_OP_RE = re.compile(
    rb"\(((?:[^()\\]|\\.)*)\)\s*(Tj|')"  # (string) Tj   (string) '
    rb"|<([0-9A-Fa-f\s]*)>\s*(Tj|')"  # <hex> Tj
    rb"|\[(.*?)\]\s*TJ",  # [(s1) -250 (s2)] TJ
    re.DOTALL,
)
_TJ_ITEM_RE = re.compile(
    rb"\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]*)>", re.DOTALL
)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape_literal(raw: bytes) -> bytes:
    """PDF literal-string unescape (PDF 32000-1 §7.3.4.2): named escapes,
    1-3 digit octal codes, and backslash-newline continuation."""
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1 : i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt.isdigit():
            j = i + 1
            while j < len(raw) and j < i + 4 and raw[j : j + 1].isdigit():
                j += 1
            out.append(int(raw[i + 1 : j], 8) & 0xFF)
            i = j
        elif nxt in (b"\n", b"\r"):  # line continuation
            i += 2
            if nxt == b"\r" and raw[i : i + 1] == b"\n":
                i += 1
        else:
            out += nxt
            i += 2
    return bytes(out)


def _decode_hex(raw: bytes) -> bytes:
    h = re.sub(rb"\s", b"", raw)
    if len(h) % 2:
        h += b"0"  # odd-length hex strings pad with 0 (spec)
    return bytes.fromhex(h.decode("ascii", "replace"))


def _stream_text(decoded: bytes) -> str:
    """Concatenate text-showing operators in order. Tj/'/TJ append; no
    synthetic separators are inserted (positioning operators carry no
    text), matching a layout-free Tika BodyContentHandler extraction."""
    parts: list[bytes] = []
    for block in _BT_ET_RE.findall(decoded):
        for m in _TEXT_OP_RE.finditer(block):
            lit, _, hx, _, tj_arr = m.groups()
            if lit is not None:
                parts.append(_unescape_literal(lit))
            elif hx is not None:
                parts.append(_decode_hex(hx))
            elif tj_arr is not None:
                for im in _TJ_ITEM_RE.finditer(tj_arr):
                    ilit, ihx = im.groups()
                    if ilit is not None:
                        parts.append(_unescape_literal(ilit))
                    elif ihx is not None:
                        parts.append(_decode_hex(ihx))
    return b"".join(parts).decode("utf-8", "replace")


def extract_pdf(content: bytes) -> dict:
    """Extract {text, title, n_pages, outlinks} from PDF bytes.

    Prefers pdfminer.six when installed; otherwise the built-in scanner:
    every ``<<dict>> stream..endstream`` segment is FlateDecode'd when the
    dict says so, then text operators are evaluated in byte order (which is
    content order for linearly-written PDFs).
    """
    try:  # pragma: no cover - pdfminer not in this container
        from io import BytesIO

        from pdfminer.high_level import extract_text

        text = extract_text(BytesIO(content))
        n_pages = len(_PAGE_RE.findall(content))
        return {
            "text": text,
            "title": _extract_title(content),
            "n_pages": max(n_pages, 1),
            "outlinks": _extract_uris(content),
        }
    except ImportError:
        pass

    texts: list[str] = []
    for dict_bytes, body in _STREAM_RE.findall(content):
        if b"/FlateDecode" in dict_bytes:
            try:
                body = zlib.decompress(body.rstrip(b"\r\n"))
            except zlib.error:
                continue
        texts.append(_stream_text(body))
    return {
        "text": "".join(texts),
        "title": _extract_title(content),
        "n_pages": max(len(_PAGE_RE.findall(content)), 1),
        "outlinks": _extract_uris(content),
    }


def extract_docx(content: bytes) -> dict:
    """Extract {text, title, n_pages, outlinks} from a DOCX (OOXML zip).

    ``w:p`` paragraphs → newline-separated text of their ``w:t`` runs;
    title = ``dc:title`` in docProps/core.xml; outlinks = hyperlink
    relationship targets. n_pages is 1 (OOXML has no fixed pagination).
    """
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
    DC = "{http://purl.org/dc/elements/1.1/}"
    R = (
        "{http://schemas.openxmlformats.org/package/2006/relationships}"
        "Relationship"
    )

    text = ""
    title: str | None = None
    outlinks: list[str] = []
    with zipfile.ZipFile(io.BytesIO(content)) as zf:
        names = set(zf.namelist())
        if "word/document.xml" in names:
            root = ET.fromstring(zf.read("word/document.xml"))
            paras = []
            for p in root.iter(f"{W}p"):
                runs = [t.text or "" for t in p.iter(f"{W}t")]
                paras.append("".join(runs))
            text = "\n".join(paras)
        if "docProps/core.xml" in names:
            core = ET.fromstring(zf.read("docProps/core.xml"))
            el = core.find(f"{DC}title")
            if el is not None and el.text:
                title = el.text
        if "word/_rels/document.xml.rels" in names:
            rels = ET.fromstring(zf.read("word/_rels/document.xml.rels"))
            for rel in rels.iter(R):
                if rel.get("Type", "").endswith("/hyperlink"):
                    target = rel.get("Target")
                    if target and target not in outlinks:
                        outlinks.append(target)
    return {"text": text, "title": title, "n_pages": 1, "outlinks": outlinks}


def extract_richdoc(content: bytes) -> dict:
    """Magic-sniffing dispatch: %PDF → extract_pdf, PK zip → extract_docx,
    OLE2 compound magic → legacy Word ``.doc`` (parse/ole2doc.py) — the
    ParserBolt's Tika.detect step."""
    head = content[:512].lstrip()
    if head.startswith(b"%PDF"):
        return extract_pdf(content)
    if content[:4] == b"PK\x03\x04":
        return extract_docx(content)
    if content[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        from .ole2doc import extract_doc

        try:
            return extract_doc(content)
        except Exception:  # malformed container → error slot, not a crash
            return {"text": "", "title": None, "n_pages": 0, "outlinks": []}
    return {"text": "", "title": None, "n_pages": 0, "outlinks": []}


def _extract_title(content: bytes) -> str | None:
    m = _TITLE_RE.search(content)
    return (
        _unescape_literal(m.group(1)).decode("utf-8", "replace") if m else None
    )


def _extract_uris(content: bytes) -> list[str]:
    seen: list[str] = []
    for raw in _URI_RE.findall(content):
        u = _unescape_literal(raw).decode("utf-8", "replace")
        if u not in seen:
            seen.append(u)
    return seen


# -- deterministic PDF builder (fixtures + oracle-able roundtrip) -----------

def _escape_literal(s: str) -> bytes:
    return (
        s.encode("utf-8")
        .replace(b"\\", b"\\\\")
        .replace(b"(", b"\\(")
        .replace(b")", b"\\)")
    )


def build_pdf(
    text: str,
    title: str | None = None,
    link: str | None = None,
    tokens_per_page: int = 100,
    tokens_per_chunk: int = 10,
) -> bytes:
    """Build a small but structurally real PDF: catalog, page tree, one
    Flate-compressed content stream per page (text split into Tj chunks),
    optional /Info title and /URI link annotation, xref table + trailer.
    Deterministic: same input → same bytes. ``extract_pdf`` of the result
    round-trips ``text`` exactly (chunks carry their separators), which is
    what makes the ``parse_richdoc`` query oracle-able in DuckDB.
    """
    toks = text.split(" ")
    pages: list[bytes] = []
    for p in range(0, max(len(toks), 1), tokens_per_page):
        page_toks = toks[p : p + tokens_per_page]
        chunks: list[bytes] = []
        for c in range(0, len(page_toks), tokens_per_chunk):
            chunk = " ".join(page_toks[c : c + tokens_per_chunk])
            if p + c > 0:  # re-attach the separator consumed by split
                chunk = " " + chunk
            chunks.append(b"(" + _escape_literal(chunk) + b") Tj\n")
        body = b"BT\n/F1 12 Tf\n" + b"".join(chunks) + b"ET\n"
        pages.append(zlib.compress(body))

    # object layout: 1 catalog, 2 pages, 3 font, 4..3+n content streams,
    # then optional annot, optional info, then the n page objects
    n_pages = len(pages)
    content_base = 4
    annot_num = content_base + n_pages if link else 0
    info_num = content_base + n_pages + (1 if link else 0) if title else 0
    page_base = (
        content_base + n_pages + (1 if link else 0) + (1 if title else 0)
    )
    kids = " ".join(f"{page_base + i} 0 R" for i in range(n_pages))

    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    for body in pages:
        objs.append(
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
            % (len(body), body)
        )
    if link:
        objs.append(
            b"<< /Type /Annot /Subtype /Link /Rect [0 0 100 20] "
            b"/A << /S /URI /URI (%s) >> >> " % _escape_literal(link)
        )
    if title:
        objs.append(b"<< /Title (%s) >>" % _escape_literal(title))
    for i in range(n_pages):
        annot = f" /Annots [{annot_num} 0 R]" if (link and i == 0) else ""
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {content_base + i} 0 R{annot} >>"
            ).encode()
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    trailer = b"<< /Size %d /Root 1 0 R" % (len(objs) + 1)
    if title:
        trailer += b" /Info %d 0 R" % info_num
    trailer += b" >>"
    out += b"trailer\n" + trailer + b"\nstartxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)


# -- Spark stage ------------------------------------------------------------

RICHDOC_DDL = (
    "url string, text string, title string, n_pages int, "
    "outlinks array<string>"
)


def parse_richdocs(pages: DataFrame) -> DataFrame:
    """(url, content) → (url, text, title, n_pages, outlinks) for rich
    documents. One Arrow hop; rows the extractor cannot handle yield an
    empty text rather than failing the stage (ParserBolt's error-stream
    semantics live in the router, which checks ``text != ''``)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                content = bytes(row.content) if row.content is not None else b""
                try:
                    d = extract_richdoc(content)
                except Exception:
                    d = {"text": "", "title": None, "n_pages": 0,
                         "outlinks": []}
                out.append(
                    {
                        "url": row.url,
                        "text": d["text"],
                        "title": d["title"],
                        "n_pages": d["n_pages"],
                        "outlinks": d["outlinks"],
                    }
                )
            yield pd.DataFrame(
                out, columns=["url", "text", "title", "n_pages", "outlinks"]
            )

    return pages.select("url", "content").mapInPandas(run, schema=RICHDOC_DDL)
