"""RSS/Atom feed parsing — FeedParserBolt
(core/.../bolt/FeedParserBolt.java:58,72-190) as pure functions + stage.

Semantics: sniff ``<rss``/``<feed`` in the head bytes or rss+xml
content-type (:72-88); entries become DISCOVERED outlinks; items missing
``<link>`` fall back to a ``guid``/``id`` URI (:179-188); the feed URL
itself reports FETCHED.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

_FEED_SNIFF_RE = re.compile(rb"<(rss|feed|rdf:RDF)[\s>]", re.I)
_NS_RE = re.compile(r"^\{[^}]*\}")


@dataclass
class FeedResult:
    is_feed: bool
    entries: list[tuple[str, str | None]] = field(default_factory=list)  # (url, title)
    error: str | None = None


def _strip_ns(tag: str) -> str:
    return _NS_RE.sub("", tag)


def sniff_feed(content: bytes, content_type: str | None = None) -> bool:
    if content_type and ("rss+xml" in content_type or "atom+xml" in content_type):
        return True
    return bool(_FEED_SNIFF_RE.search(content[:100]))


def parse_feed(content: bytes, content_type: str | None = None) -> FeedResult:
    if not sniff_feed(content, content_type):
        return FeedResult(is_feed=False)
    try:
        root = ET.fromstring(content)
    except ET.ParseError as e:
        return FeedResult(is_feed=True, error=f"feed parse error: {e}")

    res = FeedResult(is_feed=True)
    # RSS: channel/item; Atom: entry
    items = [el for el in root.iter() if _strip_ns(el.tag) in ("item", "entry")]
    for it in items:
        link = None
        guid = None
        title = None
        for el in it:
            t = _strip_ns(el.tag)
            if t == "link":
                # Atom: <link href=...>; RSS: <link>text</link>
                link = (el.get("href") or el.text or "").strip() or link
            elif t in ("guid", "id"):
                guid = (el.text or "").strip() or guid
            elif t == "title" and title is None:
                title = (el.text or "").strip() or None
        url = link or (guid if guid and guid.startswith("http") else None)
        if url:
            res.entries.append((url, title))
    return res


FEED_RESULT_DDL = (
    "url string, is_feed boolean, error string, "
    "entries array<struct<link:string, title:string>>"
)


def parse_feeds(pages):
    """Arrow-batched stage: DataFrame(url, content[, content_type]) →
    feed results; non-feeds flagged for pass-through."""
    import pandas as pd

    has_ct = "content_type" in pages.columns

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                content = bytes(row.content) if row.content is not None else b""
                ct = getattr(row, "content_type", None) if has_ct else None
                r = parse_feed(content, ct)
                out.append(
                    {
                        "url": row.url,
                        "is_feed": r.is_feed,
                        "error": r.error,
                        "entries": [
                            {"link": u, "title": t} for (u, t) in r.entries
                        ],
                    }
                )
            yield pd.DataFrame(out)

    cols = ["url", "content"] + (["content_type"] if has_ct else [])
    return pages.select(*cols).mapInPandas(run, schema=FEED_RESULT_DDL)
