"""Sitemap parsing — SiteMapParserBolt
(core/.../bolt/SiteMapParserBolt.java:72,96-259) as pure functions + an
Arrow-batched stage.

Semantics:
  - sniff: sitemap namespace bytes within the first 300 bytes, or forced
    via ``isSitemap`` metadata (:79,86,105); non-sitemaps pass through
  - urlset → outlinks with optional ``lastmod`` freshness filter
    (``sitemap.filter.hours.since.modified``, :214-236)
  - sitemapindex → sub-sitemap outlinks flagged ``isSitemap=true`` so the
    next generation fetches and expands them (:182-212)
  - gzip members accepted (WARC/sitemap.gz both appear in the wild)
"""

from __future__ import annotations

import gzip
import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

SITEMAP_NS_SNIFF = b"http://www.sitemaps.org/schemas/sitemap"
_NS_RE = re.compile(r"^\{[^}]*\}")


@dataclass
class SitemapResult:
    is_sitemap: bool
    sub_sitemaps: list[str] = field(default_factory=list)
    urls: list[tuple[str, str | None]] = field(default_factory=list)  # (loc, lastmod)
    # sitemap extensions (IMAGE/NEWS/VIDEO..., crawler-default.yaml:259-269):
    # per-URL {loc: [(ext_tag, text), ...]} for namespaced child elements
    extensions: dict[str, list[tuple[str, str]]] = field(default_factory=dict)
    error: str | None = None


def _strip_ns(tag: str) -> str:
    return _NS_RE.sub("", tag)


def maybe_gunzip(content: bytes) -> bytes:
    if content[:2] == b"\x1f\x8b":
        try:
            return gzip.decompress(content)
        except OSError:
            return content
    return content


def sniff_sitemap(content: bytes, metadata: dict | None = None) -> bool:
    """Namespace bytes in the first 300 bytes, or forced by isSitemap
    metadata (SiteMapParserBolt.java:79,86,105)."""
    if metadata and metadata.get("isSitemap") in (["true"], "true", True):
        return True
    return SITEMAP_NS_SNIFF in maybe_gunzip(content)[:300]


def parse_lastmod(value: str | None) -> datetime | None:
    if not value:
        return None
    v = value.strip()
    for fmt in ("%Y-%m-%dT%H:%M:%S%z", "%Y-%m-%dT%H:%M%z", "%Y-%m-%d"):
        try:
            dt = datetime.strptime(v.replace("Z", "+0000"), fmt)
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
            return dt
        except ValueError:
            continue
    return None


def parse_sitemap(
    content: bytes,
    metadata: dict | None = None,
    filter_hours_since_modified: float | None = None,
    now: datetime | None = None,
) -> SitemapResult:
    data = maybe_gunzip(content)
    if not sniff_sitemap(data, metadata):
        return SitemapResult(is_sitemap=False)
    try:
        root = ET.fromstring(data)
    except ET.ParseError as e:
        return SitemapResult(is_sitemap=True, error=f"sitemap parse error: {e}")

    res = SitemapResult(is_sitemap=True)
    kind = _strip_ns(root.tag)
    cutoff = None
    if filter_hours_since_modified is not None:
        base = now or datetime.now(timezone.utc)
        cutoff = base - timedelta(hours=filter_hours_since_modified)

    for child in root:
        tag = _strip_ns(child.tag)
        if tag not in ("url", "sitemap"):
            continue
        loc = None
        lastmod = None
        exts: list[tuple[str, str]] = []
        for el in child:
            t = _strip_ns(el.tag)
            if t == "loc":
                loc = (el.text or "").strip()
            elif t == "lastmod":
                lastmod = (el.text or "").strip()
            else:
                # extension element (image:image, news:news, video:video...)
                # — flatten leaf texts as (tag.path, text)
                for leaf in el.iter():
                    if leaf is not el and (leaf.text or "").strip():
                        exts.append(
                            (
                                f"{_strip_ns(el.tag)}.{_strip_ns(leaf.tag)}",
                                leaf.text.strip(),
                            )
                        )
        if not loc:
            continue
        if exts:
            res.extensions[loc] = exts
        if kind == "sitemapindex":
            res.sub_sitemaps.append(loc)
        else:
            if cutoff is not None:
                lm = parse_lastmod(lastmod)
                # keep entries with no lastmod (can't judge freshness —
                # same as the reference's null check, :227-233)
                if lm is not None and lm < cutoff:
                    continue
            res.urls.append((loc, lastmod))
    return res


SITEMAP_RESULT_DDL = (
    "url string, is_sitemap boolean, error string, "
    "sub_sitemaps array<string>, "
    "entries array<struct<loc:string, lastmod:string>>"
)


def parse_sitemaps(pages, filter_hours_since_modified=None, now=None):
    """Arrow-batched stage: DataFrame(url, content) → sitemap results.
    Non-sitemap rows come back with is_sitemap=false for pass-through
    routing (SiteMapParserBolt.java:122-128)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                content = bytes(row.content) if row.content is not None else b""
                r = parse_sitemap(
                    content,
                    filter_hours_since_modified=filter_hours_since_modified,
                    now=now,
                )
                out.append(
                    {
                        "url": row.url,
                        "is_sitemap": r.is_sitemap,
                        "error": r.error,
                        "sub_sitemaps": r.sub_sitemaps,
                        "entries": [
                            {"loc": l, "lastmod": lm} for (l, lm) in r.urls
                        ],
                    }
                )
            yield pd.DataFrame(out)

    return pages.select("url", "content").mapInPandas(run, schema=SITEMAP_RESULT_DDL)
