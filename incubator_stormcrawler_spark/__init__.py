"""PySpark-native crawl/analytics engine with the capabilities of
apache/incubator-stormcrawler (reference at /root/reference, read-only).

This is NOT a port of the Storm topology: capabilities are re-expressed
Spark-first (DataFrame/SQL plans optimized by Catalyst; Structured-Streaming
generation loops; Pandas UDFs only where built-ins can't express the
semantics). See SURVEY.md for the capability inventory this covers.

Layout:
  functions/  scalar/url/text expression builders (native-first, codegen-able)
  operators/  frontier query, status merge, dedup, similarity, relational ops
  sources/    seed files, WARC, synthetic fixtures
  parse/      HTML/sitemap/feed parsing + parse-filter chain
  protocol/   robots.txt rules, polite fetch loop
  streaming/  the recursive crawl generation loop
"""

__version__ = "0.1.0"

# Lazy top-level API: keep `import incubator_stormcrawler_spark` cheap —
# submodules (and their pyspark imports) load on first attribute access.
_API = {
    "get_spark": ("session", "get_spark"),
    "CrawlLoop": ("streaming.crawl_loop", "CrawlLoop"),
    "FrontierTable": ("streaming.frontier_table", "FrontierTable"),
    "URLFilterChain": ("functions.filtering", "URLFilterChain"),
    "BasicURLNormalizer": ("functions.urls", "BasicURLNormalizer"),
    "build_crawl_loop": ("config", "build_crawl_loop"),
    "frontier_topk": ("operators.frontier", "frontier_topk"),
    "merge_status_updates": ("operators.status_merge", "merge_status_updates"),
}


def __getattr__(name):
    if name in _API:
        import importlib

        mod, attr = _API[name]
        return getattr(importlib.import_module(f".{mod}", __name__), attr)
    raise AttributeError(name)
