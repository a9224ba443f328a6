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
