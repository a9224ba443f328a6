"""URL filter chain tests — accept/reject tables in the reference's style
(FastURLFilterTest, filter config tables; SURVEY.md §2.6)."""

from __future__ import annotations

import pytest

from incubator_stormcrawler_spark.functions.filtering import (
    BasicURLFilter,
    FastURLFilter,
    HostURLFilter,
    MaxDepthFilter,
    MetadataFilter,
    RegexURLFilter,
    RegexURLNormalizer,
    SelfURLFilter,
    URLFilterChain,
)

SRC = "https://www.example.com/page"


def test_basic_filter_length_and_repetition():
    f = BasicURLFilter(max_path_repetition=3, max_length=50)
    assert f.filter(SRC, {}, "https://e.com/a/b/c") == "https://e.com/a/b/c"
    assert f.filter(SRC, {}, "https://e.com/" + "x" * 60) is None
    assert f.filter(SRC, {}, "https://e.com/a/a/a/a/b") is None
    assert f.filter(SRC, {}, "https://e.com/a/a/a/b") is not None


def test_self_filter():
    f = SelfURLFilter()
    assert f.filter(SRC, {}, SRC) is None
    assert f.filter(SRC, {}, SRC + "2") == SRC + "2"


def test_max_depth():
    f = MaxDepthFilter(max_depth=2)
    assert f.filter(SRC, {"depth": ["1"]}, "https://e.com/") is not None
    assert f.filter(SRC, {"depth": ["2"]}, "https://e.com/") is None
    # per-URL override
    assert f.filter(SRC, {"depth": ["2"], "max.depth": ["5"]}, "https://e.com/") \
        is not None
    assert MaxDepthFilter(0).filter(SRC, {}, "https://e.com/") is None


def test_host_filter():
    same_host = HostURLFilter(ignore_outside_host=True)
    assert same_host.filter(SRC, {}, "https://www.example.com/x") is not None
    assert same_host.filter(SRC, {}, "https://sub.example.com/x") is None
    same_dom = HostURLFilter(ignore_outside_domain=True)
    assert same_dom.filter(SRC, {}, "https://sub.example.com/x") is not None
    assert same_dom.filter(SRC, {}, "https://other.org/x") is None


def test_metadata_filter():
    f = MetadataFilter(key="isSitemap", value="true")
    assert f.filter(SRC, {"isSitemap": ["true"]}, "https://e.com/") is None
    assert f.filter(SRC, {}, "https://e.com/") is not None


def test_regex_filter_first_match_wins():
    f = RegexURLFilter([r"-\.jpg$", r"+^https://good\.", r"-."])
    assert f.filter(SRC, {}, "https://good.example/a") is not None
    assert f.filter(SRC, {}, "https://good.example/a.jpg") is None
    assert f.filter(SRC, {}, "https://bad.example/a") is None


def test_regex_normalizer():
    f = RegexURLNormalizer([(r";jsessionid=[0-9A-Fa-f]+", ""), (r"&{2,}", "&")])
    assert (
        f.filter(SRC, {}, "https://e.com/a;jsessionid=AB12?x=1")
        == "https://e.com/a?x=1"
    )


def test_fast_filter_scopes():
    f = FastURLFilter(
        {
            "hostname": {"blocked.example": ["DenyAll"]},
            "domain": {"example.org": ["Deny \\.pdf$", "AllowAll"]},
            "global": ["Deny private", "AllowAll"],
        }
    )
    assert f.filter(SRC, {}, "https://blocked.example/any") is None
    assert f.filter(SRC, {}, "https://a.example.org/doc.pdf") is None
    assert f.filter(SRC, {}, "https://a.example.org/doc.html") is not None
    assert f.filter(SRC, {}, "https://other.net/private/x") is None
    assert f.filter(SRC, {}, "https://other.net/public") is not None


def test_chain_from_config_and_shortcircuit():
    chain = URLFilterChain.from_config(
        [
            {"class": "BasicURLNormalizer", "params": {}},
            {"class": "SelfURLFilter"},
            {"class": "BasicURLFilter", "params": {"max_length": 100}},
        ]
    )
    # normalizer runs first (anchor removed), then self-filter compares
    assert chain.filter(SRC, {}, SRC + "#frag") is None  # normalizes to SRC → self
    assert (
        chain.filter(SRC, {}, "https://other.example/x#y")
        == "https://other.example/x"
    )


def test_apply_filter_chain_spark(spark):
    from incubator_stormcrawler_spark.functions.filtering import apply_filter_chain
    from pyspark.sql import Row

    chain = URLFilterChain.from_config(
        [{"class": "HostURLFilter", "params": {"ignore_outside_host": True}}]
    )
    df = spark.createDataFrame(
        [
            Row(source_url="https://a.com/", target_url="https://a.com/x"),
            Row(source_url="https://a.com/", target_url="https://b.com/x"),
        ]
    )
    got = {r.target_url: r.filtered_url for r in apply_filter_chain(df, chain).collect()}
    assert got["https://a.com/x"] == "https://a.com/x"
    assert got["https://b.com/x"] is None


def test_robots_url_filter():
    from incubator_stormcrawler_spark.functions.filtering import RobotsURLFilter
    from incubator_stormcrawler_spark.protocol.robots import parse_robots_txt

    rules = parse_robots_txt("User-agent: *\nDisallow: /private/\n", ["me"])
    f = RobotsURLFilter({"a.example": rules})
    assert f.filter(SRC, {}, "https://a.example/ok") is not None
    assert f.filter(SRC, {}, "https://a.example/private/x") is None
    # unknown host (no cached rules) passes through
    assert f.filter(SRC, {}, "https://b.example/private/x") is not None


def test_sitemap_url_filter():
    from incubator_stormcrawler_spark.functions.filtering import SitemapURLFilter

    f = SitemapURLFilter({"mapped.example"})
    # sitemap-complete host: only sitemap-discovered URLs pass
    assert f.filter(SRC, {}, "https://mapped.example/x") is None
    assert (
        f.filter(SRC, {"isSitemap": ["true"]}, "https://mapped.example/x")
        is not None
    )
    # other hosts unaffected
    assert f.filter(SRC, {}, "https://other.example/x") is not None


def test_delegator_protocol():
    from incubator_stormcrawler_spark.protocol.fetch import (
        DelegatorProtocol,
        MemoryProtocol,
    )

    fast = MemoryProtocol({"https://a.example/x": "FAST"})
    slow = MemoryProtocol({"https://a.example/x": "SLOW"})
    proto = DelegatorProtocol(
        rules=[(lambda url, md: md.get("js") == ["true"], slow)],
        default=fast,
    )
    assert proto.get_protocol_output("https://a.example/x", {}).content == b"FAST"
    assert (
        proto.get_protocol_output("https://a.example/x", {"js": ["true"]}).content
        == b"SLOW"
    )
