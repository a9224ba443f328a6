"""Config-driven assembly + proxy rotation tests."""

from __future__ import annotations

import json

import pytest

from incubator_stormcrawler_spark.protocol.proxies import (
    MultiProxyManager,
    SingleProxyManager,
)


def test_single_proxy():
    m = SingleProxyManager("http://p1:8080")
    assert m.next_proxy() == "http://p1:8080"


def test_round_robin():
    m = MultiProxyManager(["a", "b", "c"], "ROUND_ROBIN")
    assert [m.next_proxy() for _ in range(5)] == ["a", "b", "c", "a", "b"]


def test_random_deterministic():
    m1 = MultiProxyManager(["a", "b", "c"], "RANDOM", seed=7)
    m2 = MultiProxyManager(["a", "b", "c"], "RANDOM", seed=7)
    seq = [m1.next_proxy() for _ in range(10)]
    assert seq == [m2.next_proxy() for _ in range(10)]
    assert len(set(seq)) > 1


def test_least_used():
    m = MultiProxyManager(["a", "b"], "LEAST_USED")
    picks = [m.next_proxy() for _ in range(4)]
    assert picks.count("a") == 2 and picks.count("b") == 2


def test_build_crawl_loop_from_config(spark, tmp_path):
    from incubator_stormcrawler_spark.config import build_crawl_loop
    from incubator_stormcrawler_spark.protocol.fetch import MemoryProtocol

    site = {"https://h0.example/p0": "<html><a href='/p1'>x</a></html>",
            "https://h0.example/p1": "<html>end</html>"}
    conf = {
        "frontier.path": str(tmp_path / "frontier"),
        "fetcher.server.delay": 0.0,
        "spout.max.results": 50,
        "spout.max.urls.per.bucket": 5,
        "urlfilters": [
            {"class": "BasicURLNormalizer", "params": {}},
            {"class": "HostURLFilter", "params": {"ignore_outside_host": True}},
        ],
    }
    cfg_file = tmp_path / "crawler.json"
    cfg_file.write_text(json.dumps(conf))
    loop = build_crawl_loop(spark, str(cfg_file), lambda: MemoryProtocol(site))
    loop.inject_seeds(spark.createDataFrame([("https://h0.example/p0",)], ["url"]))
    loop.run(2)
    frontier = {r.url: r.status for r in loop.read_frontier().collect()}
    assert frontier == {
        "https://h0.example/p0": "FETCHED",
        "https://h0.example/p1": "FETCHED",
    }


def test_build_crawl_loop_round8_knobs(spark, tmp_path):
    """The r8 scale/topology knobs flow from config keys into CrawlLoop
    (bucket-pruned store, Bloom prefilter, WARC archiving, rank
    priority) and a configured crawl still converges."""
    import glob

    from incubator_stormcrawler_spark.config import build_crawl_loop
    from incubator_stormcrawler_spark.protocol.fetch import MemoryProtocol

    site = {"https://h0.example/p0": "<html><a href='/p1'>x</a></html>",
            "https://h0.example/p1": "<html>end</html>"}
    conf = {
        "frontier.path": str(tmp_path / "frontier"),
        "fetcher.server.delay": 0.0,
        "frontier.bucket.partitioned": True,
        "frontier.bloom.prefilter": True,
        "frontier.bloom.m.bits": 1 << 16,
        "frontier.bloom.refresh.every": 2,
        "warc.dir": str(tmp_path / "warc"),
        "spout.rank.priority": True,
        "spout.rank.max.buckets": 4,
        "spout.rank.refresh.every": 3,
    }
    loop = build_crawl_loop(spark, conf, lambda: MemoryProtocol(site))
    assert loop.bucket_partitioned and loop.bloom_prefilter
    assert loop.bloom_m_bits == 1 << 16 and loop.bloom_refresh_every == 2
    assert loop.rank_priority and loop.rank_max_buckets == 4
    assert loop.rank_refresh_every == 3
    loop.inject_seeds(
        spark.createDataFrame([("https://h0.example/p0",)], ["url"])
    )
    loop.run(3)
    frontier = {r.url: r.status for r in loop.read_frontier().collect()}
    assert set(frontier) == set(site)
    assert all(st == "FETCHED" for st in frontier.values())
    assert glob.glob(str(tmp_path / "warc" / "*.warc.gz"))
