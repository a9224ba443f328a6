"""Config-driven topology assembly — the engine's ConfigurableTopology
(core/.../ConfigurableTopology.java:40-74 loads crawler-default.yaml +
user conf and wires the DAG; Flux YAML declares it).

Ours: one JSON/YAML dict wires a ``CrawlLoop`` — URL filter chain
(urlfilters.json-style), parse filters (parsefilters.json-style), fetch
politeness knobs (crawler-default.yaml names kept where they map 1:1),
frontier location. A user of the reference's config model finds the same
shape here:

    {
      "frontier.path": "/data/frontier",
      "fetcher.server.delay": 1.0,          # crawler-default.yaml:22
      "fetcher.max.crawl.delay": 30.0,      # crawler-default.yaml:33
      "http.agent.name": "stormcrawler-spark",
      "urlfilters": [{"class": "BasicURLNormalizer", "params": {}}, ...],
      "parsefilters": [{"class": "MD5SignatureParseFilter"}, ...],
      "spout.max.results": 1000,
      "spout.max.urls.per.bucket": 5,
      "parser.max.outlinks": 100            # parser.emitOutlinks cap
    }
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from .functions.filtering import URLFilterChain
from .parse.parse_filters import ParseFilterChain
from .streaming.crawl_loop import CrawlLoop


def load_config(path_or_dict) -> dict:
    if isinstance(path_or_dict, dict):
        return path_or_dict
    with open(path_or_dict) as f:
        text = f.read()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        try:  # YAML configs accepted when pyyaml is available
            import yaml

            return yaml.safe_load(text)
        except ImportError as e:
            raise ValueError(
                f"{path_or_dict}: not JSON and pyyaml unavailable"
            ) from e


def build_crawl_loop(
    spark: SparkSession, config, protocol_factory
) -> CrawlLoop:
    """Assemble a CrawlLoop from a config dict (see module doc)."""
    conf = load_config(config)
    chain = URLFilterChain.from_config(conf.get("urlfilters", []))
    return CrawlLoop(
        spark,
        frontier_path=conf["frontier.path"],
        protocol_factory=protocol_factory,
        filter_chain=chain,
        max_per_bucket=int(conf.get("spout.max.urls.per.bucket", 5)),
        max_results=int(conf.get("spout.max.results", 1000)),
        server_delay=float(conf.get("fetcher.server.delay", 1.0)),
        respect_robots=bool(conf.get("http.robots.enabled", False)),
        max_outlinks=int(conf.get("parser.max.outlinks", 100)),
        # crawler-default.yaml:26 fetcher.threads.number
        fetch_threads=int(conf.get("fetcher.threads.number", 1)),
        max_depth=(int(conf["max.depth"]) if "max.depth" in conf else None),
        adaptive=bool(conf.get("scheduler.adaptive", False)),
        # scale/topology knobs (round 8): the bucket-pruned frontier
        # store, the Bloom discovery prefilter (the reference's per-JVM
        # seen caches, AbstractQueryingSpout.java:149-175), WARC
        # archiving of fetched pages (WARCHdfsBolt), and OPIC-style
        # rank-prioritized bucket choice (PriorityURLBuffer analog)
        bucket_partitioned=bool(conf.get("frontier.bucket.partitioned", False)),
        bloom_prefilter=bool(conf.get("frontier.bloom.prefilter", False)),
        bloom_m_bits=int(conf.get("frontier.bloom.m.bits", 1 << 20)),
        bloom_refresh_every=int(conf.get("frontier.bloom.refresh.every", 1)),
        # r9: shard the prefilter bitmap into N lazy broadcasts (the
        # 10^9-url form); 1 = the single-array path
        bloom_n_shards=int(conf.get("frontier.bloom.n.shards", 1)),
        # r9: politeness-limited generation sizing (fetch_forecast cap)
        forecast_sizing=bool(conf.get("frontier.forecast.sizing", False)),
        forecast_horizon_s=float(
            conf.get("frontier.forecast.horizon.sec", 60.0)
        ),
        # r10: lakehouse maintenance cadence — OPTIMIZE (optionally
        # ZORDER-clustered) every N generations on the bucketed table
        compact_every=int(conf.get("frontier.compact.every", 0)),
        compact_zorder=bool(conf.get("frontier.compact.zorder", False)),
        compact_curve=str(conf.get("frontier.compact.curve", "morton")),
        warc_dir=conf.get("warc.dir"),
        rank_priority=bool(conf.get("spout.rank.priority", False)),
        rank_max_buckets=int(conf.get("spout.rank.max.buckets", 10)),
        rank_refresh_every=int(conf.get("spout.rank.refresh.every", 1)),
    )


def build_parse_filter_chain(config) -> ParseFilterChain:
    conf = load_config(config)
    return ParseFilterChain(conf.get("parsefilters", []))
