"""BasicURLNormalizer parity — the reference's own unit-test table
(core/src/test/java/org/apache/stormcrawler/filtering/BasicURLNormalizerTest.java)
ported case-by-case, plus partition-key/PLD checks
(core/.../util/URLPartitioner.java:44-93)."""

from __future__ import annotations

import pytest

from incubator_stormcrawler_spark.functions.urls import (
    BasicURLNormalizer,
    paid_level_domain,
    partition_key,
)

QP = ["a", "foo"]


def n(**kw):
    return BasicURLNormalizer(**kw)


def test_anchor_filter():
    f = n(remove_anchor_part=True, check_valid_uri=False)
    assert f.filter("http://www.sourcedomain.com/#0") == "http://www.sourcedomain.com/"


def test_anchor_filter_false():
    f = n(remove_anchor_part=False, check_valid_uri=False)
    assert f.filter("http://www.sourcedomain.com/#0") == "http://www.sourcedomain.com/#0"


def test_remove_some_of_many_query_params():
    f = n(query_elements_to_remove=QP)
    assert (
        f.filter("http://google.com?keep1=true&a=c&foo=baz&keep2=true")
        == "http://google.com?keep1=true&keep2=true"
    )


def test_remove_all_query_params():
    f = n(query_elements_to_remove=QP)
    assert f.filter("http://google.com?a=c&foo=baz") == "http://google.com"


def test_remove_dupe_query_params():
    f = n(query_elements_to_remove=QP)
    assert (
        f.filter("http://google.com?a=c&foo=baz&foo=bar&test=true")
        == "http://google.com?test=true"
    )


def test_pipe_in_url_and_filter_still_works():
    f = n(query_elements_to_remove=QP)
    assert (
        f.filter("http://google.com?a=c|d&foo=baz&foo=bar&test=true")
        == "http://google.com?test=true"
    )


def test_both_anchor_and_query_filter():
    f = n(remove_anchor_part=True, query_elements_to_remove=QP)
    assert (
        f.filter("http://google.com?a=c|d&foo=baz&foo=bar&test=true#fragment=ohYeah")
        == "http://google.com?test=true"
    )


def test_query_sort():
    f = n(query_elements_to_remove=QP)
    assert (
        f.filter("http://google.com?a=c|d&foo=baz&foo=bar&test=true&z=2&d=4")
        == "http://google.com?d=4&test=true&z=2"
    )


def test_mangled_query_string():
    f = n(query_elements_to_remove=QP)
    assert (
        f.filter("http://google.com&d=4&good=true")
        == "http://google.com?d=4&good=true"
    )


def test_hashes():
    f = n(remove_hashes=True)
    assert (
        f.filter(
            "http://www.florida-chemical.com/Diacetone-Alcohol-DAA-99.html"
            "?xid_0b629=12854b827878df26423d933a5baf86d5"
        )
        == "http://www.florida-chemical.com/Diacetone-Alcohol-DAA-99.html"
    )
    assert (
        f.filter(
            "http://www.maroongroupllc.com/maroon/login/auth"
            ";jsessionid=8DBFC2FEDBD740BBC8B4D1A504A6DE7F"
        )
        == "http://www.maroongroupllc.com/maroon/login/auth"
    )


def test_dont_fix_mangled_query_string():
    f = n(remove_anchor_part=True, unmangle_query_string=False,
          query_elements_to_remove=QP)
    assert (
        f.filter("http://google.com&d=4&good=true")
        == "http://google.com&d=4&good=true"
    )


def test_fix_mangled_query_string():
    f = n(remove_anchor_part=False, unmangle_query_string=True,
          query_elements_to_remove=QP)
    assert (
        f.filter("http://google.com&d=4&good=true")
        == "http://google.com?d=4&good=true"
    )
    assert (
        f.filter("http://dev.com/s&utax/NEWSRLSEfy18.pdf")
        == "http://dev.com/s&utax/NEWSRLSEfy18.pdf"
    )


def test_proper_url_encoding_without_query_parameter():
    f = n(query_elements_to_remove=QP)
    u = (
        "http://www.dillards.com/product/ASICS-Womens-GT2000-3-LiteShow"
        "%E2%84%A2-Running-Shoes_301_-1_301_504736989"
    )
    assert f.filter(u) == u


def test_proper_url_encoding_with_query_parameters():
    f = n(query_elements_to_remove=QP)
    u = (
        "http://www.dillards.com/product/ASICS-Womens-GT2000-3-LiteShow"
        "%E2%84%A2-Running-Shoes_301_-1_301_504736989?how=are&you=doing"
    )
    assert f.filter(u) == u


def test_proper_url_encoding_with_backslash():
    f = n(query_elements_to_remove=QP)
    assert (
        f.filter("http://www.voltaix.com/\\SDS\\Silicon\\Trisilane\\Trisilane_SI050_USENG.pdf")
        == "http://www.voltaix.com/%5CSDS%5CSilicon%5CTrisilane%5CTrisilane_SI050_USENG.pdf"
    )


def test_invalid_uri():
    f = n(remove_anchor_part=True, check_valid_uri=True)
    assert (
        f.filter("http://www.quanjing.com/search.aspx?q=top-651451||1|60|1|2||||&Fr=4")
        == "http://www.quanjing.com/search.aspx?q=top-651451%7C%7C1%7C60%7C1%7C2%7C%7C%7C%7C&Fr=4"
    )
    assert (
        f.filter(
            "http://vins.lemonde.fr?utm_source=LeMonde_partenaire_hp"
            "&utm_medium=EMPLACEMENT PARTENAIRE&utm_term=&utm_content="
            "&utm_campaign=LeMonde_partenaire_hp"
        )
        == "http://vins.lemonde.fr?utm_source=LeMonde_partenaire_hp"
        "&utm_medium=EMPLACEMENT%20PARTENAIRE&utm_term=&utm_content="
        "&utm_campaign=LeMonde_partenaire_hp"
    )
    assert (
        f.filter("http://docs.oracle.com/javase/7/docs/api/java/net/../net/./URI.html#normalize()")
        == "http://docs.oracle.com/javase/7/docs/api/java/net/URI.html"
    )


def test_lower_casing():
    f = n(remove_anchor_part=False, check_valid_uri=False)
    assert f.filter("HTTP://www.quanjing.com/") == "http://www.quanjing.com/"
    assert f.filter("http://www.QUANJING.COM/") == "http://www.quanjing.com/"


def test_non_standard_percent_encoding():
    f = n(remove_anchor_part=False, check_valid_uri=False)
    assert (
        f.filter("http://www.hurriyet.com.tr/index/?d=20160328&p=13&s=ni%u011fde")
        == "http://www.hurriyet.com.tr/index/?d=20160328&p=13&s=ni%C4%9Fde"
    )


def test_host_idn_to_ascii():
    f = n(host_idn_to_ascii=True)
    assert f.filter("http://señal6.com.ar/") == "http://xn--seal6-pta.com.ar/"
    assert f.filter("http://сфера.укр/") == "http://xn--80aj7acp.xn--j1amh/"


# -- partitioner ----------------------------------------------------------

def test_partition_key_by_host():
    assert partition_key("https://Sub.Example.COM/a", "byHost") == "sub.example.com"


def test_partition_key_by_domain():
    assert partition_key("https://a.b.example.co.uk/x", "byDomain") == "example.co.uk"
    assert partition_key("https://news.example.com/x", "byDomain") == "example.com"


def test_partition_key_by_ip_from_metadata():
    assert partition_key("https://x.com/", "byIP", {"ip": ["1.2.3.4"]}) == "1.2.3.4"


def test_partition_key_by_ip_resolver_cache():
    """byIP with an injected resolver (URLPartitioner.java:62-68 resolves
    DNS; URLPartitionerBolt.java:101-104 caches). Fake resolver stands in
    for socket.gethostbyname — the production swap is
    ``urls.set_resolver(socket.gethostbyname)`` once per executor."""
    from incubator_stormcrawler_spark.functions.urls import DnsCache

    calls = []

    def fake_resolver(host):
        calls.append(host)
        if host == "down.example":
            raise OSError("NXDOMAIN")
        return "10.0.0." + str(len(host) % 250)

    cache = DnsCache(resolver=fake_resolver, ttl=3600, error_ttl=60)
    ip = partition_key("https://x.com/a", "byIP", dns_cache=cache)
    assert ip == "10.0.0.5"
    # second URL, same host: served from cache, resolver not re-invoked
    assert partition_key("https://x.com/b", "byIP", dns_cache=cache) == ip
    assert calls == ["x.com"]
    # metadata ip still wins over the resolver (reference order)
    assert (
        partition_key("https://x.com/", "byIP", {"ip": "9.9.9.9"},
                      dns_cache=cache)
        == "9.9.9.9"
    )
    # resolution failure: negative-cached, degrades to host partitioning
    assert partition_key("https://down.example/", "byIP",
                         dns_cache=cache) == "down.example"
    assert partition_key("https://down.example/x", "byIP",
                         dns_cache=cache) == "down.example"
    assert calls.count("down.example") == 1  # error TTL suppressed retry


def test_dns_cache_ttl_expiry_and_no_resolver():
    from incubator_stormcrawler_spark.functions.urls import DnsCache

    calls = []
    cache = DnsCache(resolver=lambda h: (calls.append(h) or "1.1.1.1"),
                     ttl=100)
    assert cache.resolve("a.com", now=0.0) == "1.1.1.1"
    assert cache.resolve("a.com", now=50.0) == "1.1.1.1"   # cached
    assert calls == ["a.com"]
    assert cache.resolve("a.com", now=150.0) == "1.1.1.1"  # expired → re-resolve
    assert calls == ["a.com", "a.com"]
    # no resolver installed: byIP degrades to host (sandbox default)
    nores = DnsCache(resolver=None)
    assert partition_key("https://y.org/", "byIP", dns_cache=nores) == "y.org"


def test_pld():
    assert paid_level_domain("www.example.com") == "example.com"
    assert paid_level_domain("deep.sub.example.co.uk") == "example.co.uk"
    assert paid_level_domain("example.org") == "example.org"
