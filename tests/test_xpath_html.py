"""HTML XPathFilter tests — the reference's own expressions
(core/src/test/resources/test.parsefilters.json + XPathFilterTest.java)
evaluated against real non-well-formed HTML."""

from __future__ import annotations

from incubator_stormcrawler_spark.parse.xpath_html import (
    evaluate_xpath,
    parse_html_dom,
    xpath_extract_html,
)

HTML = b"""<!DOCTYPE html>
<html><head>
<title>Storm Crawler</title>
<meta name="keywords" content="crawler,storm,spark">
<script type="text/javascript"></script>
<script type="text/javascript">var _paq = _paq || [];</script>
</head>
<body>
<span class="concept">alpha</span>
<p>intro paragraph
<p>second paragraph without close tags
<div class="concept">beta</div>
<ul><li>one<li>two<li>three</ul>
<img src="x.png">
<a href="/next">next page</a>
</body></html>"""


def dom():
    return parse_html_dom(HTML)


def test_descendant_tag_with_class_predicate():
    # //SPAN[@class="concept"] — test.parsefilters.json "concept"
    assert evaluate_xpath(dom(), '//SPAN[@class="concept"]') == ["alpha"]


def test_star_with_class_predicate():
    # //*[@class="concept"] — "concept2"
    assert evaluate_xpath(dom(), '//*[@class="concept"]') == ["alpha", "beta"]


def test_script_type_predicate_nodeset():
    # //SCRIPT[@type='text/javascript'] — two scripts, first empty,
    # second contains _paq (XPathFilterTest.testScriptExtraction)
    scripts = evaluate_xpath(dom(), "//SCRIPT[@type='text/javascript']")
    assert len(scripts) == 2
    assert scripts[0].strip() == ""
    assert "_paq" in scripts[1]


def test_meta_attribute_selection():
    # //META[@name="keywords"]/@content
    got = evaluate_xpath(dom(), '//META[@name="keywords"]/@content')
    assert got == ["crawler,storm,spark"]


def test_title_and_string_mode():
    assert evaluate_xpath(dom(), "//TITLE") == ["Storm Crawler"]
    assert evaluate_xpath(dom(), "string(//TITLE)") == ["Storm Crawler"]


def test_serialize_mode():
    out = evaluate_xpath(dom(), 'serialize(//SPAN[@class="concept"])')
    assert out == ['<span class="concept">alpha</span>']


def test_child_axis_and_position():
    assert evaluate_xpath(dom(), "/html/head/title") == ["Storm Crawler"]
    assert evaluate_xpath(dom(), "//li[2]") == ["two"]


def test_implied_close_tags():
    # html.parser alone would nest the <p>s; the builder auto-closes them
    assert evaluate_xpath(dom(), "//p") == [
        "intro paragraph", "second paragraph without close tags",
    ]


def test_attr_presence_predicate():
    assert evaluate_xpath(dom(), "//a[@href]") == ["next page"]
    assert evaluate_xpath(dom(), "//a/@href") == ["/next"]


def test_no_match_returns_empty():
    assert evaluate_xpath(dom(), "//article") == []
    assert evaluate_xpath(dom(), "string(//article)") == [""]


def test_spark_stage(spark):
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [
            Row(url="https://a.example/1", content=bytearray(HTML)),
            Row(url="https://a.example/2",
                content=bytearray(b"<html><body>no concepts</body></html>")),
        ]
    )
    out = xpath_extract_html(
        docs,
        {
            "concept": '//*[@class="concept"]',
            "keywords": '//META[@name="keywords"]/@content',
            "title": "string(//TITLE)",
        },
    )
    rows = {r.url: r for r in out.collect()}
    r1 = rows["https://a.example/1"]
    assert list(r1.concept) == ["alpha", "beta"]
    assert list(r1.keywords) == ["crawler,storm,spark"]
    assert list(r1.title) == ["Storm Crawler"]
    r2 = rows["https://a.example/2"]
    assert list(r2.concept) == [] and list(r2.title) == [""]
