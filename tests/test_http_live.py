"""Live-stub HTTP protocol tests — the reference's WireMock suite
(core/src/test/java/.../bolt/AbstractFetcherBoltTest.java:43) ported to an
in-process http.server. These exercise the REAL ``HttpProtocol`` (urllib
path), not MemoryProtocol: content limit + ``http.trimmed`` metadata,
304 → FETCHED, 3xx Location surfaced as ``_redirTo`` (NOT silently
followed), 4xx/5xx → FETCH_ERROR, and robots.txt retrieval."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from incubator_stormcrawler_spark.protocol.fetch import (
    HttpProtocol,
    fetch_partition,
    status_from_http_code,
)
from incubator_stormcrawler_spark.protocol.robots import RobotsCache

BODY = b"<html><body>" + b"x" * 2000 + b"</body></html>"


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # keep test output clean
        pass

    def do_GET(self):
        if self.path == "/ok":
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.end_headers()
            self.wfile.write(BODY)
        elif self.path == "/redirect":
            self.send_response(301)
            self.send_header("Location", "/target")
            self.end_headers()
        elif self.path == "/redirect-absolute":
            self.send_response(302)
            self.send_header("Location", "https://other.example/landing")
            self.end_headers()
        elif self.path == "/notmodified":
            self.send_response(304)
            self.end_headers()
        elif self.path == "/missing":
            self.send_response(404)
            self.end_headers()
        elif self.path == "/boom":
            self.send_response(503)
            self.end_headers()
        elif self.path == "/robots.txt":
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.end_headers()
            self.wfile.write(b"User-agent: *\nDisallow: /private/\n")
        else:
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"other")


@pytest.fixture(scope="module")
def server():
    httpd = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_fetch_ok_with_headers(server):
    proto = HttpProtocol()
    resp = proto.get_protocol_output(f"{server}/ok", {})
    assert resp.status_code == 200
    assert resp.content == BODY
    assert resp.metadata["fetch.statusCode"] == ["200"]
    assert "text/html" in resp.metadata["http.content-type"][0]
    assert "http.trimmed" not in resp.metadata


def test_content_limit_sets_trimmed_metadata(server):
    """okhttp/HttpProtocol.java:368-426: partial content keeps
    http.trimmed + http.trimmed.reason=LENGTH."""
    proto = HttpProtocol(content_limit=100)
    resp = proto.get_protocol_output(f"{server}/ok", {})
    assert resp.status_code == 200
    assert len(resp.content) == 100
    assert resp.content == BODY[:100]
    assert resp.metadata["http.trimmed"] == ["true"]
    assert resp.metadata["http.trimmed.reason"] == ["LENGTH"]


def test_304_maps_to_fetched(server):
    proto = HttpProtocol()
    resp = proto.get_protocol_output(f"{server}/notmodified", {})
    assert resp.status_code == 304
    assert status_from_http_code(resp.status_code) == "FETCHED"


def test_redirect_not_followed_and_location_surfaced(server):
    """3xx must surface REDIRECTION + the resolved Location target
    (reference protocols run with followRedirects(false)); the target is
    NOT fetched here — it re-enters through status merge + filters."""
    proto = HttpProtocol()
    resp = proto.get_protocol_output(f"{server}/redirect", {})
    assert resp.status_code == 301
    assert resp.content is None  # did not follow
    assert status_from_http_code(resp.status_code) == "REDIRECTION"
    assert resp.metadata["_redirTo"] == [f"{server}/target"]  # urljoin'd


def test_redirect_absolute_location(server):
    proto = HttpProtocol()
    resp = proto.get_protocol_output(f"{server}/redirect-absolute", {})
    assert resp.status_code == 302
    assert resp.metadata["_redirTo"] == ["https://other.example/landing"]


def test_404_and_5xx_are_retryable(server):
    proto = HttpProtocol()
    for path, code in [("/missing", 404), ("/boom", 503)]:
        resp = proto.get_protocol_output(f"{server}{path}", {})
        assert resp.status_code == code
        assert status_from_http_code(code) == "FETCH_ERROR"


def test_connection_error_is_fetch_error():
    proto = HttpProtocol(timeout=0.5)
    resp = proto.get_protocol_output("http://127.0.0.1:1/nope", {})
    assert resp.status_code == -1
    assert resp.metadata["error.cause"]
    assert status_from_http_code(-1) == "FETCH_ERROR"


def test_robots_fetch_and_deny(server):
    host = server.split("//")[1]
    proto = HttpProtocol()
    code, body = proto.get_robots(host)
    assert code == 200 and "Disallow: /private/" in body


def test_fetch_partition_over_live_http(server):
    """End-to-end: the politeness fetcher drives HttpProtocol against the
    live stub — robots honored, redirect surfaced, 404 retryable."""
    host = server.split("//")[1]
    proto = HttpProtocol()
    cache = RobotsCache(proto.get_robots, ["stormcrawler-spark"])
    urls = [f"{server}/ok", f"{server}/redirect", f"{server}/missing",
            f"{server}/private/secret"]
    results = {r.url: r for r in fetch_partition(
        [(u, host) for u in urls], proto, server_delay=0.0,
        robots_cache=cache, respect_robots=True,
    )}
    assert results[f"{server}/ok"].status == "FETCHED"
    assert results[f"{server}/ok"].content == BODY
    red = results[f"{server}/redirect"]
    assert red.status == "REDIRECTION" and red.redirect_to == f"{server}/target"
    assert results[f"{server}/missing"].status == "FETCH_ERROR"
    denied = results[f"{server}/private/secret"]
    assert denied.status == "ERROR" and denied.error_cause == "robots.txt"
