"""Browser-rendered fetching — the selenium/playwright protocol slot
(core/.../protocol/selenium/RemoteDriverProtocol.java,
external/playwright/.../HttpProtocol.java:51 with its NavigationFilters
hook).

Playwright isn't in this container, so the default construction
import-gates with a clear error. The page-driving logic itself is
driver-agnostic: anything exposing ``new_page(user_agent=...)`` →
page.goto/content/close works, so tests exercise the REAL render path
(status propagation, navigation-filter hook, rendered metadata, error
handling, guaranteed page close) against a fake driver — the same pattern
as the reference's RemoteDriverProtocolTest against a stub grid. The
``navigation_filter`` hook mirrors NavigationFilters: a callable given the
page object before content extraction (scroll, wait, click-consent...).
"""

from __future__ import annotations

import time

from .fetch import Protocol, ProtocolResponse


def _playwright_browser_factory(agent: str):  # pragma: no cover - gated
    from playwright.sync_api import sync_playwright

    pw = sync_playwright().start()
    return pw.chromium.launch(headless=True)


class PlaywrightProtocol(Protocol):
    def __init__(
        self,
        timeout: float = 15.0,
        agent: str = "stormcrawler-spark",
        navigation_filter=None,
        browser_factory=None,
    ):
        if browser_factory is None:
            try:
                from playwright.sync_api import sync_playwright  # noqa: F401
            except ImportError as e:
                raise ImportError(
                    "PlaywrightProtocol requires the 'playwright' package "
                    "(pip install playwright && playwright install chromium);"
                    " use HttpProtocol or DelegatorProtocol routing otherwise"
                ) from e
            browser_factory = _playwright_browser_factory
        self.timeout = timeout
        self.agent = agent
        self.navigation_filter = navigation_filter
        self._browser_factory = browser_factory
        self._browser = None

    def _ensure_browser(self):
        if self._browser is None:
            self._browser = self._browser_factory(self.agent)
        return self._browser

    def get_protocol_output(self, url, metadata):
        browser = self._ensure_browser()
        page = browser.new_page(user_agent=self.agent)
        try:
            resp = page.goto(url, timeout=self.timeout * 1000)
            if self.navigation_filter is not None:
                self.navigation_filter(page)
            content = page.content().encode()
            code = resp.status if resp else -1
            return ProtocolResponse(
                content,
                code,
                {
                    "fetch.statusCode": [str(code)],
                    "_request.time_": [str(int(time.time() * 1000))],
                    "fetch.rendered": ["true"],
                },
            )
        except Exception as e:
            return ProtocolResponse(None, -1, {"error.cause": [str(e)]})
        finally:
            page.close()
