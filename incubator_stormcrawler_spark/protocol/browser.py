"""Browser-rendered fetching — the selenium/playwright protocol slot
(core/.../protocol/selenium/*, external/playwright/.../HttpProtocol.java:51
with its NavigationFilters hook).

Playwright isn't in this container, so the class import-gates: with the
library present it renders pages headlessly (returning post-JS DOM bytes);
without it, construction raises a clear error. The ``navigation_filter``
hook mirrors the reference's NavigationFilters: a callable given the page
object before content extraction (scroll, wait, click-consent...).
"""

from __future__ import annotations

import time

from .fetch import Protocol, ProtocolResponse


class PlaywrightProtocol(Protocol):
    def __init__(
        self,
        timeout: float = 15.0,
        agent: str = "stormcrawler-spark",
        navigation_filter=None,
    ):
        try:
            from playwright.sync_api import sync_playwright  # noqa: F401
        except ImportError as e:  # pragma: no cover - not in container
            raise ImportError(
                "PlaywrightProtocol requires the 'playwright' package "
                "(pip install playwright && playwright install chromium); "
                "use HttpProtocol or DelegatorProtocol routing otherwise"
            ) from e
        self.timeout = timeout
        self.agent = agent
        self.navigation_filter = navigation_filter
        self._pw = None
        self._browser = None

    def _ensure_browser(self):  # pragma: no cover - needs playwright
        if self._browser is None:
            from playwright.sync_api import sync_playwright

            self._pw = sync_playwright().start()
            self._browser = self._pw.chromium.launch(headless=True)
        return self._browser

    def get_protocol_output(self, url, metadata):  # pragma: no cover
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
