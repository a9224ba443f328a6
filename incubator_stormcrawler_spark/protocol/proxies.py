"""Proxy management — SingleProxyManager / MultiProxyManager
(core/.../proxy/SingleProxyManager.java, MultiProxyManager.java with
rotation enum RANDOM / ROUND_ROBIN / LEAST_USED).

A manager yields the proxy URL for the next request; the HTTP protocol
plugs it into its opener. RANDOM is made deterministic per (manager seed,
pick counter) so distributed runs are reproducible — at scale each
executor owns an independent rotation, which matches the reference's
per-bolt-instance managers.
"""

from __future__ import annotations

import hashlib


class SingleProxyManager:
    def __init__(self, proxy_url: str):
        self.proxy_url = proxy_url

    def next_proxy(self) -> str:
        return self.proxy_url


class MultiProxyManager:
    MODES = ("ROUND_ROBIN", "RANDOM", "LEAST_USED")

    def __init__(self, proxies: list[str], mode: str = "ROUND_ROBIN",
                 seed: int = 42):
        if mode not in self.MODES:
            raise ValueError(f"unknown rotation mode: {mode}")
        if not proxies:
            raise ValueError("no proxies configured")
        self.proxies = list(proxies)
        self.mode = mode
        self.seed = seed
        self._i = 0
        self.usage = {p: 0 for p in proxies}

    def next_proxy(self) -> str:
        if self.mode == "ROUND_ROBIN":
            p = self.proxies[self._i % len(self.proxies)]
            self._i += 1
        elif self.mode == "RANDOM":
            # deterministic "random": hash of (seed, counter)
            h = hashlib.md5(f"{self.seed}:{self._i}".encode()).digest()
            p = self.proxies[int.from_bytes(h[:4], "big") % len(self.proxies)]
            self._i += 1
        else:  # LEAST_USED
            p = min(self.proxies, key=lambda x: (self.usage[x], x))
        self.usage[p] += 1
        return p
