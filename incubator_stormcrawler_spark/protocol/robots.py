"""robots.txt rules — RobotRulesParser / HttpRobotRulesParser
(core/.../protocol/RobotRulesParser.java:44-52,160-165;
protocol/HttpRobotRulesParser.java:38; config crawler-default.yaml:141-167).

RFC 9309 subset: user-agent group matching (longest agent-token match, ``*``
fallback), Allow/Disallow longest-path-match precedence, ``Crawl-delay``,
``Sitemap:`` collection. Response-code policy: 2xx parse, 403 → allow-all
(configurable ``http.robots.403.allow``), 404 → allow-all, 5xx → defer
(treated deny-all here, matching the conservative 5xx policy).

Executor-side caching: ``RobotsCache`` is a per-process TTL cache (the
reference's 6 h rules / 1 h error Caffeine caches). In batch generations the
cache lives for the executor's lifetime — same effect, no wall-clock
dependency in tests (inject ``clock``).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from urllib.parse import urlsplit, unquote


@dataclass
class RobotRules:
    allow_all: bool = False
    deny_all: bool = False
    rules: list[tuple[bool, str]] = field(default_factory=list)  # (allow, path)
    crawl_delay: float | None = None
    sitemaps: list[str] = field(default_factory=list)

    def is_allowed(self, url: str) -> bool:
        if self.allow_all:
            return True
        if self.deny_all:
            return False
        try:
            sp = urlsplit(url)
            path = unquote(sp.path) or "/"
            if sp.query:
                path += "?" + sp.query
        except ValueError:
            return False
        best: tuple[int, bool] | None = None
        for allow, rule_path in self.rules:
            if _path_matches(rule_path, path):
                key = (len(rule_path), allow)
                # longest match wins; tie → allow wins (RFC 9309 §2.2.2)
                if best is None or key > best:
                    best = key
        return True if best is None else best[1]


def _path_matches(pattern: str, path: str) -> bool:
    """'*' wildcard and '$' end-anchor support (Google/RFC 9309 extension)."""
    if not pattern:
        return True
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = pattern.split("*")
    pos = 0
    for i, part in enumerate(parts):
        if i == 0:
            if not path.startswith(part):
                return False
            pos = len(part)
        else:
            idx = path.find(part, pos)
            if idx == -1:
                return False
            pos = idx + len(part)
    if anchored:
        return pos == len(path) if not pattern.endswith("*") else True
    return True


ALLOW_ALL = RobotRules(allow_all=True)
DENY_ALL = RobotRules(deny_all=True)


def parse_robots_txt(content: str, agent_names: list[str]) -> RobotRules:
    """Parse robots.txt for the given agent names (first match priority,
    then the ``*`` group) — SimpleRobotRulesParser behavior the reference
    delegates to crawler-commons for (RobotRulesParser.java:160-165)."""
    agent_names = [a.lower() for a in agent_names]
    groups: list[tuple[list[str], list[tuple[bool, str]], float | None]] = []
    sitemaps: list[str] = []

    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    cur_delay: float | None = None
    seen_rule = False

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay, seen_rule
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay, seen_rule = [], [], None, False

    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if seen_rule:
                flush()
            cur_agents.append(value.lower())
        elif key in ("allow", "disallow"):
            seen_rule = True
            if key == "disallow" and value == "":
                continue  # empty disallow = allow everything
            cur_rules.append((key == "allow", value))
        elif key == "crawl-delay":
            seen_rule = True
            try:
                cur_delay = float(value)
            except ValueError:
                pass
        elif key == "sitemap":
            sitemaps.append(value)
    flush()

    def pick() -> tuple[list[tuple[bool, str]], float | None] | None:
        # longest agent-token substring match over our names, then '*'
        best = None
        for agents, rules, delay in groups:
            for a in agents:
                for name in agent_names:
                    if a != "*" and (a in name or name in a):
                        if best is None or len(a) > best[0]:
                            best = (len(a), rules, delay)
        if best:
            return best[1], best[2]
        for agents, rules, delay in groups:
            if "*" in agents:
                return rules, delay
        return None

    picked = pick()
    rr = RobotRules()
    rr.sitemaps = sitemaps
    if picked is None:
        rr.allow_all = True
        return rr
    rr.rules, rr.crawl_delay = picked
    if not rr.rules and rr.crawl_delay is None:
        rr.allow_all = True
    return rr


def rules_from_response(
    status_code: int,
    body: str | None,
    agent_names: list[str],
    allow_403: bool = True,
) -> RobotRules:
    """HTTP response-code policy (HttpRobotRulesParser.java:38 doc;
    crawler-default.yaml:141-145)."""
    if 200 <= status_code < 300 and body is not None:
        return parse_robots_txt(body, agent_names)
    if status_code == 403:
        return ALLOW_ALL if allow_403 else DENY_ALL
    if 400 <= status_code < 500:
        return ALLOW_ALL
    return DENY_ALL  # 5xx: conservative deny (reference defers/errors)


class RobotsCache:
    """TTL'd per-process cache: 6 h rules / 1 h errors, 10k entries
    (crawler-default.yaml:166-167). ``clock`` injectable for deterministic
    tests; eviction is FIFO-ish on overflow (plenty for executor locality).
    """

    def __init__(
        self,
        fetch_fn,
        agent_names: list[str],
        rules_ttl: float = 6 * 3600,
        error_ttl: float = 3600,
        max_entries: int = 10_000,
        clock=time.monotonic,
    ):
        self.fetch_fn = fetch_fn  # host -> (status_code, body|None)
        self.agent_names = agent_names
        self.rules_ttl = rules_ttl
        self.error_ttl = error_ttl
        self.max_entries = max_entries
        self.clock = clock
        self._cache: dict[str, tuple[float, RobotRules]] = {}

    def get_cached(self, host: str) -> RobotRules | None:
        """Cache-only lookup (no fetch) — the RobotsFilter's safe mode."""
        hit = self._cache.get(host)
        if hit and hit[0] > self.clock():
            return hit[1]
        return None

    def get(self, host: str) -> RobotRules:
        now = self.clock()
        hit = self._cache.get(host)
        if hit and hit[0] > now:
            return hit[1]
        try:
            status, body = self.fetch_fn(host)
            rules = rules_from_response(status, body, self.agent_names)
            ttl = self.rules_ttl if 200 <= status < 300 else self.error_ttl
        except Exception:
            rules = DENY_ALL
            ttl = self.error_ttl
        if len(self._cache) >= self.max_entries:
            self._cache.pop(next(iter(self._cache)))
        self._cache[host] = (now + ttl, rules)
        return rules
