"""robots.txt parsing — politeness inputs for the frontier (SURVEY S5).

The reference only reads ``Sitemap:`` lines
(``crawler/web_crawler.py:872-885``) and never applies politeness rules;
this engine's north star extends that: per-host ``Disallow`` prefixes
and ``Crawl-delay`` budgets are parsed here and fed to
``pipelines.oracle.admit_links`` (disallow filtering) and the crawl
workers' per-host pacing clocks (``CrawlConfig.host_delays_ms``).

Parsing follows the common subset of the robots exclusion protocol:
user-agent groups, ``*`` matched as our agent, first matching group
wins; only prefix-style Disallow rules (no wildcards) are honored —
unsupported patterns are ignored conservatively (treated as allowed),
which is the reference-compatible behavior of not over-blocking.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class RobotsPolicy:
    disallow: list[str] = field(default_factory=list)
    crawl_delay_ms: int = 0
    sitemaps: list[str] = field(default_factory=list)


def parse_robots_txt(text: str, agent: str = "*") -> RobotsPolicy:
    """Parse one robots.txt body into the policy for ``agent``.

    Groups are ``User-agent`` runs; the group matching our agent (exact,
    else ``*``) supplies Disallow + Crawl-delay. ``Sitemap:`` lines are
    global per the spec.
    """
    policy = RobotsPolicy()
    groups: list[tuple[list[str], list[str], float | None]] = []
    cur_agents: list[str] = []
    cur_disallow: list[str] = []
    cur_delay: float | None = None
    in_group_body = False

    def flush() -> None:
        nonlocal cur_agents, cur_disallow, cur_delay, in_group_body
        if cur_agents:
            groups.append((cur_agents, cur_disallow, cur_delay))
        cur_agents, cur_disallow, cur_delay = [], [], None
        in_group_body = False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, value = (p.strip() for p in line.split(":", 1))
        key = key.lower()
        if key == "user-agent":
            if in_group_body:
                flush()
            cur_agents.append(value.lower())
        elif key == "disallow":
            in_group_body = True
            if value and "*" not in value and "$" not in value:
                cur_disallow.append(value)
        elif key == "crawl-delay":
            in_group_body = True
            try:
                cur_delay = float(value)
            except ValueError:
                pass
        elif key == "sitemap":
            if value:
                policy.sitemaps.append(value)
    flush()

    agent = agent.lower()
    chosen = None
    for agents, dis, delay in groups:
        if agent != "*" and agent in agents:
            chosen = (dis, delay)
            break
    if chosen is None:
        for agents, dis, delay in groups:
            if "*" in agents:
                chosen = (dis, delay)
                break
    if chosen:
        policy.disallow = chosen[0]
        if chosen[1] is not None:
            policy.crawl_delay_ms = int(chosen[1] * 1000)
    return policy


def policies_from_robots_bodies(bodies: dict[str, str],
                                agent: str = "*") -> tuple[dict, dict]:
    """host → robots.txt text ⇒ (disallow_by_host, host_delays_ms) —
    the two inputs the crawler consumes."""
    disallow: dict[str, list[str]] = {}
    delays: dict[str, int] = {}
    for host, body in bodies.items():
        p = parse_robots_txt(body, agent)
        if p.disallow:
            disallow[host] = p.disallow
        if p.crawl_delay_ms:
            delays[host] = p.crawl_delay_ms
    return disallow, delays
