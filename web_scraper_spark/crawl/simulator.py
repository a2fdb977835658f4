"""Pure-Python sequential crawl simulator — the ordering / seen-set
oracle for parity tests.

Models the reference's strictly sequential per-URL loop
(contxt/cli.py:276-307) extended with the same politeness and
expansion rules the Spark engine applies: per-host crawl-delay on a
virtual clock, per-host round quota, ignore patterns, robots disallow
prefixes, max depth, first-seen URL dedup, and link discovery in
document order.

Parity contract (BASELINE.md): for the same seed list + politeness
budget, the Spark engine must produce (a) the identical final URL-seen
set, and (b) the identical per-host processing order. The global
interleaving across hosts is an artifact of sequential execution the
distributed engine intentionally does not reproduce — per-host order
is the politeness-meaningful total order (documented deviation).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urlparse


@dataclass
class SimConfig:
    crawl_delay_ms: dict[str, int] = field(default_factory=dict)
    default_delay_ms: int = 1000
    quota_per_host: int = 256
    max_depth: int = 2
    ignore_patterns: list[str] = field(default_factory=list)
    disallow: dict[str, list[str]] = field(default_factory=dict)
    round_budget_ms: int | None = None


def simulate_crawl(
    seed_urls: list[str],
    page_links: dict[str, list[str]],
    cfg: SimConfig,
    n_rounds: int = 1,
) -> dict:
    """Run the sequential reference-semantics crawl.

    page_links: url -> document-order outlinks (the fetch corpus).
    Returns {"order": [(round, url)...], "per_host": {host: [url...]},
    "seen": set, "rounds": [...per-round scheduled lists...]}.
    """
    seen: set[str] = set()
    order: list[tuple[int, str]] = []
    per_host: dict[str, list[str]] = {}
    rounds: list[list[str]] = []
    carry_ms: dict[str, int] = {}  # politeness virtual-clock carry-over

    frontier: list[tuple[float, int, str, int]] = []  # (priority, seq, url, depth)
    for i, u in enumerate(seed_urls):
        frontier.append((float(i), i, u, 0))

    for rnd in range(n_rounds):
        # filters, in the engine's order
        candidates = []
        for prio, seq, url, depth in frontier:
            if depth > cfg.max_depth:
                continue
            p = urlparse(url)
            if not (p.scheme and p.netloc):
                continue
            if any(pat in url for pat in cfg.ignore_patterns):
                continue
            if any(p.path.startswith(pre) for pre in cfg.disallow.get(p.netloc, [])):
                continue
            if url in seen:
                continue
            candidates.append((prio, seq, url, depth))

        # per-host queues in (priority, seq) order, quota-trimmed
        by_host: dict[str, list] = {}
        for prio, seq, url, depth in sorted(candidates, key=lambda t: (t[0], t[1])):
            by_host.setdefault(urlparse(url).netloc, []).append((prio, seq, url, depth))
        scheduled = []
        deferred = []
        for host, items in by_host.items():
            take = items[: cfg.quota_per_host]
            rest = items[cfg.quota_per_host:]
            if cfg.round_budget_ms is not None:
                # per-host virtual clock with carry-over: offsets start
                # at the previous round's overflow; rows whose start
                # exceeds the budget are deferred — the engine's
                # politeness rule (crawl/politeness.py)
                delay = cfg.crawl_delay_ms.get(host, cfg.default_delay_ms)
                start = carry_ms.get(host, 0)
                fit = 0
                t = start
                while fit < len(take) and t <= cfg.round_budget_ms:
                    fit += 1
                    t += delay
                rest = take[fit:] + rest
                take = take[:fit]
                if take:
                    end = start + fit * delay
                    carry_ms[host] = max(end - cfg.round_budget_ms, 0)
            scheduled.extend(take)
            deferred.extend(rest)

        # sequential processing in (priority, seq) order — the
        # reference's loop order restricted to this round's schedule
        scheduled.sort(key=lambda t: (t[0], t[1]))
        round_urls = []
        discovered: dict[str, tuple[float, int, int]] = {}
        for prio, seq, url, depth in scheduled:
            seen.add(url)
            order.append((rnd, url))
            per_host.setdefault(urlparse(url).netloc, []).append(url)
            round_urls.append(url)
            for pos, link in enumerate(page_links.get(url, [])):
                if link in seen or link in discovered:
                    continue
                discovered[link] = (float(seq) * 10000.0 + pos, depth + 1, pos)
        rounds.append(round_urls)

        # next frontier: deferred + discovered (first discovery wins)
        frontier = [(p, s, u, d) for p, s, u, d in deferred]
        for link, (prio, depth, _pos) in discovered.items():
            # seq for discovered links is their stable identity; the
            # engine uses xxhash64(url) — ordering only ever compares
            # (priority, seq), and priorities here are unique per
            # (parent, pos), so any deterministic per-url value works.
            frontier.append((prio, hash(link) & 0x7FFFFFFF, link, depth))
        if not frontier:
            break

    return {"order": order, "per_host": per_host, "seen": seen, "rounds": rounds}
