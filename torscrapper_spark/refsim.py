"""Pure-Python wave-synchronous reference crawl simulator (golden oracle).

Re-implements the reference's Fresh-Onions-style fetch-parse-extract loop
(BASELINE.json:6; SURVEY.md §3.1) with the exact semantics the Spark
engine must reproduce (BASELINE.json:14 — same seed list + politeness
budget ⇒ identical crawl ordering and final URL-seen set):

  * seeds are canonicalized in seq order, deduped keep-first, and added
    to the seen set; robots-allowed ones enter the frontier at depth 0
  * each wave, frontier URLs are ordered by the total priority order
    (depth asc, discovered_wave asc, url asc) and each domain fetches at
    most its politeness budget; selected URLs form the wave's trace in
    global priority order (seq is 1-based within the wave)
  * fetch = lookup in the synthetic pagestore (miss ⇒ status 404)
  * links are regex-extracted from fetched html, canonicalized, grouped
    by canonical URL keeping MIN depth (parent depth + 1) — this makes
    in-wave dedup order-independent
  * a link already in seen is skipped; otherwise it is added to seen
    (even when robots-disallowed) and, if robots-allowed, inserted into
    the frontier with discovered_wave = wave + 1
  * URLs not selected (budget exhausted) stay in the frontier

Shared kernels: canonicalization and href extraction come from
``functions.urls`` — the SAME code the Spark pandas UDFs run — so the
two implementations cannot drift.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd

from .fixtures import DEFAULT_BUDGET
from .functions.urls import (
    HREF_RE,
    canonicalize_series,
    domain_series,
    path_of,
    robots_disallowed,
)


@dataclass
class SimResult:
    trace: pd.DataFrame        # (wave int, seq int64, url str, depth int, status int)
    seen: set                  # canonical URLs ever discovered
    wave_stats: pd.DataFrame   # (wave, fetched, ok, missing, links_new)


def _priority_key(entry):
    # entry = (url, depth, discovered_wave)
    return (entry[1], entry[2], entry[0])


def simulate(
    pagestore: pd.DataFrame,
    seeds: pd.DataFrame,
    robots: pd.DataFrame,
    politeness: pd.DataFrame,
    max_waves: int = 8,
    default_budget: int = DEFAULT_BUDGET,
) -> SimResult:
    pages = {
        r.url: r.html for r in pagestore[["url", "html"]].itertuples(index=False)
    }
    robots_map = {
        r.domain: list(r.disallow)
        for r in robots.itertuples(index=False)
    }
    budget_map = {
        r.domain: int(r.budget_per_wave) for r in politeness.itertuples(index=False)
    }
    href_re = re.compile(HREF_RE)

    seen: set = set()
    frontier: list = []  # (url, depth, discovered_wave)

    def allowed_batch(urls: list) -> list:
        # one vectorized domain_series call per BATCH of URLs — the
        # old per-URL wrapper built a one-element Series per call,
        # tens of thousands of single-row pandas round trips per
        # simulate() on the larger fixture tiers (code-review r5)
        if not urls:
            return []
        doms = domain_series(pd.Series(urls))
        return [
            not robots_disallowed(path_of(u), robots_map.get(d))
            for u, d in zip(urls, doms)
        ]

    # --- seeds (wave 0 frontier) ---
    canon_seeds = list(canonicalize_series(seeds.sort_values("seq")["url"]))
    seed_ok = dict(zip(canon_seeds, allowed_batch(canon_seeds)))
    for u in canon_seeds:
        if u in seen:
            continue
        seen.add(u)
        if seed_ok[u]:
            frontier.append((u, 0, 0))

    trace_rows = []
    stats_rows = []
    wave = 0
    while frontier and wave < max_waves:
        ordered = sorted(frontier, key=_priority_key)
        taken_per_domain: dict = {}
        selected = []
        doms = domain_series(pd.Series([e[0] for e in ordered]))
        for entry, dom in zip(ordered, doms):
            b = budget_map.get(dom, default_budget)
            if taken_per_domain.get(dom, 0) < b:
                taken_per_domain[dom] = taken_per_domain.get(dom, 0) + 1
                selected.append(entry)
        sel_set = {e[0] for e in selected}
        frontier = [e for e in frontier if e[0] not in sel_set]

        # trace in global priority order, seq 1-based
        ok = missing = 0
        wave_links: list = []  # (raw_href, parent_depth)
        for seq, (url, depth, _dw) in enumerate(
            sorted(selected, key=_priority_key), start=1
        ):
            html = pages.get(url)
            status = 200 if html is not None else 404
            if html is not None:
                ok += 1
                for href in href_re.findall(html):
                    wave_links.append((href, depth + 1))
            else:
                missing += 1
            trace_rows.append((wave, seq, url, depth, status))

        # canonicalize + in-wave dedup keeping min depth (order-independent)
        new_count = 0
        if wave_links:
            raw = pd.Series([h for h, _ in wave_links])
            canon = canonicalize_series(raw)
            depth_by_url: dict = {}
            for u, (_h, d) in zip(canon, wave_links):
                if u not in depth_by_url or d < depth_by_url[u]:
                    depth_by_url[u] = d
            fresh = [u for u in sorted(depth_by_url) if u not in seen]
            seen.update(fresh)
            new_count = len(fresh)
            for u, a in zip(fresh, allowed_batch(fresh)):
                if a:
                    frontier.append((u, depth_by_url[u], wave + 1))
        stats_rows.append((wave, len(selected), ok, missing, new_count))
        wave += 1

    trace = pd.DataFrame(
        trace_rows, columns=["wave", "seq", "url", "depth", "status"]
    )
    if len(trace):
        trace["wave"] = trace["wave"].astype("int32")
        trace["seq"] = trace["seq"].astype("int64")
        trace["depth"] = trace["depth"].astype("int32")
        trace["status"] = trace["status"].astype("int32")
    stats = pd.DataFrame(
        stats_rows, columns=["wave", "fetched", "ok", "missing", "links_new"]
    )
    return SimResult(trace=trace, seen=seen, wave_stats=stats)
