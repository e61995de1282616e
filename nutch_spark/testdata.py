"""Deterministic synthetic Common-Crawl-style fixture tables.

Builds the authoritative input shape from BASELINE.json's input_hint —
``pages(url, warc_ts, html, text, lang)`` — plus the companion fixtures
from FIXTURES.md (``http_status``, ``robots``, ``seeds``), fully seeded
and reproducible: same seed → byte-identical tables. No external data.

The page graph mirrors the reference's test site
(src/testresources/fetch-test-site/: index, pagea, pageb, dup_of_pagea,
nested_spider_trap, exception.html, robots.txt) scaled up: a seeded
host set with one hot host (skew), intra-host next/prev chains,
cross-host links, duplicate-content pages (same bytes, different url →
same MD5 signature), a redirect chain, robots-disallowed paths and
crawl-delay hosts.

The golden ``text`` column is produced by the same whitespace-collapse
algorithm as the engine's parser (functions/htmlparse.py) — the
byte-identity contract asserted per url in tests.
"""

from __future__ import annotations

import datetime
import random

import pandas as pd

from .functions.htmlparse import parse_html
from . import schema as S

EPOCH = datetime.datetime(2024, 1, 1)

_WORDS = ("crawl frontier fetch parse score link host page queue delay "
          "robots seed round update merge dedup signature anchor title "
          "index graph rank depth batch shard bloom filter hash bucket "
          "spark arrow column shuffle partition skew salt broadcast").split()


def _host(i: int) -> str:
    return f"host{i:03d}.example.test"


def _url(h: int, p: int) -> str:
    return f"http://{_host(h)}/p{p:04d}.html"


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _page_html(rng: random.Random, title: str, body_words: int,
               links: list[tuple[str, str]], *, nofollow_meta=False,
               noindex_meta=False, base_href=None,
               nofollow_link=None, dup_body=None) -> bytes:
    paras = dup_body if dup_body is not None else [
        _sentence(rng, rng.randint(5, 14)) for _ in range(3)]
    parts = ["<html><head>", f"<title>{title}</title>",
             '<meta charset="utf-8">']
    if base_href:
        parts.append(f'<base href="{base_href}">')
    robots = []
    if noindex_meta:
        robots.append("noindex")
    if nofollow_meta:
        robots.append("nofollow")
    if robots:
        parts.append(f'<meta name="robots" content="{",".join(robots)}">')
    parts.append("</head><body>")
    parts.append("<script>var x = 1; // never extracted</script>")
    parts.append("<style>.c { color: red }</style>")
    for i, p in enumerate(paras):
        parts.append(f"<p>{p}</p>")
        if i < len(links):
            to, anchor = links[i]
            rel = ' rel="nofollow"' if to == nofollow_link else ""
            parts.append(f'<a href="{to}"{rel}>{anchor}</a>')
    for to, anchor in links[len(paras):]:
        rel = ' rel="nofollow"' if to == nofollow_link else ""
        parts.append(f'<a href="{to}"{rel}>{anchor}</a>')
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def build_fixture(n_hosts: int = 12, pages_per_host: int = 8,
                  hot_host_pages: int = 60, seed: int = 42):
    """Build the four fixture tables as pandas DataFrames.

    Returns dict with keys pages, http_status, robots, seeds.
    Deterministic for a given (n_hosts, pages_per_host,
    hot_host_pages, seed).
    """
    rng = random.Random(seed)
    pages, statuses = [], []

    counts = [hot_host_pages] + [pages_per_host] * (n_hosts - 1)
    all_urls = {h: [_url(h, p) for p in range(c)]
                for h, c in enumerate(counts)}

    dup_body = [_sentence(random.Random(seed + 999), 10) for _ in range(3)]

    for h, c in enumerate(counts):
        for p in range(c):
            url = _url(h, p)
            links: list[tuple[str, str]] = []
            # intra-host chain (next / prev)
            if p + 1 < c:
                links.append((f"/p{p + 1:04d}.html", f"next {p + 1}"))
            if p > 0:
                links.append((_url(h, p - 1), f"prev {p - 1}"))
            # cross-host links (seeded)
            for _ in range(rng.randint(0, 2)):
                oh = rng.randrange(n_hosts)
                if oh != h:
                    op = rng.randrange(counts[oh])
                    links.append((_url(oh, op), f"xref {oh} {op}"))
            # host-page flavor flags
            is_dup = (h >= 2 and p == 1)          # same bytes on many hosts
            nofollow_meta = (p == 5 and h % 4 == 1)
            noindex_meta = (p == 6 and h % 5 == 2)
            nofollow_link = links[-1][0] if (links and p % 7 == 3) else None
            if is_dup:
                # byte-identical across hosts (dup_of_pagea.html analog:
                # same title, same body, no host-specific links) so the
                # raw-MD5 signature collides
                html = _page_html(
                    random.Random(seed + 777), "Duplicate Page", 30, [],
                    dup_body=dup_body)
            else:
                html = _page_html(
                    rng, f"Page {h} {p}", rng.randint(20, 60), links,
                    nofollow_meta=nofollow_meta, noindex_meta=noindex_meta,
                    nofollow_link=nofollow_link)
            res = parse_html(html, url)
            pages.append({
                "url": url,
                "warc_ts": EPOCH + datetime.timedelta(
                    seconds=rng.randint(0, 86400)),
                "html": html,
                "text": res.text,
                "lang": rng.choice(["en", "en", "en", "de", "fr"]),
            })
            # protocol outcome distribution
            code = 200
            redirect_to = None
            if p == c - 1 and h % 3 == 0 and c > 2:
                code = 301
                redirect_to = _url(h, 0)
            elif p == c - 2 and h % 5 == 4 and c > 3:
                code = 302
                redirect_to = _url(h, 1)
            elif p == 4 and h % 6 == 3:
                code = 404
            elif p == 3 and h % 7 == 5:
                code = 500
            elif p == 2 and h % 8 == 6:
                code = 304
            statuses.append({
                "url": url, "status_code": code,
                "redirect_to": redirect_to,
                "content_length": len(html),
            })

    # truncated page: advertised length > actual (ParseSegment.java:160-193)
    statuses[5]["content_length"] = len(pages[5]["html"]) + 1000

    robots = []
    for h in range(n_hosts):
        authority = f"http://{_host(h)}"
        if h % 4 == 2:
            body = "User-agent: *\nDisallow: /p0001.html\nDisallow: /private/\n"
        elif h % 6 == 1:
            body = "User-agent: *\nCrawl-delay: 2\nDisallow: /tmp/\n"
        elif h == n_hosts - 1:
            body = "User-agent: *\nCrawl-delay: 45\n"  # > max 30 s → skip host
        else:
            body = None
        code = 200 if body is not None else 404
        if h % 9 == 7:
            code, body = 403, None
        robots.append({"authority": authority, "robots_txt": body,
                       "fetch_code": code})

    seeds = [{"line": f"# seed list (generated, seed={seed})"},
             {"line": ""}]
    for h in range(n_hosts):
        line = _url(h, 0)
        if h == 1:
            line += "\tnutch.score=2.5\tnutch.fetchInterval=86400"
        seeds.append({"line": line})

    return {
        "pages": pd.DataFrame(pages),
        "http_status": pd.DataFrame(statuses),
        "robots": pd.DataFrame(robots),
        "seeds": pd.DataFrame(seeds),
    }


def fixture_dfs(spark, n_hosts: int = 12, pages_per_host: int = 8,
                hot_host_pages: int = 60, seed: int = 42):
    """Spark DataFrames for the fixture tables, explicit schemas."""
    pdfs = build_fixture(n_hosts, pages_per_host, hot_host_pages, seed)
    return {
        "pages": spark.createDataFrame(pdfs["pages"], schema=S.PAGES),
        "http_status": spark.createDataFrame(
            pdfs["http_status"], schema=S.HTTP_STATUS),
        "robots": spark.createDataFrame(pdfs["robots"], schema=S.ROBOTS),
        "seeds": spark.createDataFrame(pdfs["seeds"], "line string"),
    }
