"""Optional URL-normalizer plugins + scope-aware normalizer chains.

Reference plugins (each cited at its function):

* urlnormalizer-querystring — QuerystringURLNormalizer.java
* urlnormalizer-slash      — SlashURLNormalizer.java
* urlnormalizer-host       — HostURLNormalizer.java
* urlnormalizer-ajax       — AjaxURLNormalizer.java
* urlnormalizer-pass       — PassURLNormalizer.java (identity)

and the per-scope chain resolution of URLNormalizers.java:96-170:
``urlnormalizer.order.<scope>`` overrides the default chain, and the
regex normalizer accepts per-scope rule files
(RegexURLNormalizer.java:120-158). Scopes are the SCOPE_* constants
(default, partition, generate_host_count, fetcher, crawldb, linkdb,
inject, outlink, indexer).

All kernels are pure Python (unit-testable) and are composed into one
Arrow-vectorized pandas UDF per chain via :func:`chain_udf` — one
Python worker round per batch regardless of chain length.
"""

from __future__ import annotations

from urllib.parse import unquote

import pandas as pd

from .urls import (
    DEFAULT_REGEX_RULES, normalize_basic, normalize_regex, parse_url,
)

SCOPES = ("default", "partition", "generate_host_count", "fetcher",
          "crawldb", "linkdb", "inject", "outlink", "indexer")


def normalize_pass(url: str, scope: str = "default") -> str:
    """urlnormalizer-pass: identity (PassURLNormalizer.java)."""
    return url


def normalize_querystring(url: str, scope: str = "default") -> str | None:
    """QuerystringURLNormalizer.java:normalize — sort the ``&``-split
    query parts so parameter order never splits the URL-seen set.
    Rebuilds proto://host[:port]path?sorted[#ref]."""
    u = parse_url(url)
    if u is None:
        return None
    if u.query is None:
        return url
    parts = sorted(u.query.split("&"))
    port = f":{u.port}" if u.port > -1 else ""
    ref = f"#{u.ref}" if u.ref is not None else ""
    host = u.host if u.host is not None else ""
    return f"{u.proto}://{host}{port}{u.path}?{'&'.join(parts)}{ref}"


def normalize_slash(url: str, rules: dict[str, bool],
                    scope: str = "default") -> str | None:
    """SlashURLNormalizer.java:normalize — per-host trailing-slash
    policy: rule ``+`` appends a slash to slashless paths (unless the
    last segment looks like a file: a dot within the final 5 chars),
    rule ``-`` strips a trailing slash. Hosts absent from the table
    pass through."""
    u = parse_url(url)
    if u is None:
        return None
    host = u.host
    if host is None or host not in rules:
        return url
    path = u.path
    if len(path) <= 1:
        return url
    rule = rules[host]
    query = f"?{u.query}" if u.query is not None else ""
    trailing = path.endswith("/")
    if not trailing and rule:
        last_dot = path.rfind(".")
        if len(path) < 6 or last_dot == -1 or last_dot < len(path) - 6:
            return f"{u.proto}://{host}{path}/{query}"
    elif trailing and not rule:
        return f"{u.proto}://{host}{path[:-1]}{query}"
    return url


def normalize_host(url: str, rules: dict[str, str],
                   scope: str = "default") -> str | None:
    """HostURLNormalizer.java:normalize — rewrite hosts by exact match
    first, then by ``*.domain`` wildcard walking label-suffixes from
    the TLD leftward (longest first is NOT attempted; the reference
    walks shortest-suffix first via its insert loop)."""
    u = parse_url(url)
    if u is None:
        return None
    host = u.host
    if host is None:
        return url
    if host in rules:
        return url.replace(host, rules[host], 1)
    parts = host.split(".")
    buf = parts[-1]
    for i in range(len(parts) - 2, 0, -1):
        buf = f"{parts[i]}.{buf}"
        wildcard = f"*.{buf}"
        if wildcard in rules:
            return url.replace(host, rules[wildcard], 1)
    return url


def _ajax_escape(fragment: str) -> str:
    """AjaxURLNormalizer.escape: %XX for control bytes and #, %, &, +
    over the UTF-8 encoding (AjaxURLNormalizer.java:86-112)."""
    out = []
    for b in fragment.encode("utf-8"):
        if b < 33:
            out.append(f"%{b:02X}")
        elif b == 0x23:
            out.append("%23")
        elif b == 0x25:
            out.append("%25")
        elif b == 0x26:
            out.append("%26")
        elif b == 0x2B:
            out.append("%2B")
        else:
            out.append(chr(b))
    return "".join(out)


def normalize_ajax(url: str, scope: str = "default") -> str | None:
    """AjaxURLNormalizer.java:normalize — crawler-scope rewrites
    ``#!fragment`` into the Google AJAX-crawling
    ``?_escaped_fragment_=...`` form; indexer scope reverses an
    escaped-fragment URL back to its ``#!`` form."""
    ESCAPED = "_escaped_fragment_="
    if scope == "indexer" and ESCAPED in url:
        u = parse_url(url)
        if u is None or u.query is None:
            return url
        qs = u.query
        amp = qs.find("&")
        if amp == -1:
            kv, qs = qs, ""
        else:
            kv = qs[amp + 1:]
            qs = qs.replace("&" + kv, "", 1)
        kv = kv.replace(ESCAPED, "", 1)
        frag = unquote(kv)
        port = f":{u.port}" if u.port != -1 else ""
        q = f"?{qs}" if qs else ""
        host = u.host if u.host is not None else ""
        return f"{u.proto}://{host}{port}{u.path}{q}#!{frag}"
    if "#!" in url:
        u = parse_url(url)
        if u is None:
            return None
        pos = url.index("#!")
        frag = _ajax_escape(url[pos + 2:])
        sep = "?" if u.query is None else "&"
        return f"{url[:pos]}{sep}_escaped_fragment_={frag}"
    return url


# ---------------------------------------------------------------------------
# Scope-aware chains (URLNormalizers.java:96-170)
# ---------------------------------------------------------------------------

DEFAULT_CHAIN = ("basic", "regex")


def make_normalizer(order: tuple[str, ...] = DEFAULT_CHAIN,
                    scope: str = "default",
                    regex_rules=None,
                    scope_regex_rules: dict | None = None,
                    slash_rules: dict[str, bool] | None = None,
                    host_rules: dict[str, str] | None = None):
    """Build ``url -> normalized | None`` applying the named plugins in
    ``order`` (urlnormalizer.order). The regex step takes per-scope
    rules when ``scope_regex_rules[scope]`` exists, else
    ``regex_rules``, else the default template rules — mirroring
    RegexURLNormalizer's scoped-rule-file lookup."""
    rules = None
    if scope_regex_rules and scope in scope_regex_rules:
        rules = scope_regex_rules[scope]
    elif regex_rules is not None:
        rules = regex_rules

    steps = []
    for name in order:
        if name == "basic":
            steps.append(lambda u, s: normalize_basic(u))
        elif name == "regex":
            steps.append(
                lambda u, s, _r=rules: normalize_regex(u, _r))
        elif name == "querystring":
            steps.append(normalize_querystring)
        elif name == "slash":
            steps.append(
                lambda u, s, _r=(slash_rules or {}): normalize_slash(
                    u, _r, s))
        elif name == "host":
            steps.append(
                lambda u, s, _r=(host_rules or {}): normalize_host(
                    u, _r, s))
        elif name == "ajax":
            steps.append(normalize_ajax)
        elif name == "pass":
            steps.append(normalize_pass)
        else:
            raise ValueError(f"unknown normalizer {name!r}")

    def norm(url: str) -> str | None:
        for step in steps:
            if url is None or url == "":
                return url
            url = step(url, scope)
        return url

    return norm


def normalizer_udf(cfg, scope: str = "default"):
    """The canonicalize UDF a stage should use for ``scope`` under
    ``cfg`` — the per-stage entry point that makes the scope resolution
    of URLNormalizers.java:96-170 real in the pipeline (inject uses
    SCOPE_INJECT, parse outlinks SCOPE_OUTLINK, fetch/meta-refresh
    redirects SCOPE_FETCHER, updatedb SCOPE_CRAWLDB, linkdb
    SCOPE_LINKDB, free-generate SCOPE_INJECT).

    Fast path: a config with no scoped overrides and the stock
    basic→regex chain gets the process-cached default UDF
    (urls.spark_udfs), so default crawls pay zero extra UDF
    construction or closure shipping per stage."""
    scope_orders = dict(cfg.normalizer_scope_orders)
    order = scope_orders.get(scope, cfg.normalizer_order)
    scope_rules = {s: tuple(r) for s, r in cfg.normalizer_scope_regex_rules}
    if (tuple(order) == DEFAULT_CHAIN and scope not in scope_rules
            and not cfg.normalizer_slash_rules
            and not cfg.normalizer_host_rules):
        from .urls import spark_udfs
        return spark_udfs()["canonicalize"]
    return chain_udf(tuple(order), scope,
                     scope_regex_rules=scope_rules or None,
                     slash_rules=dict(cfg.normalizer_slash_rules) or None,
                     host_rules=dict(cfg.normalizer_host_rules) or None)


def chain_udf(order: tuple[str, ...] = DEFAULT_CHAIN,
              scope: str = "default", **kw):
    """Arrow-vectorized pandas UDF for a configured chain — the whole
    chain runs in one Python worker pass per batch."""
    from pyspark.sql.functions import pandas_udf

    norm = make_normalizer(order, scope, **kw)

    @pandas_udf("string")
    def _f(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: norm(u) if u is not None else None)
    return _f
