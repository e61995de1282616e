"""robots.txt evaluation as data.

The reference fetches ``/robots.txt`` per authority, caches parsed
rules per ``proto://host:port``, and consults them per URL
(HttpRobotRulesParser.java:87-166, RobotRulesParser.java:101-129). Here
robots bodies are rows of a small table keyed by authority; parsing
happens once per authority inside an Arrow-batched pandas UDF, and the
rules table is **broadcast-joined** to the fetchlist so evaluation is a
map-side operation with no shuffle.

Matching semantics follow crawler-commons' SimpleRobotRules as used by
the reference: agent-specific group preferred over ``*``; within the
group, longest-path rule wins, Allow wins ties; ``Crawl-delay`` (in
seconds) is honored; fetch code 403 → allow-all iff
``http.robots.403.allow`` (HttpRobotRulesParser.java:137-147), ≥500 →
allow-all, absent body → allow-all.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (BooleanType, LongType, StructField, StructType)


class RobotRules:
    __slots__ = ("mode", "rules", "crawl_delay_ms")

    ALLOW_ALL = "allow_all"
    DENY_ALL = "deny_all"
    RULES = "rules"

    def __init__(self, mode, rules=None, crawl_delay_ms=None):
        self.mode = mode
        self.rules = rules or []          # list[(allow: bool, path: str)]
        self.crawl_delay_ms = crawl_delay_ms

    def is_allowed(self, path: str) -> bool:
        if self.mode == RobotRules.ALLOW_ALL:
            return True
        if self.mode == RobotRules.DENY_ALL:
            return False
        best_len, best_allow = -1, True
        for allow, rule_path in self.rules:
            if _path_matches(rule_path, path):
                ln = len(rule_path)
                if ln > best_len or (ln == best_len and allow):
                    best_len, best_allow = ln, allow
        return best_allow


def _path_matches(rule: str, path: str) -> bool:
    """Prefix match with ``*`` wildcard and ``$`` end anchor."""
    if not rule:
        return False
    if "*" in rule or rule.endswith("$"):
        pat = re.escape(rule).replace(r"\*", ".*")
        if pat.endswith(r"\$"):
            pat = pat[:-2] + "$"
        return re.match(pat, path) is not None
    return path.startswith(rule)


def parse_robots(body: str | None, agent: str, fetch_code: int = 200,
                 allow_403: bool = True) -> RobotRules:
    if fetch_code == 403:
        return RobotRules(RobotRules.ALLOW_ALL if allow_403
                          else RobotRules.DENY_ALL)
    if fetch_code >= 500 or body is None:
        return RobotRules(RobotRules.ALLOW_ALL)

    agent = agent.lower()
    groups: dict[str, tuple[list, list]] = {}  # agent -> (rules, delays)
    cur_agents: list[str] = []
    last_was_agent = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not last_was_agent:
                cur_agents = []
            cur_agents.append(val.lower())
            for a in cur_agents:
                groups.setdefault(a, ([], []))
            last_was_agent = True
        elif key in ("allow", "disallow"):
            last_was_agent = False
            for a in cur_agents:
                if val or key == "allow":
                    groups[a][0].append((key == "allow", val))
                # "Disallow:" with empty value = allow all (no rule)
        elif key == "crawl-delay":
            last_was_agent = False
            try:
                delay = float(val)
                for a in cur_agents:
                    groups[a][1].append(delay)
            except ValueError:
                pass
        else:
            last_was_agent = False

    chosen = None
    for a, g in groups.items():
        if a != "*" and (a in agent or agent in a):
            chosen = g
            break
    if chosen is None:
        chosen = groups.get("*")
    if chosen is None:
        return RobotRules(RobotRules.ALLOW_ALL)
    rules, delays = chosen
    delay_ms = int(delays[0] * 1000) if delays else None
    return RobotRules(RobotRules.RULES, rules, delay_ms)


@lru_cache(maxsize=4096)
def _cached_rules(body, agent, fetch_code, allow_403):
    return parse_robots(body, agent, fetch_code, allow_403)


ROBOTS_EVAL_SCHEMA = StructType([
    StructField("robots_allowed", BooleanType(), False),
    StructField("robots_delay_ms", LongType(), True),
])


def robots_eval_udf(agent: str, allow_403: bool = True):
    """pandas UDF: (url, robots_txt, fetch_code) → struct(allowed,
    crawl_delay_ms). Parsed rules are cached per distinct body within
    the Arrow batch (reference caches per authority,
    HttpRobotRulesParser.java:93-100)."""
    from pyspark.sql.functions import pandas_udf

    from .urls import parse_url

    @pandas_udf(ROBOTS_EVAL_SCHEMA)
    def _eval(urls: pd.Series, bodies: pd.Series,
              codes: pd.Series) -> pd.DataFrame:
        allowed, delays = [], []
        for url, body, code in zip(urls, bodies, codes):
            code = 200 if pd.isna(code) else int(code)
            rules = _cached_rules(body if isinstance(body, str) else None,
                                  agent, code, allow_403)
            u = parse_url(url) if url else None
            path = (u.file or "/") if u is not None else "/"
            allowed.append(rules.is_allowed(path))
            delays.append(rules.crawl_delay_ms)
        return pd.DataFrame({
            "robots_allowed": allowed,
            "robots_delay_ms": pd.array(delays, dtype="Int64"),
        })

    return _eval


def join_robots(fetchlist, robots_df, agent: str, allow_403: bool = True,
                url_col: str = "url"):
    """Broadcast-join robots bodies onto a fetchlist and evaluate.

    Adds ``robots_allowed`` and ``robots_delay_ms`` columns. The robots
    table is tiny relative to the fetchlist (one row per authority) —
    always broadcast, never shuffle the fetchlist."""
    from .urls import spark_udfs

    udfs = spark_udfs()
    fl = fetchlist.withColumn("_authority", udfs["queue_id"](F.col(url_col)))
    rb = robots_df.select(
        F.col("authority").alias("_authority"),
        "robots_txt", "fetch_code",
    )
    joined = fl.join(F.broadcast(rb), "_authority", "left")
    ev = robots_eval_udf(agent, allow_403)(
        F.col(url_col), F.col("robots_txt"), F.col("fetch_code"))
    return (joined
            .withColumn("_robots", ev)
            .withColumn("robots_allowed", F.col("_robots.robots_allowed"))
            .withColumn("robots_delay_ms", F.col("_robots.robots_delay_ms"))
            .drop("_robots", "robots_txt", "fetch_code", "_authority"))
