"""robots.txt compliance filtering — the crawl-hygiene step between
WARC ingest and curation: given the robots.txt bodies a crawler
fetched (they arrive as ordinary WARC response records), decide for
every document URL whether the configured user-agent was allowed to
fetch it, and gate the corpus on that.

Parsing follows RFC 9309 (Robots Exclusion Protocol): group selection
by most-specific matching user-agent (falling back to ``*``), rule
matching by LONGEST-PATH precedence with Allow winning ties, ``$``
end-anchor and ``*`` wildcard support, unmatched paths allowed.

Spark shape: robots tables are host-count-sized (one row per host —
millions of rows at crawl scale, broadcastable or at worst a small
shuffle join on the host key), the rule evaluation is a pandas UDF
over (host, path) AFTER the join pairs each URL with its host's rule
list — one join, no per-rule data motion. Parsing itself is a pure
Python function, differential-tested against urllib.robotparser on
RFC-shaped fixtures (stdlib is the public reference implementation).
"""

from __future__ import annotations

import re
from functools import lru_cache
from urllib.parse import urlsplit

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "parse_robots",
    "robots_allowed",
    "parse_robots_table",
    "apply_robots",
]


def parse_robots(body: str, user_agent: str = "*") -> list[tuple[bool, str]]:
    """Extract the rule group applying to ``user_agent`` from a
    robots.txt body: ordered (allow, path_pattern) pairs. Group choice
    per RFC 9309: the group(s) whose user-agent token is the LONGEST
    prefix-insensitive match of ``user_agent``; the ``*`` group only
    when nothing else matches. Comments (#) stripped; unknown
    directives ignored; multiple UA lines share the following rules."""
    ua = user_agent.lower()
    groups: dict[str, list[tuple[bool, str]]] = {}
    current: list[str] = []
    rules_started = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, val = line.split(":", 1)
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if rules_started:
                current = []
                rules_started = False
            current.append(val.lower())
            for agent in current:
                groups.setdefault(agent, [])
        elif key in ("allow", "disallow"):
            rules_started = True
            if not current:
                continue  # rules before any UA line: ignored per RFC
            if key == "disallow" and val == "":
                # empty Disallow = allow everything (explicit no-op rule)
                continue
            for agent in current:
                groups.setdefault(agent, []).append((key == "allow", val))

    best = None
    for agent in groups:
        if agent != "*" and agent in ua:
            if best is None or len(agent) > len(best):
                best = agent
    if best is not None:
        return groups[best]
    return groups.get("*", [])


@lru_cache(maxsize=65536)
def _pattern_to_re(pattern: str) -> re.Pattern:
    # memoized: robots_allowed evaluates every rule per URL — without
    # the cache that is a fresh sre compile (10-100x the match cost)
    # per rule per URL once distinct patterns exceed re's tiny global
    # cache (review finding r7b)
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    body = ".*".join(parts)
    return re.compile("^" + body + ("$" if anchored else ""))


def robots_allowed(rules: list[tuple[bool, str]], path: str) -> bool:
    """RFC 9309 evaluation: among matching rules the LONGEST pattern
    wins; Allow beats Disallow on equal length; no match → allowed."""
    if not path.startswith("/"):
        path = "/" + path
    best_len = -1
    allowed = True
    for allow, pattern in rules:
        if not pattern:
            continue
        if _pattern_to_re(pattern).match(path):
            # effective specificity = octet count of the PATH pattern
            # (RFC 9309 §2.2.2); the '$' end-anchor is matching syntax,
            # not path octets, so strip it before measuring — otherwise
            # '/a$' (3 chars) would outrank '/ab' (3 chars of real path)
            # purely on anchor padding (review finding r8)
            plen = len(pattern[:-1] if pattern.endswith("$") else pattern)
            if plen > best_len or (plen == best_len and allow and not allowed):
                best_len = plen
                allowed = allow
    return allowed


def parse_robots_table(
    robots: DataFrame,
    user_agent: str = "*",
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Pre-parse a per-host robots.txt table ONCE: (host, rules) where
    ``rules`` is ``array<struct<allow:boolean, pattern:string>>`` — the
    rule group applying to ``user_agent``. Parsing each multi-KB body
    exactly once per host (instead of caching bodies per URL batch)
    keeps the downstream host join payload rule-array-sized and removes
    any need for a per-worker body cache (review finding r8: the old
    body-keyed dict was unbounded at millions of distinct bodies)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ua = user_agent

    def _parse_fn(bodies):
        return pd.Series(
            [
                None
                if b is None
                else [
                    {"allow": allow, "pattern": pat}
                    for allow, pat in parse_robots(b, ua)
                ]
                for b in bodies
            ]
        )

    _parse_fn.__annotations__ = {"bodies": pd.Series, "return": pd.Series}
    parse_udf = pandas_udf(
        _parse_fn, "array<struct<allow:boolean,pattern:string>>"
    )
    return robots.select(
        F.col(host_col).alias("host"),
        parse_udf(F.col(body_col)).alias("rules"),
    )


def apply_robots(
    docs: DataFrame,
    robots: DataFrame,
    user_agent: str = "*",
    url_col: str = "url",
    host_col: str = "host",
    body_col: str = "robots_txt",
    broadcast_robots: bool = True,
) -> DataFrame:
    """Gate a URL-bearing corpus on robots.txt compliance: adds
    ``robots_allowed`` (boolean). ``robots`` holds one row per host
    with the fetched robots.txt body; hosts WITHOUT a robots row are
    allowed (the crawler convention: no robots.txt = no restrictions).

    Bodies are pre-parsed to compact rule arrays ONCE per host
    (``parse_robots_table``) BEFORE the join, so the per-URL join
    ships parsed rules — not multi-KB raw bodies — and the evaluating
    UDF is stateless (no per-worker body cache to grow). Then one left
    join on the parsed host + an Arrow-batched pandas UDF evaluating
    the rule list against each URL path; rule patterns compile once
    process-wide (memoized _pattern_to_re). ``broadcast_robots=False``
    switches to a plain shuffle join for crawl-scale robots tables
    (millions of hosts outgrow a broadcast)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _eval_fn(urls, rule_arrays):
        def one(url, rules):
            if url is None:
                return False
            if rules is None:
                return True
            sp = urlsplit(url)
            path = sp.path or "/"
            if sp.query:
                path += "?" + sp.query
            return robots_allowed(
                [(r["allow"], r["pattern"]) for r in rules], path
            )

        return pd.Series([one(u, r) for u, r in zip(urls, rule_arrays)])

    _eval_fn.__annotations__ = {
        "urls": pd.Series, "rule_arrays": pd.Series, "return": pd.Series,
    }
    ev = pandas_udf(_eval_fn, "boolean")

    from ..functions.text import url_host

    keyed = docs.withColumn("__host", url_host(F.col(url_col)))
    rb = parse_robots_table(
        robots, user_agent, host_col=host_col, body_col=body_col
    ).withColumnRenamed("host", "__host").withColumnRenamed(
        "rules", "__rules"
    )
    if broadcast_robots:
        rb = F.broadcast(rb)
    joined = keyed.join(rb, "__host", "left")
    return joined.withColumn(
        "robots_allowed", ev(F.col(url_col), F.col("__rules"))
    ).drop("__host", "__rules")
