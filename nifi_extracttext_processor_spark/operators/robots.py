"""robots.txt-aware URL filtering — crawl governance for the
web-corpus pipeline.

Policy evaluation implements RFC 9309 (the Robots Exclusion Protocol
as standardized from Google's REP draft): group selection by most
specific matching user-agent (longest name, '*' fallback), rule
matching with '*' wildcards and '$' end anchors, and LONGEST-MATCH
precedence with allow winning ties. The stdlib urllib.robotparser is
deliberately NOT used — it applies first-match-in-file order, which
disagrees with RFC 9309 §2.2.2 whenever an Allow exception follows a
broader Disallow (the single most common real-world pattern:
``Disallow: /private/`` then ``Allow: /private/ok.html``).

A training-data pipeline re-filtering an existing crawl dump wants to
drop pages whose CURRENT robots policy disallows them (the
"retroactive robots" pass responsible corpus releases run). Input is
therefore data, not network: a (domain, robots_txt) table captured by
the crawler.

Plan shape: docs project a lowercased host key (url_host — narrow),
join the robots table on it (the robots side is per-DOMAIN — tiny
next to the corpus; broadcast when it fits, else an AQE hash join on
the domain key), then ONE Arrow kernel evaluates the matched policy
per row with a per-partition compiled-policy cache keyed by domain
(Zipf over domains → high hit rate). Documents whose domain has no
robots entry PASS (absent robots = allow, per the standard)."""

from __future__ import annotations

import re
from collections.abc import Iterator
from urllib.parse import urlsplit

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import url_host


def _compile_rule(pattern: str) -> "re.Pattern[str] | None":
    """One robots path pattern → anchored regex ('*' wildcard, '$'
    end anchor per RFC 9309 §2.2.3). Empty pattern → None (an empty
    Disallow means 'no restriction')."""
    if not pattern:
        return None
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    rx = ".*".join(re.escape(part) for part in pattern.split("*"))
    return re.compile("^" + rx + ("$" if anchored else ""))


class RobotsPolicy:
    """Compiled policy for ONE robots.txt + ONE user agent."""

    def __init__(self, robots_txt: str, agent: str = "*") -> None:
        agent = agent.lower()
        groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
        cur_agents: list[str] = []
        cur_rules: list[tuple[bool, str]] = []
        seen_rule = False
        for raw in (robots_txt or "").splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            field, value = line.split(":", 1)
            field = field.strip().lower()
            value = value.strip()
            if field == "user-agent":
                if seen_rule:  # a new group starts
                    groups.append((cur_agents, cur_rules))
                    cur_agents, cur_rules = [], []
                    seen_rule = False
                if value:  # an empty token would match EVERY agent
                    cur_agents.append(value.lower())
            elif field in ("allow", "disallow"):
                cur_rules.append((field == "allow", value))
                seen_rule = True
        if cur_agents or cur_rules:
            groups.append((cur_agents, cur_rules))
        # RFC 9309 §2.2.1: rules of groups sharing a user-agent token
        # MERGE (plugins append their own '*' blocks); selection takes
        # the LONGEST token that prefixes our agent name (a robots
        # token matches the crawler product name, never the reverse —
        # 'googlebot' must not capture agent 'bot'), '*' as fallback.
        by_token: dict[str, list[tuple[bool, str]]] = {}
        for agents, rules in groups:
            for a in agents:
                by_token.setdefault(a, []).extend(rules)
        best_tok = None
        for tok in by_token:
            if tok != "*" and agent.startswith(tok):
                if best_tok is None or len(tok) > len(best_tok):
                    best_tok = tok
        if best_tok is None and "*" in by_token:
            best_tok = "*"
        chosen = by_token.get(best_tok, []) if best_tok else []
        self._rules = [(allow, len(pat), _compile_rule(pat))
                       for allow, pat in chosen]

    def allows(self, url: str) -> bool:
        try:
            parts = urlsplit(url or "")
            path = parts.path or "/"
            if parts.query:
                path += "?" + parts.query
        except ValueError:
            return True
        best: tuple[int, bool] | None = None
        for allow, plen, rx in self._rules:
            if rx is None or not rx.match(path):
                continue
            # longest-match precedence; allow wins exact ties
            if best is None or plen > best[0] or \
                    (plen == best[0] and allow):
                best = (plen, allow)
        return True if best is None else best[1]


def robots_allows(robots_txt: str | None, url: str,
                  agent: str = "*") -> bool:
    """One-shot policy evaluation (RFC 9309 longest-match).
    Empty/absent robots → allow."""
    if not robots_txt:
        return True
    try:
        return RobotsPolicy(robots_txt, agent).allows(url)
    except Exception:
        return True  # fail-open: governance filter, not a crash site


def filter_by_robots(
    docs: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    robots_col: str = "robots_txt",
    agent: str = "*",
    keep_disallowed: bool = False,
    broadcast_robots: bool = True,
) -> DataFrame:
    """Drop rows whose URL the domain's robots.txt disallows for
    `agent`. `robots` = (domain lowercase, robots_txt). Rows whose
    domain has no robots entry are kept (absent = allow).
    `keep_disallowed=True` inverts (audit mode).
    `broadcast_robots=False` for robots tables too large to broadcast
    (whole-web scale) — the join then shuffles on the domain key
    only."""
    import pandas as pd

    r = robots.select(F.lower(F.col(domain_col)).alias("__dom"),
                      F.col(robots_col).alias("__robots"))
    if broadcast_robots:
        r = F.broadcast(r)
    joined = docs.withColumn("__dom", url_host(url_col)) \
                 .join(r, "__dom", "left")
    fields = [f"`{f.name}` {f.dataType.simpleString()}"
              for f in docs.schema.fields]
    schema = ", ".join(fields + ["__allowed BOOLEAN"])
    out_cols = [f.name for f in docs.schema.fields]

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, RobotsPolicy | None] = {}

        def policy_for(dom: str, txt) -> "RobotsPolicy | None":
            if dom not in cache:
                if txt is None:
                    cache[dom] = None
                else:
                    try:
                        cache[dom] = RobotsPolicy(str(txt), agent)
                    except Exception:
                        cache[dom] = None
            return cache[dom]

        for pdf in batches:
            allowed = []
            # zip over materialized lists, not per-row .iloc — pandas
            # scalar indexing costs µs/access and this is the
            # corpus-sized hot path
            for dom, txt, u in zip(pdf["__dom"].tolist(),
                                   pdf["__robots"].tolist(),
                                   pdf[url_col].tolist()):
                pol = policy_for(dom, txt)
                if pol is None:
                    allowed.append(True)
                    continue
                try:
                    allowed.append(pol.allows(u or ""))
                except Exception:
                    allowed.append(True)
            out = pdf[out_cols].copy()
            out["__allowed"] = allowed
            yield out

    evaluated = joined.mapInPandas(_run, schema=schema)
    want = F.col("__allowed") == F.lit(not keep_disallowed)
    return evaluated.filter(want).drop("__allowed")
