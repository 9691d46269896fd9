"""robots.txt parsing + URL permission evaluation (RFC 9309).

A crawl→training pipeline must honor robots.txt; this implements the
current standard plus the universally-deployed extensions:

- group structure: consecutive ``User-agent`` lines share the
  following ``Allow``/``Disallow`` rules; blank lines do NOT end a
  group (RFC 9309 §2.1); comments (#) stripped anywhere
- group selection: longest user-agent substring match of the product
  token, case-insensitive; ``*`` fallback (§2.2.1)
- rule matching: percent-decoding-insensitive octet prefix match with
  ``*`` wildcards and ``$`` end anchor (§2.2.2 + the Google
  extension both major engines ship); LONGEST match wins, tie goes
  to ``Allow`` (least restrictive)
- empty ``Disallow:`` = allow all (the classic idiom)
- ``Crawl-delay`` and ``Sitemap`` surfaced (non-normative but
  ubiquitous)

``robots_allowed`` evaluates (robots_txt, url) pairs Arrow-batched —
the production shape: one robots blob per host joined against that
host's crawl frontier.

The reference has no crawl layer (beyond-reference op, like WARC)."""

from __future__ import annotations

import re
from urllib.parse import urlsplit


def parse_robots(text: str) -> dict:
    """-> {"groups": [{"agents": [...], "rules": [(allow,bool, path)],
    "crawl_delay": float|None}], "sitemaps": [...]}"""
    groups: list[dict] = []
    sitemaps: list[str] = []
    cur: dict | None = None
    last_was_agent = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, val = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if cur is None or not last_was_agent:
                cur = {"agents": [], "rules": [], "crawl_delay": None}
                groups.append(cur)
            cur["agents"].append(val.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if key == "sitemap":
            sitemaps.append(val)
        elif cur is not None and key in ("allow", "disallow"):
            cur["rules"].append((key == "allow", val))
        elif cur is not None and key == "crawl-delay":
            try:
                cur["crawl_delay"] = float(val)
            except ValueError:
                pass
    return {"groups": groups, "sitemaps": sitemaps}


def select_group(parsed: dict, agent: str) -> dict | None:
    """Longest user-agent token match, '*' fallback (RFC 9309 §2.2.1)."""
    agent = agent.lower()
    best = None
    best_len = -1
    star = None
    for g in parsed["groups"]:
        for a in g["agents"]:
            if a == "*":
                if star is None:
                    star = g
            elif a in agent and len(a) > best_len:
                best, best_len = g, len(a)
    return best if best is not None else star


def _rule_matches(pattern: str, path: str) -> int:
    """-1 when the rule does not match, else the pattern length (the
    specificity used for longest-match-wins)."""
    if pattern == "":
        return -1  # empty Disallow: allows everything (matches nothing)
    if "*" in pattern or pattern.endswith("$"):
        rx = re.escape(pattern).replace(r"\*", ".*")
        if rx.endswith(r"\$"):
            rx = rx[:-2] + "$"
        if re.match(rx, path):
            return len(pattern)
        return -1
    return len(pattern) if path.startswith(pattern) else -1


def is_allowed(robots_txt: str, agent: str, url: str) -> bool:
    """RFC 9309 decision for one URL.  Unmatched agents, missing
    groups, or no matching rule -> allowed (the crawl default)."""
    parsed = robots_txt if isinstance(robots_txt, dict) \
        else parse_robots(robots_txt)
    g = select_group(parsed, agent)
    if g is None:
        return True
    path = url
    if "://" in url:
        sp = urlsplit(url)
        path = sp.path or "/"
        if sp.query:
            path += "?" + sp.query
    best_len = -1
    best_allow = True
    for allow, pattern in g["rules"]:
        m = _rule_matches(pattern, path)
        if m < 0:
            continue
        if m > best_len or (m == best_len and allow and not best_allow):
            best_len, best_allow = m, allow
    return best_allow if best_len >= 0 else True


def crawl_delay(robots_txt: str, agent: str) -> float | None:
    parsed = parse_robots(robots_txt)
    g = select_group(parsed, agent)
    return g["crawl_delay"] if g else None


def robots_allowed(df, robots_col: str = "robots_txt",
                   url_col: str = "url", agent: str = "*",
                   out_col: str = "allowed"):
    """Arrow-batched (robots, url) evaluation.  Production shape: the
    frontier joins its host's robots blob, then this adds the
    permission column — one parse per DISTINCT robots blob per batch
    (hosts repeat within a batch; the parse is cached by blob)."""
    from pyspark.sql.types import BooleanType, StructField, StructType

    # fresh StructType — StructType.add would mutate df's cached schema
    schema = StructType(list(df.schema.fields)
                        + [StructField(out_col, BooleanType())])

    def run(batches):
        for pdf in batches:
            cache: dict[str, dict] = {}
            out = []
            for rb, u in zip(pdf[robots_col], pdf[url_col]):
                rb = rb or ""
                parsed = cache.get(rb)
                if parsed is None:
                    parsed = parse_robots(rb)
                    cache[rb] = parsed
                out.append(is_allowed(parsed, agent, u or "/"))
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    return df.mapInPandas(run, schema)
