"""robots.txt gate for the crawl frontier (RFC 9309).

The frontier (`crawl_frontier`) lists where a crawler COULD go next;
this module decides where it MAY go: parse each host's robots.txt,
select the rule group for our product token (most-specific user-agent
match, falling back to `*`), and apply longest-match-wins /
allow-wins-ties semantics per RFC 9309 §2.2.2 to every outbound edge.

Scale shape: robots files are tiny but numerous (one per host).  Rules
parse once per host into (host, pattern, allow) rows via mapInPandas;
the gate is then a host-keyed join of edges against rules with the
longest-match argmax as a plain aggregation — no per-edge Python, no
broadcast of anything unbounded, shuffle keyed by host (the same key a
politeness scheduler partitions by anyway).  Wildcard patterns compile
to SQL LIKE so the matching itself stays in whole-stage codegen.

Derived from the published RFC 9309 only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "parse_robots_rules",
    "robots_rules",
    "frontier_allowed",
    "HOST_RE",
    "PATH_RE",
]

# shared host/path derivation — the DuckDB oracle mirrors these regexes
HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]+)"
PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]+([^?#]*)"


def parse_robots_rules(
    robots_txt: str, agent: str = "*"
) -> list[tuple[str, int]]:
    """[(pattern, allow)] for the group governing `agent`.

    Group selection per RFC 9309 §2.2.1: the group whose user-agent
    token is the longest case-insensitive prefix of our product token
    wins; absent any match, the `*` group applies; multiple groups for
    the same token merge.  Unknown fields are ignored; an empty
    Disallow value means allow-everything (contributes no rule)."""
    agent_l = agent.lower()
    groups: list[tuple[list[str], list[tuple[str, int]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, int]] = []
    in_group_header = True
    for raw in robots_txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_group_header:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            cur_agents.append(value.lower())
            in_group_header = True
        elif field in ("allow", "disallow"):
            in_group_header = False
            if not cur_agents:
                continue  # rules before any user-agent line: no group
            if value == "":
                continue  # empty pattern matches nothing (allow-all)
            cur_rules.append((value, 1 if field == "allow" else 0))
        # sitemap/crawl-delay/unknown fields: ignored, do not split groups
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    best_len = -1
    best_rules: list[tuple[str, int]] = []
    star_rules: list[tuple[str, int]] = []
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                star_rules.extend(rules)
            elif agent_l.startswith(a) and len(a) > best_len:
                best_len = len(a)
                best_rules = list(rules)
            elif agent_l.startswith(a) and len(a) == best_len:
                best_rules.extend(rules)
    return best_rules if best_len >= 0 else star_rules


def _pattern_to_like(pattern: str) -> str:
    """robots wildcard pattern → SQL LIKE pattern.  `*` is any run,
    `$` (final only) anchors the end; otherwise the match is a prefix."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    like = "".join(out)
    if not anchored:
        like += "%"
    return like


RULES_SCHEMA = "host string, pattern string, pattern_like string, plen int, allow int"


def robots_rules(
    robots_df: DataFrame, agent: str = "*", host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """(host, robots_txt) → one row per governing rule:
    (host, pattern, pattern_like, plen, allow).  Hosts whose file yields
    no rules emit nothing (everything allowed by default)."""
    from typing import Iterator

    import pandas as pd

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os
        import sys

        _repo = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        if _repo not in sys.path:
            sys.path.insert(0, _repo)
        from rust_html2text_spark.functions.robots import (
            _pattern_to_like,
            parse_robots_rules,
        )

        for batch in batches:
            rows = {"host": [], "pattern": [], "pattern_like": [],
                    "plen": [], "allow": []}
            for host, txt in zip(batch[host_col], batch[txt_col]):
                if txt is None:
                    continue
                for pattern, allow in parse_robots_rules(txt, agent):
                    rows["host"].append(host)
                    rows["pattern"].append(pattern)
                    rows["pattern_like"].append(_pattern_to_like(pattern))
                    rows["plen"].append(len(pattern))
                    rows["allow"].append(allow)
            yield pd.DataFrame(rows)

    return robots_df.select(host_col, txt_col).mapInPandas(parse, RULES_SCHEMA)


def frontier_allowed(
    edges: DataFrame,
    rules: DataFrame,
    target_col: str = "target",
) -> DataFrame:
    """Gate frontier edges through per-host robots rules: adds
    (allowed boolean, matched_rule string).  Longest-match wins, allow
    wins ties, no matching rule (or no rules for the host) = allowed —
    RFC 9309 §2.2.2.  Plan: derive host+path, LEFT join rules on host
    (codegen LIKE match), argmax by (plen, allow) per edge."""
    host = F.regexp_extract(F.col(target_col), HOST_RE, 1)
    path = F.regexp_extract(F.col(target_col), PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # a unique per-row id keeps duplicate edges (same url→target via
    # several pages/ordinals) distinct through the argmax group-by; it is
    # plan-internal and dropped from the output
    keyed = (
        edges.withColumn("_eid", F.monotonically_increasing_id())
        .withColumn("_host", host)
        .withColumn("_path", path)
    )
    edge_cols = edges.columns
    j = keyed.join(
        rules.withColumnRenamed("host", "_host"),
        ["_host"],
        "left",
    ).withColumn(
        "_hit",
        # Column.like() takes only literals; column-to-column LIKE goes
        # through the SQL expression (still whole-stage codegen)
        F.col("pattern_like").isNotNull() & F.expr("_path LIKE pattern_like"),
    )
    best = F.max(
        F.when(
            F.col("_hit"),
            F.struct(
                F.col("plen"), F.col("allow"), F.col("pattern")
            ),
        )
    ).alias("_best")
    out = j.groupBy("_eid", *edge_cols).agg(best).drop("_eid")
    return out.select(
        *edge_cols,
        F.coalesce(F.col("_best.allow") == 1, F.lit(True)).alias("allowed"),
        F.col("_best.pattern").alias("matched_rule"),
    )


def frontier_schedule(
    edges: DataFrame,
    per_host_per_wave: int = 1,
    target_col: str = "target",
) -> DataFrame:
    """Politeness scheduling for gated frontier edges: assign each edge a
    `fetch_wave` so that no host is hit more than `per_host_per_wave`
    times per wave — the crawler fetches wave 0, waits its per-host
    delay, fetches wave 1, and so on.  Deterministic: edges order by
    (target, url) within their host, duplicates collapse first (fetching
    a URL twice in one crawl is wasted politeness budget).

    Scale shape: one hash-partitioned window keyed by host — the same
    key the robots gate and any per-host rate limiter shuffle on, so
    with `repartition` reuse the three stages share one exchange."""
    from pyspark.sql import Window

    if per_host_per_wave < 1:
        raise ValueError("per_host_per_wave must be >= 1")
    host = F.regexp_extract(F.col(target_col), HOST_RE, 1)
    deduped = edges.select(
        F.col(target_col).alias("target"),
        "url",
        "kind",
    ).groupBy("target").agg(
        F.min("url").alias("via_url"), F.min("kind").alias("kind")
    )
    w = Window.partitionBy(host).orderBy("target")
    return deduped.select(
        host.alias("host"),
        "target",
        "via_url",
        "kind",
        F.floor(
            (F.row_number().over(w) - F.lit(1)) / F.lit(per_host_per_wave)
        ).alias("fetch_wave"),
    )
