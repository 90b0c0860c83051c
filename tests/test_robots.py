"""robots.txt frontier gate (functions/robots.py): RFC 9309 group
selection, longest-match/allow-ties semantics, wildcard-to-LIKE
translation, and the Spark gate's parity with the scalar parser."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from rust_html2text_spark.functions.robots import (  # noqa: E402
    _pattern_to_like,
    parse_robots_rules,
)


@pytest.fixture(scope="module")
def spark():
    from rust_html2text_spark.plans.session import get_spark

    s = get_spark(master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


ROBOTS = """\
# comment line
User-agent: googlebot
Disallow: /google-only/

User-agent: spark
User-agent: bingbot
Disallow: /named/

User-agent: *
Disallow: /private/
Allow: /private/ok
Crawl-delay: 10
Sitemap: https://x.example/sitemap.xml

User-agent: *
Disallow: /second-star/
"""


def test_group_selection_most_specific_prefix():
    # our token starts with 'spark' -> the named group governs
    assert parse_robots_rules(ROBOTS, "spark-graft-bot") == [("/named/", 0)]
    # unknown token -> star groups MERGE (two star groups in the file)
    assert parse_robots_rules(ROBOTS, "otherbot") == [
        ("/private/", 0),
        ("/private/ok", 1),
        ("/second-star/", 0),
    ]
    # googlebot gets its own group, not star
    assert parse_robots_rules(ROBOTS, "googlebot") == [("/google-only/", 0)]


def test_group_selection_longest_named_match_wins():
    txt = (
        "User-agent: a\nDisallow: /short/\n\n"
        "User-agent: ab\nDisallow: /long/\n\n"
        "User-agent: *\nDisallow: /star/\n"
    )
    assert parse_robots_rules(txt, "abc-bot") == [("/long/", 0)]


def test_fields_case_insensitive_and_empty_disallow():
    txt = "USER-AGENT: *\nDISALLOW:\nAllow: /x\ndisallow: /y\n"
    assert parse_robots_rules(txt, "anybot") == [("/x", 1), ("/y", 0)]


def test_rules_before_any_group_are_ignored():
    txt = "Disallow: /orphan/\nUser-agent: *\nDisallow: /real/\n"
    assert parse_robots_rules(txt, "bot") == [("/real/", 0)]


def test_pattern_to_like():
    assert _pattern_to_like("/a/") == "/a/%"  # prefix match
    assert _pattern_to_like("/a/*.pdf$") == "/a/%.pdf"  # anchored
    assert _pattern_to_like("/a/*.pdf") == "/a/%.pdf%"
    assert _pattern_to_like("/50%_off") == r"/50\%\_off%"  # LIKE specials


def test_spark_gate_longest_match_and_defaults(spark):
    from rust_html2text_spark.functions.robots import (
        frontier_allowed,
        robots_rules,
    )

    robots = spark.createDataFrame(
        [
            (
                "a.example",
                "User-agent: *\nDisallow: /d/\nAllow: /d/deep\n"
                "Disallow: /d/deep/no$\n",
            ),
            ("b.example", "User-agent: other\nDisallow: /\n"),  # not for us
        ],
        "host string, robots_txt string",
    )
    rules = robots_rules(robots, agent="spark-graft-bot")
    edges = spark.createDataFrame(
        [
            ("u", "https://a.example/d/x", "html"),          # blocked /d/
            ("u", "https://a.example/d/deep/page", "html"),  # allow override
            ("u", "https://a.example/d/deep/no", "html"),    # $-anchor blocks
            ("u", "https://a.example/d/deep/nope", "html"),  # $ does NOT match
            ("u", "https://a.example/other", "html"),        # no rule -> allow
            ("u", "https://b.example/anything", "html"),     # other-agent group
            ("u", "https://c.example/x", "html"),            # no robots at all
            ("u", "https://a.example/d/x", "html"),          # duplicate edge kept
        ],
        "url string, target string, kind string",
    )
    got = frontier_allowed(edges, rules).collect()
    assert len(got) == 8  # duplicate edges survive the gate
    verdict = {}
    dup = 0
    for r in got:
        key = r["target"]
        if key in verdict:
            dup += 1
            assert verdict[key] == (r["allowed"], r["matched_rule"])
        verdict[key] = (r["allowed"], r["matched_rule"])
    assert dup == 1
    assert verdict["https://a.example/d/x"] == (False, "/d/")
    assert verdict["https://a.example/d/deep/page"] == (True, "/d/deep")
    assert verdict["https://a.example/d/deep/no"] == (False, "/d/deep/no$")
    assert verdict["https://a.example/d/deep/nope"] == (True, "/d/deep")
    assert verdict["https://a.example/other"] == (True, None)
    assert verdict["https://b.example/anything"] == (True, None)
    assert verdict["https://c.example/x"] == (True, None)


def test_gate_matches_scalar_parser_on_corpus(spark):
    """Spark gate verdicts == per-edge scalar evaluation with the same
    parsed rules (the oracle-independent parity check)."""
    import re

    from rust_html2text_spark.functions.robots import (
        HOST_RE,
        PATH_RE,
        frontier_allowed,
        robots_rules,
    )
    from rust_html2text_spark.sources.corpus import (
        robots_for_frontier,
        robots_txt_for_host,
    )

    import __spark_entry__ as entry

    edges = entry.q_crawl_frontier(spark, "/root/testdata/sf0.001").limit(400)
    robots = robots_for_frontier(edges)
    got = frontier_allowed(edges, robots_rules(robots, agent="x-bot")).collect()
    assert len(got) > 100

    def scalar(target):
        host = re.match(HOST_RE, target).group(1)
        path = re.match(PATH_RE, target).group(1) or "/"
        best = None
        for pattern, allow in parse_robots_rules(
            robots_txt_for_host(host), "x-bot"
        ):
            anchored = pattern.endswith("$")
            pat = pattern[:-1] if anchored else pattern
            rx = "^" + ".*".join(re.escape(p) for p in pat.split("*"))
            rx += "$" if anchored else ""
            if re.match(rx, path):
                key = (len(pattern), allow)
                if best is None or key > best[0]:
                    best = (key, pattern, allow)
        if best is None:
            return True, None
        return bool(best[2]), best[1]

    for r in got:
        want_allowed, want_rule = scalar(r["target"])
        assert (r["allowed"], r["matched_rule"]) == (
            want_allowed,
            want_rule,
        ), r["target"]


def test_frontier_schedule_politeness_invariants(spark):
    """No host appears more than per_host_per_wave times in any wave,
    waves are dense per host (0..max with full occupancy below max),
    duplicate targets collapse, and ordering is deterministic."""
    from rust_html2text_spark.functions.robots import frontier_schedule

    edges = spark.createDataFrame(
        [
            ("u1", f"https://h{i % 3}.example/p{i}", "html")
            for i in range(17)
        ]
        + [("u2", "https://h0.example/p0", "pdf")],  # duplicate target
        "url string, target string, kind string",
    )
    got = frontier_schedule(edges, per_host_per_wave=2).collect()
    # duplicate target collapsed (kind = min -> 'html')
    assert len(got) == 17
    by_target = {r["target"]: r for r in got}
    assert by_target["https://h0.example/p0"]["kind"] == "html"
    from collections import Counter

    per_wave = Counter((r["host"], r["fetch_wave"]) for r in got)
    assert max(per_wave.values()) <= 2
    for host in {r["host"] for r in got}:
        waves = sorted(
            r["fetch_wave"] for r in got if r["host"] == host
        )
        # dense: floor((rank-1)/2) over consecutive ranks
        assert waves == [i // 2 for i in range(len(waves))]
    # deterministic
    again = frontier_schedule(edges, per_host_per_wave=2).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))

    with pytest.raises(ValueError):
        frontier_schedule(edges, per_host_per_wave=0)
