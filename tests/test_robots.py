"""robots.txt filtering: rule semantics, absent-robots allow,
agent-specific groups, audit mode, plan shape."""

from __future__ import annotations

import pytest

from nifi_extracttext_processor_spark.operators.robots import (
    filter_by_robots, robots_allows,
)

ROBOTS_A = """User-agent: *
Disallow: /private/
Disallow: /tmp
Allow: /private/ok.html
"""

ROBOTS_B = """User-agent: goodbot
Disallow:

User-agent: *
Disallow: /
"""


class TestPolicy:
    def test_basic_rules(self):
        assert robots_allows(ROBOTS_A, "http://a.example/index.html")
        assert not robots_allows(ROBOTS_A, "http://a.example/private/x")
        assert robots_allows(ROBOTS_A, "http://a.example/private/ok.html")
        assert not robots_allows(ROBOTS_A, "http://a.example/tmp/y")

    def test_agent_groups(self):
        assert not robots_allows(ROBOTS_B, "http://b.example/x")
        assert robots_allows(ROBOTS_B, "http://b.example/x",
                             agent="goodbot")

    def test_empty_allows(self):
        assert robots_allows("", "http://x.example/a")
        assert robots_allows(None, "http://x.example/a")


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame([
        (1, "http://a.example/index.html"),
        (2, "http://a.example/private/secret.html"),
        (3, "http://a.example/private/ok.html"),
        (4, "http://b.example/anything"),
        (5, "http://norobots.example/page"),
        (6, None),
        (7, "http://a.example./private/dot.html"),  # FQDN trailing
        # dot — same DNS host as a.example; must hit its robots too
    ], "doc_id long, url string")
    robots = spark.createDataFrame([
        ("a.example", ROBOTS_A),
        ("b.example", ROBOTS_B),
    ], "domain string, robots_txt string")
    return docs, robots


class TestFilter:
    def test_filtering(self, frames):
        docs, robots = frames
        kept = {r["doc_id"] for r in
                filter_by_robots(docs, robots).collect()}
        # 2 disallowed, 4 disallowed-for-*, others kept (incl. no
        # robots entry and NULL url)
        assert kept == {1, 3, 5, 6}  # 7: trailing-dot host disallowed

    def test_agent_override(self, frames):
        docs, robots = frames
        kept = {r["doc_id"] for r in
                filter_by_robots(docs, robots,
                                 agent="goodbot").collect()}
        assert 4 in kept

    def test_audit_mode(self, frames):
        docs, robots = frames
        hit = {r["doc_id"] for r in
               filter_by_robots(docs, robots,
                                keep_disallowed=True).collect()}
        assert hit == {2, 4, 7}

    def test_schema_passthrough(self, frames):
        docs, robots = frames
        out = filter_by_robots(docs, robots)
        assert out.columns == ["doc_id", "url"]

    def test_plan_broadcast(self, frames):
        docs, robots = frames
        plan = filter_by_robots(docs, robots)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Broadcast" in plan
        plan2 = filter_by_robots(docs, robots,
                                 broadcast_robots=False)._jdf \
            .queryExecution().executedPlan().toString()
        assert plan2  # builds without broadcast hint too


class TestRfc9309Semantics:
    def test_longest_match_allow_exception(self):
        # the pattern stdlib robotparser gets WRONG (first-match):
        # Allow listed after a broader Disallow must still win by
        # longest-match (RFC 9309 §2.2.2)
        txt = "User-agent: *\nDisallow: /private/\nAllow: /private/ok.html\n"
        assert not robots_allows(txt, "http://x/private/a")
        assert robots_allows(txt, "http://x/private/ok.html")

    def test_wildcard_and_anchor(self):
        txt = ("User-agent: *\n"
               "Disallow: /*.pdf$\n"
               "Disallow: /search*results\n")
        assert not robots_allows(txt, "http://x/docs/file.pdf")
        assert robots_allows(txt, "http://x/docs/file.pdf.html")
        assert not robots_allows(txt, "http://x/search/all/results")
        assert robots_allows(txt, "http://x/searching")

    def test_tie_allow_wins(self):
        txt = "User-agent: *\nDisallow: /page\nAllow: /page\n"
        assert robots_allows(txt, "http://x/page")

    def test_most_specific_agent_group(self):
        txt = ("User-agent: *\nDisallow: /\n\n"
               "User-agent: goodbot\nDisallow: /only-this/\n")
        assert not robots_allows(txt, "http://x/a")
        assert robots_allows(txt, "http://x/a", agent="goodbot")
        assert not robots_allows(txt, "http://x/only-this/a",
                                 agent="goodbot")

    def test_empty_disallow_is_no_restriction(self):
        txt = "User-agent: *\nDisallow:\n"
        assert robots_allows(txt, "http://x/anything")

    def test_query_string_matched(self):
        txt = "User-agent: *\nDisallow: /*?sessionid=\n"
        assert not robots_allows(txt, "http://x/p?sessionid=1")
        assert robots_allows(txt, "http://x/p")

    def test_comments_and_garbage_lines(self):
        txt = ("# top comment\nUser-agent: *  # inline\n"
               "random garbage line\nDisallow: /x # trail\n")
        assert not robots_allows(txt, "http://x/x1")
        assert robots_allows(txt, "http://x/y")


class TestRfc9309ReviewFixes:
    def test_same_agent_groups_merge(self):
        # RFC 9309 §2.2.1: two '*' groups combine (plugin-appended
        # blocks); BOTH Disallow rules must be enforced
        txt = ("User-agent: *\nDisallow: /a\n\n"
               "User-agent: *\nDisallow: /b\n")
        assert not robots_allows(txt, "http://x/a/1")
        assert not robots_allows(txt, "http://x/b/1")
        assert robots_allows(txt, "http://x/c")
        # same-named specific groups merge too
        txt2 = ("User-agent: goodbot\nDisallow: /a\n\n"
                "User-agent: goodbot\nDisallow: /b\n")
        assert not robots_allows(txt2, "http://x/a", agent="goodbot")
        assert not robots_allows(txt2, "http://x/b", agent="goodbot")

    def test_empty_user_agent_token_skipped(self):
        txt = ("User-agent:\nDisallow: /\n\n"
               "User-agent: *\nAllow: /\n")
        assert robots_allows(txt, "http://x/anything")

    def test_prefix_not_containment_matching(self):
        # 'googlebot' group must NOT capture agent 'bot'
        txt = ("User-agent: bot\nAllow: /\n\n"
               "User-agent: googlebot\nDisallow: /\n")
        assert robots_allows(txt, "http://x/p", agent="bot")
        assert not robots_allows(txt, "http://x/p", agent="googlebot")
        # prefix match: agent 'googlebot-news' selects 'googlebot'
        assert not robots_allows(txt, "http://x/p",
                                 agent="googlebot-news")
