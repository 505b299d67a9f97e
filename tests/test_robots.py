"""RFC 9309 robots tests: group selection, longest-match precedence,
wildcards/anchors, forgiving grammar, Hypothesis consistency."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tectonic_spark.operators.robots import parse_robots, robots_allowed

FIXTURE = b"""
User-agent: special-bot
Disallow: /docs/
Allow: /docs/open/

User-agent: *
User-agent: other-bot
Disallow: /private/
Allow: /private/ok/
Disallow: /*.tmp$
Crawl-delay: 3.5
Sitemap: https://h.example/sitemap.xml
Unknown-field: ignored
"""


@pytest.fixture(scope="module")
def robots():
    return parse_robots(FIXTURE)


class TestGrammar:
    def test_groups_and_records(self, robots):
        assert len(robots["groups"]) == 2
        assert robots["groups"][0]["agents"] == ["special-bot"]
        assert robots["groups"][1]["agents"] == ["*", "other-bot"]
        assert robots["groups"][1]["crawl_delay"] == 3.5
        assert robots["sitemaps"] == ["https://h.example/sitemap.xml"]

    def test_comments_and_unknown_ignored(self):
        r = parse_robots(b"# all\nUser-agent: * # inline\nNoSuch: x\nDisallow: /a\n")
        assert r["groups"][0]["rules"] == [(False, "/a")]

    def test_rule_before_group_ignored(self):
        r = parse_robots(b"Disallow: /a\nUser-agent: *\nDisallow: /b\n")
        assert r["groups"][0]["rules"] == [(False, "/b")]

    def test_non_utf8_refused(self):
        with pytest.raises(ValueError, match="UTF-8"):
            parse_robots(b"\xff\xfeUser-agent: *")


class TestEvaluation:
    def test_wildcard_group(self, robots):
        a = lambda p: robots_allowed(robots, "genericbot", p)
        assert a("/docs/5/view")
        assert not a("/private/5")
        assert a("/private/ok/5")  # longer allow wins
        assert not a("/x/y.tmp")  # $ anchor
        assert a("/x/y.tmpX")  # past the anchor

    def test_exact_group_beats_star_and_does_not_merge(self, robots):
        a = lambda p: robots_allowed(robots, "Special-Bot", p)  # case-insensitive
        assert not a("/docs/5/view")
        assert a("/docs/open/5")
        assert a("/private/5")  # * rules not merged into the exact group

    def test_allow_wins_tie(self):
        r = parse_robots(b"User-agent: *\nDisallow: /p\nAllow: /p\n")
        assert robots_allowed(r, "x", "/p/1")

    def test_empty_disallow_matches_nothing(self):
        r = parse_robots(b"User-agent: *\nDisallow:\n")
        assert robots_allowed(r, "x", "/anything")

    def test_no_matching_group_allows(self):
        r = parse_robots(b"User-agent: onlybot\nDisallow: /\n")
        assert robots_allowed(r, "someone-else", "/x")
        assert not robots_allowed(r, "onlybot", "/x")

    def test_same_specificity_groups_merge(self):
        r = parse_robots(
            b"User-agent: *\nDisallow: /a\n\nUser-agent: *\nDisallow: /b\n"
        )
        assert not robots_allowed(r, "x", "/a/1")
        assert not robots_allowed(r, "x", "/b/1")

    def test_mid_pattern_wildcard(self):
        r = parse_robots(b"User-agent: *\nDisallow: /a/*/secret\n")
        assert not robots_allowed(r, "x", "/a/1/secret")
        assert not robots_allowed(r, "x", "/a/1/2/secrets")
        assert robots_allowed(r, "x", "/a/secret")

    @settings(max_examples=50, deadline=None)
    @given(st.text(alphabet="ab/.", min_size=1, max_size=20))
    def test_longer_allow_always_rescues(self, path):
        """An Allow rule strictly longer than every Disallow match
        cannot lose under longest-match."""
        full = "/" + path.lstrip("/")
        r = parse_robots(
            f"User-agent: *\nDisallow: /\nAllow: {full}\n".encode()
        )
        assert robots_allowed(r, "bot", full)
