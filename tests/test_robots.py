"""robots.txt parse + compliance precedence (operators/robots.py)."""

import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.operators.robots import (
    apply_robots, parse_robots)

ROBOTS_A = """# comment
User-agent: *
Disallow: /private/
Allow: /private/ok
Disallow:

User-agent: kbcbot
User-agent: otherbot
Disallow: /tmp/
Allow: /tmp/keep/
"""

ROBOTS_B = """User-agent: megabot
Disallow: /
"""


def _rules(spark):
    df = spark.createDataFrame(
        [("a.com", ROBOTS_A), ("b.com", ROBOTS_B)],
        "domain string, robots_txt string")
    return parse_robots(df)


def test_parse_groups_and_drops_empty_disallow(spark):
    got = {(r.domain, r.agent, r.allow, r.path_prefix, r.rule_len)
           for r in _rules(spark).collect()}
    assert got == {
        ("a.com", "*", False, "/private/", 9),
        ("a.com", "*", True, "/private/ok", 11),
        # the multi-agent header shares one group's rules
        ("a.com", "kbcbot", False, "/tmp/", 5),
        ("a.com", "kbcbot", True, "/tmp/keep/", 10),
        ("a.com", "otherbot", False, "/tmp/", 5),
        ("a.com", "otherbot", True, "/tmp/keep/", 10),
        ("b.com", "megabot", False, "/", 1),
    }


def test_apply_longest_match_and_agent_precedence(spark):
    rules = _rules(spark)
    urls = spark.createDataFrame(
        [("https://a.com/private/x",),       # * disallow (randombot)
         ("https://a.com/private/ok/x",),    # longer allow wins
         ("https://a.com/public",),          # no rule -> allowed
         ("https://b.com/anything",),        # no randombot/* group
         ("https://c.com/no-robots",)],      # no robots.txt -> allowed
        "url string")
    got = {r.url: (r.allowed, r.matched_rule)
           for r in apply_robots(urls, rules, agent="RandomBot").collect()}
    assert got == {
        "https://a.com/private/x": (False, "/private/"),
        "https://a.com/private/ok/x": (True, "/private/ok"),
        "https://a.com/public": (True, None),
        "https://b.com/anything": (True, None),
        "https://c.com/no-robots": (True, None),
    }
    # kbcbot's own group governs /tmp/ on a.com
    urls2 = spark.createDataFrame(
        [("https://a.com/tmp/x",), ("https://a.com/tmp/keep/x",)],
        "url string")
    got2 = {r.url: (r.allowed, r.matched_rule)
            for r in apply_robots(urls2, rules, agent="KBCBot").collect()}
    assert got2 == {
        "https://a.com/tmp/x": (False, "/tmp/"),
        "https://a.com/tmp/keep/x": (True, "/tmp/keep/"),
    }


def test_own_group_shadows_star_entirely(spark):
    # kbcbot has its OWN group on a.com, so the * rules do not apply to
    # it at all — /private/ is fair game for kbcbot (RFC 9309 group
    # selection: the most specific matching group, never a merge)
    rules = _rules(spark)
    urls = spark.createDataFrame([("https://a.com/private/x",)],
                                 "url string")
    got = apply_robots(urls, rules, agent="kbcbot").collect()[0]
    assert got.allowed is True and got.matched_rule is None


def test_megabot_blanket_disallow(spark):
    rules = _rules(spark)
    urls = spark.createDataFrame(
        [("https://b.com/",), ("https://b.com/deep/page",)], "url string")
    got = {r.url: r.allowed
           for r in apply_robots(urls, rules, agent="megabot").collect()}
    assert got == {"https://b.com/": False, "https://b.com/deep/page": False}


def test_rules_broadcast_plan(spark):
    rules = _rules(spark)
    urls = spark.createDataFrame([("https://a.com/x",)], "url string")
    plan = apply_robots(urls, rules, agent="kbcbot") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
