"""robots.txt parsing + compliance filtering (the politeness gate a
crawl frontier passes through before fetch).

* ``parse_robots`` — robots.txt FILES (one text blob per domain) into a
  long rule table ``(domain, agent, allow, path_prefix, rule_len)``.
  The format is stateful per file (``User-agent`` lines open a group;
  the rules that follow belong to every agent named since the last
  rule), which distributes as: split to lines -> posexplode -> a
  running ``last(group_start)`` window keyed by domain orders rules
  into their groups -> agents join their group's rules on the group
  id. One explode + two windows per domain — a domain's robots.txt is
  KBs, so a window partition is tiny and the parse is embarrassingly
  parallel across domains.

* ``apply_robots`` — frontier URLs against the rule table with the
  original-spec precedence: the MOST SPECIFIC matching rule (longest
  path prefix) decides, an Allow beats a Disallow of equal length, and
  a URL with no matching rule (or no robots.txt) is allowed. Agent
  groups resolve the standard way: rules for the crawler's own token
  beat ``*`` rules, which apply only when no named group matches.
  Implementation: broadcast the rule table (robots rules are ~KB per
  domain — dimension-sized at any corpus scale), join on domain,
  filter to prefix matches, one window argmax per URL. The corpus side
  never shuffles.

Scope note (documented stand-in, same pattern as the PSL suffix list in
``urls.py``): path rules are literal prefixes per the original 1994
robots.txt spec; Google's ``*``/``$`` wildcard extension is not
implemented — a deployment that needs it swaps the ``startswith`` for
a compiled-pattern match in the same join shape. Everything here is
column expressions over the Java-regex/RE2 common dialect, so the
``web_robots`` driver entry replays parse + precedence in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F
from pyspark.sql.window import Window

from tecs_hardware_kbc_spark.operators.urls import url_host


def _clean_lines(text: Column) -> Column:
    """robots.txt -> array of (whitespace-trimmed, comment-stripped)
    lines. Blank lines are kept here but carry no directive, so they
    never affect grouping — RFC 9309 semantics (groups are delimited by
    User-agent lines, not blank lines)."""
    return F.transform(
        F.split(text, r"\r?\n"),
        lambda l: F.trim(F.regexp_replace(l, r"#.*$", "")))


def parse_robots(robots: DataFrame, domain_col: str = "domain",
                 text_col: str = "robots_txt") -> DataFrame:
    """(domain, agent, allow, path_prefix, rule_len) rule table.

    A ``User-agent`` line that follows a rule line starts a NEW group;
    consecutive ``User-agent`` lines share one group (the spec's
    multi-agent header). Rules before any User-agent line are dropped,
    as are empty-path Disallow lines (spec: "Disallow:" with no path
    means allow everything — no rule)."""
    lines = robots.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(_clean_lines(F.col(text_col)))
        .alias("pos", "line"))
    typed = lines.select(
        "domain", "pos",
        F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1))
        .alias("key"),
        F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:(.*)$", 1))
        .alias("value"))
    w = Window.partitionBy("domain").orderBy("pos")
    # a user-agent line opens a new group unless the previous
    # non-blank directive line was also a user-agent line
    prev_key = F.last(
        F.when(F.col("key") != "", F.col("key")), ignorenulls=True) \
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
    marked = typed.filter(F.col("key") != "").withColumn(
        "new_group",
        ((F.col("key") == "user-agent")
         & (F.coalesce(prev_key, F.lit("")) != "user-agent"))
        .cast("int"))
    grouped = marked.withColumn(
        "grp", F.sum("new_group").over(w))
    agents = grouped.filter(F.col("key") == "user-agent").select(
        "domain", "grp", F.lower(F.col("value")).alias("agent"))
    rules = grouped.filter(
        F.col("key").isin("allow", "disallow") & (F.col("value") != "")
        & (F.col("grp") > 0)).select(
        "domain", "grp", (F.col("key") == "allow").alias("allow"),
        F.col("value").alias("path_prefix"),
        F.length("value").alias("rule_len"))
    return agents.join(rules, ["domain", "grp"]).select(
        "domain", "agent", "allow", "path_prefix", "rule_len")


def apply_robots(urls: DataFrame, rules: DataFrame, agent: str,
                 url_col: str = "url") -> DataFrame:
    """urls + (allowed boolean, matched rule) under the rule table.

    Precedence: the crawler's own agent group if it has ANY rule for
    the URL's domain, else the ``*`` group; within the group, longest
    matching prefix wins and Allow beats Disallow on ties; no match =
    allowed. Plan: broadcast-join the (tiny) rule table on domain, one
    window argmax per URL."""
    agent = agent.lower()
    r = rules.filter(F.lower(F.col("agent")).isin(agent, "*")).select(
        "domain", (F.lower(F.col("agent")) == agent).alias("own"),
        "allow", "path_prefix", "rule_len")
    u = urls.withColumn("_dom", url_host(F.col(url_col))).withColumn(
        "_path",
        F.coalesce(
            F.nullif(F.regexp_extract(
                url_col, r"^[a-zA-Z][\w+.-]*://[^/?#]+([^#]*)", 1),
                F.lit("")),
            F.lit("/")))
    # domain-level agent-group choice: own group wins if it exists
    # (fresh alias so the self-derived join can't capture r.domain)
    dom_has_own = r.filter("own") \
        .select(F.col("domain").alias("_own_dom")).distinct() \
        .withColumn("_has_own", F.lit(True))
    joined = (u.join(F.broadcast(r), u["_dom"] == r["domain"], "left")
              .join(F.broadcast(dom_has_own),
                    u["_dom"] == dom_has_own["_own_dom"], "left")
              .withColumn("_eligible",
                          F.col("path_prefix").isNotNull()
                          & (F.col("own") | ~F.coalesce("_has_own",
                                                        F.lit(False)))
                          & F.col("_path").startswith(F.col("path_prefix"))))
    w = Window.partitionBy(url_col).orderBy(
        F.desc("_eligible"), F.desc("rule_len"), F.desc("allow"),
        F.col("path_prefix"))
    best = (joined.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1))
    return best.select(
        F.col(url_col),
        F.when(F.col("_eligible"), F.col("allow")).otherwise(F.lit(True))
        .alias("allowed"),
        F.when(F.col("_eligible"), F.col("path_prefix"))
        .alias("matched_rule"))
