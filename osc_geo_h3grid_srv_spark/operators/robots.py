"""robots.txt crawl-politeness filtering (public spec: RFC 9309,
Robots Exclusion Protocol) — the gate every compliant crawl pipeline
applies before fetching or keeping a page.

Two stages, both pure JVM column algebra (no Python, no UDF):

* `rules_from_robots_txt` — parse raw robots.txt bodies into a
  (host, directive, prefix) rule table. Line split + posexplode; a
  rule line belongs to the most recent `User-agent:` group above it,
  tracked with a window CUMSUM of user-agent lines (group id = number
  of UA lines at-or-before this line) — no per-row state machine.
  Only groups addressed to `*` are kept (single-agent engine; named
  agents are a filter away). Blank prefixes on Disallow ("Disallow:")
  mean allow-all per the RFC and are dropped.

* `robots_filter` — evaluate urls against the rule table with the
  RFC 9309 precedence: the matching rule with the MOST pattern octets
  wins; on equal length Allow beats Disallow; no matching rule means
  allowed. §2.2.3 special characters are honored: `*` matches any run
  of octets and a trailing `$` anchors the path end (rules like
  `Disallow: /*.pdf$` work); wildcard-free rules keep the cheap
  startswith fast path, wildcard rules compile to an anchored regex on
  the (tiny, broadcast) rule side. Implemented as a broadcast join on
  host + match predicate + one `max_by` aggregate keyed by
  (pattern_length, is_allow) — the lexicographic struct order IS the
  precedence rule, so no window re-sort is needed.

Scale notes: the rules side is the web's robots corpus — millions of
rows, kilobytes each — comfortably broadcastable after the parse
collapses bodies to rule rows; the url side is never shuffled. Hot
hosts skew the per-url match fan-out, not the partitioning (the join
key leaves urls in place under broadcast). For a rules side too large
to broadcast, swap the hint for a shuffle join on host and let AQE
skew-split crawl-heavy domains.

Reference scope note: the reference repo has no crawl surface; this
module belongs to the web-pipeline extension required by the build
brief (SURVEY.md "beyond the reference" section).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .weburl import host_from_url


def _starred_lines(robots: DataFrame, host_col: str,
                   body_col: str) -> DataFrame:
    """(host, pos, line) for every line inside a `*`-addressed group.

    Group tracking: a group is "addressed to *" if ANY of its UA lines
    is `*` (consecutive UA lines form one group per the RFC); group
    runs are numbered with a window cumsum of run-starting UA lines."""
    lines = F.split(F.col(body_col), "\n")
    d = robots.select(F.col(host_col).alias("host"),
                      F.posexplode(lines).alias("pos", "line"))
    d = d.withColumn("line", F.trim("line"))
    is_ua = F.lower("line").startswith("user-agent:")
    ua_val = F.trim(F.substring(F.col("line"), 12, 1 << 20))
    d = d.withColumn("is_ua", is_ua.cast("int"))
    d = d.withColumn("ua_star",
                     F.when(is_ua & (ua_val == "*"), 1).otherwise(0))
    from pyspark.sql import Window
    w = (Window.partitionBy("host").orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, 0))
    wlag = Window.partitionBy("host").orderBy("pos")
    starts_run = (F.col("is_ua") == 1) & \
        (F.coalesce(F.lag("is_ua").over(wlag), F.lit(0)) == 0)
    d = d.withColumn("grp", F.sum(starts_run.cast("int")).over(w))
    starred = (d.groupBy("host", "grp")
               .agg(F.max("ua_star").alias("star"))
               .filter(F.col("star") == 1)
               .select("host", "grp"))
    return d.join(F.broadcast(starred), ["host", "grp"], "left_semi")


def rules_from_robots_txt(robots: DataFrame, host_col: str = "host",
                          body_col: str = "body") -> DataFrame:
    """(host, body) -> (host, directive 'allow'|'disallow', prefix)
    over the `*`-addressed groups."""
    d = _starred_lines(robots, host_col, body_col)
    rule = F.regexp_extract(F.lower("line"),
                            r"^(allow|disallow):", 1)
    d = (d.filter(rule != "")
         .withColumn("directive", rule)
         .withColumn("prefix", F.trim(F.col("line").substr(
             F.instr(F.col("line"), ":") + 1, F.lit(1 << 20)))))
    # "Disallow:" (empty prefix) == allow everything -> no rule row;
    # "Allow:" (empty) is equally vacuous under longest-match.
    return (d.filter(F.col("prefix") != "")
            .select("host", "directive", "prefix"))


def crawl_delays(robots: DataFrame, host_col: str = "host",
                 body_col: str = "body") -> DataFrame:
    """(host, delay_s): the `Crawl-delay:` value of the `*` group —
    the de-facto politeness extension (not in RFC 9309 but emitted by
    a large fraction of real robots.txt files and honored by major
    crawlers). Multiple values in starred groups collapse to the MAX
    (conservative politeness); non-numeric values are ignored."""
    d = _starred_lines(robots, host_col, body_col)
    val = F.trim(F.regexp_extract(F.lower("line"),
                                  r"^crawl-delay:\s*([0-9.]+)\s*$", 1))
    d = d.filter(val != "").withColumn("delay_s", val.cast("double"))
    return (d.filter(F.col("delay_s").isNotNull())
            .groupBy("host")
            .agg(F.max("delay_s").alias("delay_s")))


def _rule_match_cols(prefix):
    """(has_wildcard, anchored_regex) columns for an RFC 9309 rule
    pattern. §2.2.3 special characters: `*` matches any run of octets
    anywhere in the pattern; `$` anchors the end of the path when it is
    the LAST octet (elsewhere it is a literal). Everything else is a
    literal octet, so regex metacharacters in the rule must be escaped
    before `*` is widened to `.*`."""
    ends_d = prefix.endswith("$")
    core = F.when(ends_d, F.substring(
        prefix, 1, F.length(prefix) - 1)).otherwise(prefix)
    # escape Java-regex metachars except '*' (handled below); the
    # replacement '\\$1' emits a literal backslash before the match
    esc = F.regexp_replace(core, r"([.\\+?\[\]\(\)\^\{\}\|\$])",
                           r"\\$1")
    esc = F.regexp_replace(esc, r"\*", ".*")
    rgx = F.concat(F.lit("^"), esc,
                   F.when(ends_d, F.lit("$")).otherwise(F.lit("")))
    return (prefix.contains("*") | ends_d), rgx


def robots_filter(urls: DataFrame, rules: DataFrame,
                  url_col: str = "url") -> DataFrame:
    """urls + (host, directive, prefix) rules -> urls with `is_allowed`.

    RFC 9309 precedence via one broadcast join + max_by((len, allow)):
    the matching rule with the most pattern octets wins, Allow wins
    length ties, default allow when nothing matches. Patterns support
    the §2.2.3 special characters (`*` any-octets, trailing `$` end
    anchor) — wildcard rules match via an anchored regex built on the
    broadcast side; plain-prefix rules keep the cheap startswith path.

    The input row identity is preserved exactly (duplicate url rows
    stay duplicated): each row gets a join key from
    monotonically_increasing_id and the verdict is aggregated per key,
    so user columns named `prefix`/`directive`/etc cannot collide with
    the rule side either (internal names are __rb_-prefixed)."""
    RK, HOST, PATH = "__rb_rk", "__rb_host", "__rb_path"
    DIR, PFX, WILD, RGX = ("__rb_dir", "__rb_prefix", "__rb_wild",
                           "__rb_regex")
    for c in (RK, HOST, PATH, DIR, PFX, WILD, RGX):
        if c in urls.columns:
            raise ValueError(f"urls must not carry internal column {c}")
    u = urls.withColumn(RK, F.monotonically_increasing_id())
    u = u.withColumn(HOST, host_from_url(F.col(url_col)))
    rest = F.regexp_replace(F.substring_index(F.col(url_col), "#", 1),
                            r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.substring_index(rest, "/", 1)
    path = F.substring(rest, F.length(hostport) + 1, F.lit(1 << 30))
    u = u.withColumn(PATH,
                     F.when(path == "", F.lit("/")).otherwise(path))
    pfx = F.col(PFX)
    wild, rgx = _rule_match_cols(pfx)
    r = F.broadcast(rules.select(F.col("host").alias(HOST),
                                 F.col("directive").alias(DIR),
                                 F.col("prefix").alias(PFX))
                    .withColumn(WILD, wild)
                    .withColumn(RGX, rgx))
    match = F.when(pfx.isNull(), F.lit(False)) \
        .when(F.col(WILD), F.regexp_like(F.col(PATH), F.col(RGX))) \
        .otherwise(F.col(PATH).startswith(pfx))
    j = u.join(r, HOST, "left").withColumn("__rb_m", match)
    verdict = F.max_by(
        F.col(DIR),
        F.when(F.col("__rb_m"),
               F.struct(F.length(pfx).alias("l"),
                        (F.col(DIR) == "allow").cast("int")
                        .alias("a"))))
    firsts = [F.first(F.col(c)).alias(c) for c in urls.columns]
    agg = j.groupBy(RK).agg(*firsts, verdict.alias("__rb_v"))
    return agg.withColumn(
        "is_allowed",
        F.coalesce(F.col("__rb_v") == "allow", F.lit(True))
    ).drop("__rb_v", RK)
