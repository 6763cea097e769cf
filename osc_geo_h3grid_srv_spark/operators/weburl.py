"""URL canonicalization and domain analytics for web-corpus pipelines.

A web-scale text pipeline keys almost everything by URL: dedup wants a
canonical form (tracking params and fragments stripped, case folded,
default ports dropped, params sorted), filtering wants the registrable
domain (public-suffix aware), and curation wants per-domain rollups.

All of it is string algebra, so everything here compiles to JVM codegen
expressions — `split` / `substring_index` / higher-order `filter` +
`array_sort` — with ZERO Python and zero shuffles for the per-row pass.
The only shuffle in the module is the intentional one: the per-domain
aggregate. The DuckDB oracles replay the same algebra with
`split_part` / `list_filter` / `list_sort`.

Public-suffix handling uses a small embedded two-level-TLD list (the
full Mozilla PSL is a data file, not an algorithm change); hosts whose
last two labels are in the list keep three labels, others keep two —
the standard registrable-domain rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# two-level public suffixes recognized by the embedded list (extend as
# needed; the algorithm is the PSL rule, the list is data)
TWO_LEVEL_SUFFIXES = ("co.uk", "ac.uk", "com.au", "co.jp", "com.br")

# query params stripped during canonicalization (tracking noise)
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid", "ref")


def canonicalize_url(url) -> Column:
    """canonical form of a messy URL: fragment stripped, scheme+host
    lowercased, leading `www.` removed, default ports (80/443) dropped,
    tracking params removed, surviving params sorted. Pure JVM column
    expression (safe to use inside a 100 TB map stage)."""
    u = F.substring_index(url, "#", 1)            # strip fragment
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.substring_index(rest, "/", 1)
    pathq = F.substring(rest, F.length(hostport) + 1, F.lit(1 << 30))
    host = F.regexp_replace(
        F.lower(F.substring_index(hostport, ":", 1)), r"^www\.", "")
    port = F.when(hostport.contains(":"),
                  F.substring_index(hostport, ":", -1)).otherwise(F.lit(""))
    keep_port = (
        (port != "")
        & ~((scheme == "https") & (port == "443"))
        & ~((scheme == "http") & (port == "80")))
    path = F.substring_index(pathq, "?", 1)
    query = F.when(pathq.contains("?"),
                   F.substring(pathq, F.instr(pathq, "?") + 1,
                               F.lit(1 << 30))).otherwise(F.lit(""))
    kept = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~F.coalesce(
            _is_tracking(p), F.lit(False))))
    qcanon = F.array_join(kept, "&")
    return F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon))
        .otherwise(F.lit("")))


def _is_tracking(p: Column) -> Column:
    c = F.lit(False)
    for pfx in TRACKING_PREFIXES:
        pat = pfx if pfx.endswith("_") else pfx + "="
        c = c | p.startswith(pat)
    return c


def host_of(canon_url) -> Column:
    """host part of an already-canonical URL (lowercase, no www/port)."""
    rest = F.regexp_replace(canon_url, r"^[a-z][a-z0-9+.-]*://", "")
    return F.substring_index(F.substring_index(
        F.substring_index(rest, "/", 1), ":", 1), "?", 1)


def host_from_url(url) -> Column:
    """canonical host straight from the MESSY url (same folding rules
    canonicalize_url applies). Deriving host from the raw column —
    not from canon_url — keeps the expression tree small: Catalyst's
    CollapseProject substitutes a referenced alias by its defining
    expression at every use site, so host_of(canonicalize_url(u))
    inlines the entire ~50-node canonical expression 3x, and
    registrable_domain(host) would inline THAT 8x more (~700 copies,
    a 400 KB plan whose codegen compile costs seconds before the
    first row). Measured: 12.8 s -> 0.3 s on a 50-row input."""
    u = F.substring_index(url, "#", 1)
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    return F.regexp_replace(
        F.lower(F.substring_index(
            F.substring_index(rest, "/", 1), ":", 1)),
        r"^www\.", "")


def surt_urlkey(url) -> Column:
    """SURT urlkey (Sort-friendly URI Reordering Transform, the public
    key format of CDX crawl indexes): host labels reversed and
    comma-joined, then ')' + path — `https://www.example.org/a/b` ->
    `org,example)/a/b`. Hosts sort by registrable domain first, so a
    CDX file range-scans per site. Pure JVM column algebra (reverse +
    array_join on the already-canonical host), fragment dropped, empty
    path -> '/'."""
    host = host_from_url(url)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    rest = F.regexp_replace(F.substring_index(url, "#", 1),
                            r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.substring_index(rest, "/", 1)
    path = F.substring(rest, F.length(hostport) + 1, F.lit(1 << 30))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.concat(rev, F.lit(")"), path)


def registrable_domain(host) -> Column:
    """PSL-rule registrable domain: last two labels, or last three when
    the two-label suffix is on the embedded two-level list."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2),
                        F.element_at(labels, -1))
    last3 = F.concat_ws(".", F.element_at(labels, -3),
                        F.element_at(labels, -2), F.element_at(labels, -1))
    is2lvl = F.lit(False)
    for s in TWO_LEVEL_SUFFIXES:
        is2lvl = is2lvl | (last2 == s)
    return (F.when(n <= 2, F.concat_ws(".", labels))
            .when(is2lvl & (n >= 3), last3)
            .otherwise(last2))


# href attribute of <a> tags; group 1 = the target URL. Double-quoted
# hrefs only (the synthetic corpus and WARC fixtures emit exactly this
# form; single-quote/unquoted variants are a regex alternation away).
LINK_HREF_RE = r'<a\s+href="([^"]*)"'


def extract_links(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """(src_url, href) edge list from raw page HTML — the link-graph
    ingestion step of a web-corpus pipeline (Common-Crawl wat-style
    outlink extraction).

    One JVM projection: the binary html column is cast to string
    (UTF-8 decode in codegen) and scanned with `regexp_extract_all`,
    then exploded. No Python, no shuffle — the exchange (if any)
    belongs to whatever aggregates the edges downstream. Pages with no
    <a href> emit no rows (explode drops empty arrays), which is what
    a link graph wants."""
    hrefs = F.regexp_extract_all(
        F.col(html_col).cast("string"), F.lit(LINK_HREF_RE), F.lit(1))
    return pages.select(F.col(url_col).alias("src_url"),
                        F.explode(hrefs).alias("href"))


def link_domain_edges(pages: DataFrame, url_col: str = "url",
                      html_col: str = "html") -> DataFrame:
    """host-level link graph: (src_host, dst_host, n_links bigint,
    n_urls bigint) with n_urls = distinct CANONICAL targets (tracking
    params collapse). extract_links + the module's canonical host
    algebra + one groupBy — the module's second intentional shuffle."""
    e = extract_links(pages, url_col=url_col, html_col=html_col)
    e = e.select(
        host_from_url(F.col("src_url")).alias("src_host"),
        host_from_url(F.col("href")).alias("dst_host"),
        canonicalize_url(F.col("href")).alias("canon"))
    return (e.groupBy("src_host", "dst_host")
            .agg(F.count("*").cast("bigint").alias("n_links"),
                 F.countDistinct("canon").cast("bigint").alias("n_urls")))


def url_table(docs: DataFrame, url_col: str = "url",
              blocked_domains: tuple = ()) -> DataFrame:
    """per-row canonical URL + host + registrable domain + blocklist
    flag. One shuffle-free codegen projection; the blocklist is a
    literal IN filter (tiny lists) — swap for a broadcast anti-join
    when the list outgrows an IN expression."""
    canon = canonicalize_url(F.col(url_col))
    out = (docs.withColumn("canon_url", canon)
           .withColumn("host", host_from_url(F.col(url_col)))
           .withColumn("domain", registrable_domain(F.col("host"))))
    if blocked_domains:
        blocked = F.col("domain").isin(*blocked_domains)
    else:
        blocked = F.lit(False)
    return out.withColumn("is_blocked", blocked)


def domain_rollup(urls: DataFrame, weight_col: str = "n_chars"
                  ) -> DataFrame:
    """per-domain curation stats over non-blocked rows: docs, distinct
    hosts, total weight. The module's single intentional shuffle —
    groupBy(domain) with map-side partial aggregation."""
    return (urls.filter(~F.col("is_blocked"))
            .groupBy("domain")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.countDistinct("host").cast("bigint").alias("n_hosts"),
                 F.sum(weight_col).cast("bigint").alias("total_weight")))


def inlink_profile(pages: DataFrame, url_col: str = "url",
                   html_col: str = "html") -> DataFrame:
    """per-TARGET inlink profile: (target canonical url, n_inlinks,
    n_src_hosts) — the classic page-quality prior (a page linked from
    many distinct hosts is unlikely to be spam/boilerplate; single-host
    inlink mass usually is). extract_links + canonical collapse + ONE
    groupBy(target): n_src_hosts uses a partial-distinct aggregate, so
    the shuffle carries (target, src_host) pairs at worst — never the
    raw href strings. Self-links (src host == target host) are counted
    but visible via n_src_hosts=1, leaving the policy to the caller."""
    e = extract_links(pages, url_col=url_col, html_col=html_col)
    e = e.select(canonicalize_url(F.col("href")).alias("target"),
                 host_from_url(F.col("src_url")).alias("src_host"))
    return (e.groupBy("target")
            .agg(F.count("*").cast("bigint").alias("n_inlinks"),
                 F.countDistinct("src_host").cast("bigint")
                 .alias("n_src_hosts")))


#: anchor form: href in group 1, the visible anchor text in group 2
ANCHOR_RE = r'<a\s+href="([^"]*)"[^>]*>([^<]*)</a>'


def extract_anchors(pages: DataFrame, url_col: str = "url",
                    html_col: str = "html") -> DataFrame:
    """(src_url, href, anchor) triples from raw page HTML — anchor text
    is how the REST of the web describes a page, the classic external
    relevance signal (used by every major ranker since Brin & Page 98).

    Same single-JVM-projection discipline as extract_links: the html
    is decoded once and scanned twice with `regexp_extract_all` (group
    1 = href, group 2 = anchor text, same pattern so the arrays align
    index-for-index), zipped, and exploded. No Python, no shuffle."""
    s = F.col(html_col).cast("string")
    pairs = F.arrays_zip(
        F.regexp_extract_all(s, F.lit(ANCHOR_RE), F.lit(1)).alias("href"),
        F.regexp_extract_all(s, F.lit(ANCHOR_RE), F.lit(2))
        .alias("anchor"))
    return (pages.select(F.col(url_col).alias("src_url"),
                         F.explode(pairs).alias("p"))
            .select("src_url", F.col("p.href").alias("href"),
                    F.col("p.anchor").alias("anchor")))


def anchor_text_profile(pages: DataFrame, k: int = 3,
                        url_col: str = "url",
                        html_col: str = "html") -> DataFrame:
    """per-TARGET anchor-term profile: for each canonical target url,
    the top-`k` terms of its incoming anchor text by (mentions desc,
    term asc), with the distinct-source-host support of each term —
    the retrieval-side complement of inlink_profile (anchor terms feed
    BM25F-style external fields; host support separates organic
    description from single-host anchor spam).

    Scale shape: one (target, term) groupBy with partial-distinct host
    aggregation — the shuffle key is never wider than (canonical url,
    term) — then a per-target window for the top-k cut. The window
    partitions by target over per-target TERM VOCABULARIES (bounded by
    anchor language, not corpus size), so no rangepartitioning/global
    sort appears in the plan."""
    from pyspark.sql import Window
    a = extract_anchors(pages, url_col=url_col, html_col=html_col)
    terms = (a.select(
        canonicalize_url(F.col("href")).alias("target"),
        host_from_url(F.col("src_url")).alias("src_host"),
        F.explode(F.split(F.lower(F.trim(F.col("anchor"))),
                          r"\s+")).alias("term"))
        .filter(F.col("term") != ""))
    tc = (terms.groupBy("target", "term")
          .agg(F.count("*").cast("bigint").alias("n_mentions"),
               F.countDistinct("src_host").cast("bigint")
               .alias("n_src_hosts")))
    w = Window.partitionBy("target").orderBy(
        F.col("n_mentions").desc(), F.col("term").asc())
    return (tc.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("target", "term", "n_mentions", "n_src_hosts",
                    F.col("rank").cast("int").alias("rank")))
