"""Gate queries for the crawl-politeness operators
(``operators/robots.py``): robots.txt parsing, URL admission, and
sitemap extraction.

Both engines build the SAME deterministic robots.txt / sitemap bodies
from doc_id arithmetic (one shared SQL expression, the
queries_html.py pattern); the Spark side runs the real operators
while the DuckDB oracle computes every expected row in CLOSED FORM
from the arithmetic — group formation, agent-group resolution,
longest-match precedence and the ``*``/``$`` pattern semantics are
forced to agree with RFC-9309-implied results, not with themselves.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.robots import parse_robots, robots_allowed, sitemap_urls

# the deterministic robots.txt body (identical SQL both engines):
# group 1 = sparkbot (allow/crawl-delay lines conditional), group 2 =
# '*' (tmp rule conditional, an anchored rule, the sitemap pointer)
_ROBOTS_EXPR = """
  '# robots for h' || doc_id || chr(10) ||
  'User-agent: SparkBot' || chr(10) ||
  'Disallow: /private' || chr(10) ||
  CASE WHEN doc_id % 2 = 0
       THEN 'Allow: /private/ok' || chr(10) ELSE '' END ||
  CASE WHEN doc_id % 3 = 0
       THEN 'Crawl-delay: ' || (1 + doc_id % 5) || chr(10)
       ELSE '' END ||
  chr(10) ||
  'User-agent: *' || chr(10) ||
  CASE WHEN doc_id % 4 = 0
       THEN 'Disallow: /tmp*' || chr(10) ELSE '' END ||
  'Disallow: /exact$' || chr(10) ||
  'Sitemap: https://h' || doc_id || '.example/sitemap.xml'
""".strip()


def _robots_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.concat(F.lit("h"), F.col("doc_id").cast("string"))
         .alias("host"),
        F.expr(_ROBOTS_EXPR).alias("robots"))


def q_robots_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 group formation: directive lines with running
    group_id (consecutive User-agent lines share a group), comments
    and blanks dropped, values case-preserved."""
    rules = parse_robots(_robots_df(spark, sf_dir))
    return rules.select(
        F.expr("CAST(substr(host, 2) AS BIGINT)").alias("doc_id"),
        "line_no", F.col("group_id").cast("int").alias("group_id"),
        "directive", "value") \
        .orderBy("doc_id", "line_no")


_SQL_RULES = """
WITH b AS (
  SELECT doc_id,
    CAST(doc_id % 2 = 0 AS INT) AS i1,
    CAST(doc_id % 3 = 0 AS INT) AS i2,
    CAST(doc_id % 4 = 0 AS INT) AS i3
  FROM documents),
u AS (
  SELECT doc_id, 1 AS line_no, 1 AS group_id,
    'user-agent' AS directive, 'SparkBot' AS value FROM b
  UNION ALL
  SELECT doc_id, 2, 1, 'disallow', '/private' FROM b
  UNION ALL
  SELECT doc_id, 3, 1, 'allow', '/private/ok' FROM b WHERE i1 = 1
  UNION ALL
  SELECT doc_id, 3 + i1, 1, 'crawl-delay',
    CAST(1 + doc_id % 5 AS VARCHAR) FROM b WHERE i2 = 1
  UNION ALL
  SELECT doc_id, 4 + i1 + i2, 2, 'user-agent', '*' FROM b
  UNION ALL
  SELECT doc_id, 5 + i1 + i2, 2, 'disallow', '/tmp*' FROM b
  WHERE i3 = 1
  UNION ALL
  SELECT doc_id, 5 + i1 + i2 + i3, 2, 'disallow', '/exact$' FROM b
  UNION ALL
  SELECT doc_id, 6 + i1 + i2 + i3, 2, 'sitemap',
    'https://h' || doc_id || '.example/sitemap.xml' FROM b)
SELECT doc_id, CAST(line_no AS INT) AS line_no,
  CAST(group_id AS INT) AS group_id, directive, value
FROM u ORDER BY doc_id, line_no
"""

_PATHS = ["/private/ok/x", "/private/y", "/tmp/z", "/exact",
          "/exactly", "/ok"]


def q_robots_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL admission for two agents: sparkbot resolves to its exact
    group (the '*' group must NOT leak in), newbot falls through to
    '*' — longest-match precedence, the * wildcard and the $ anchor
    all value-gated."""
    rules = parse_robots(_robots_df(spark, sf_dir))
    urls = _robots_df(spark, sf_dir).select(
        "host", F.explode(F.array(
            *[F.lit(p) for p in _PATHS])).alias("path"))
    out = []
    for agent in ("sparkbot", "newbot"):
        out.append(
            robots_allowed(urls, rules, agent=agent)
            .select(F.lit(agent).alias("agent"), "host", "path",
                    "allowed", "matched_rule"))
    u = out[0].unionByName(out[1])
    return u.select(
        "agent",
        F.expr("CAST(substr(host, 2) AS BIGINT)").alias("doc_id"),
        "path", "allowed", "matched_rule") \
        .orderBy("agent", "doc_id", "path")


_SQL_CHECK = """
WITH b AS (
  SELECT doc_id, doc_id % 2 = 0 AS has_ok, doc_id % 4 = 0 AS has_tmp
  FROM documents),
p AS (
  SELECT doc_id, has_ok, has_tmp, path FROM b,
  (SELECT UNNEST(['/private/ok/x', '/private/y', '/tmp/z',
                  '/exact', '/exactly', '/ok']) AS path)),
u AS (
  -- sparkbot: exact group (1) only
  SELECT 'sparkbot' AS agent, doc_id, path,
    CASE WHEN path = '/private/y' THEN FALSE
         WHEN path = '/private/ok/x' THEN has_ok
         ELSE TRUE END AS allowed,
    CASE WHEN path = '/private/y' THEN '/private'
         WHEN path = '/private/ok/x' THEN
           CASE WHEN has_ok THEN '/private/ok' ELSE '/private' END
         ELSE NULL END AS matched_rule
  FROM p
  UNION ALL
  -- newbot: no exact group, '*' group (2) applies
  SELECT 'newbot', doc_id, path,
    CASE WHEN path = '/exact' THEN FALSE
         WHEN path = '/tmp/z' THEN NOT has_tmp
         ELSE TRUE END,
    CASE WHEN path = '/exact' THEN '/exact$'
         WHEN path = '/tmp/z' AND has_tmp THEN '/tmp*'
         ELSE NULL END
  FROM p)
SELECT agent, doc_id, path, allowed, matched_rule
FROM u ORDER BY agent, doc_id, path
"""

# deterministic sitemap body: even docs a <urlset> (one entry with
# lastmod + whitespace-padded loc, one without), odd docs a
# <sitemapindex> with two child sitemaps
_SITEMAP_EXPR = """
  CASE WHEN doc_id % 2 = 0 THEN
    '<?xml version="1.0"?><urlset><url><loc> https://h' || doc_id ||
    '.example/p1 </loc><lastmod>2026-0' || (1 + doc_id % 9) ||
    '-01</lastmod></url><url><loc>https://h' || doc_id ||
    '.example/p2</loc></url></urlset>'
  ELSE
    '<sitemapindex><sitemap><loc>https://h' || doc_id ||
    '.example/s1.xml</loc></sitemap><sitemap><loc>https://h' ||
    doc_id || '.example/s2.xml</loc><lastmod>2026-01-0' ||
    (1 + doc_id % 9) || '</lastmod></sitemap></sitemapindex>'
  END
""".strip()


def q_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap XML flattening: <urlset> entries as kind='url',
    <sitemapindex> children as kind='sitemap', loc trimmed, lastmod
    empty when absent — zero shuffle."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.concat(F.lit("h"), F.col("doc_id").cast("string"))
         .alias("host"),
        F.expr(_SITEMAP_EXPR).alias("xml"))
    out = sitemap_urls(d)
    return out.select(
        F.expr("CAST(substr(host, 2) AS BIGINT)").alias("doc_id"),
        "kind", "loc", "lastmod").orderBy("doc_id", "loc")


_SQL_SITEMAP = """
WITH u AS (
  SELECT doc_id, 'url' AS kind,
    'https://h' || doc_id || '.example/p1' AS loc,
    '2026-0' || (1 + doc_id % 9) || '-01' AS lastmod
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id, 'url',
    'https://h' || doc_id || '.example/p2', ''
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id, 'sitemap',
    'https://h' || doc_id || '.example/s1.xml', ''
  FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id, 'sitemap',
    'https://h' || doc_id || '.example/s2.xml',
    '2026-01-0' || (1 + doc_id % 9)
  FROM documents WHERE doc_id % 2 = 1)
SELECT doc_id, kind, loc, lastmod FROM u ORDER BY doc_id, loc
"""


QUERIES_ROBOTS: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "robots_rules": q_robots_rules,
    "robots_check": q_robots_check,
    "sitemap_parse": q_sitemap_parse,
}

ORACLES_ROBOTS: dict[str, str] = {
    "robots_rules": _SQL_RULES,
    "robots_check": _SQL_CHECK,
    "sitemap_parse": _SQL_SITEMAP,
}


# RSS on even docs, Atom on odd; entry 1 carries whitespace-padded
# link + both Atom timestamps (published must win), entry 2 minimal,
# RSS adds a linkless decoy item that must drop
_FEED_EXPR = """
  CASE WHEN doc_id % 2 = 0 THEN
    '<rss version="2.0"><channel><title>Chan' || doc_id ||
    '</title><item><title> I' || doc_id ||
    'a </title><link> https://h' || doc_id ||
    '.example/r1 </link><pubDate>Tue, 0' || (1 + doc_id % 9) ||
    ' Jul 2026 10:00:00 GMT</pubDate></item>' ||
    '<item><title>I' || doc_id || 'b</title><link>https://h' ||
    doc_id || '.example/r2</link></item>' ||
    '<item><title>nolink' || doc_id || '</title></item>' ||
    '</channel></rss>'
  ELSE
    '<feed xmlns="http://www.w3.org/2005/Atom"><title>F' || doc_id ||
    '</title><entry><title>E' || doc_id ||
    'a</title><link rel="alternate" href="https://h' || doc_id ||
    '.example/a1"/><published>2026-07-0' || (1 + doc_id % 9) ||
    'T00:00:00Z</published><updated>2026-08-01T00:00:00Z</updated>' ||
    '</entry><entry><title>E' || doc_id ||
    'b</title><link href="https://h' || doc_id ||
    '.example/a2"/><updated>2026-08-0' || (1 + doc_id % 9) ||
    'T00:00:00Z</updated></entry></feed>'
  END
""".strip()


def q_feed_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSS/Atom feed flattening: item/entry rows with link + the
    preferred timestamp (Atom published > updated), linkless entries
    dropped — zero shuffle."""
    from .operators.robots import feed_entries
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.concat(F.lit("h"), F.col("doc_id").cast("string"))
         .alias("host"),
        F.expr(_FEED_EXPR).alias("xml"))
    out = feed_entries(d)
    return out.select(
        F.expr("CAST(substr(host, 2) AS BIGINT)").alias("doc_id"),
        "fmt", "title", "link", "published") \
        .orderBy("doc_id", "link")


_SQL_FEED = """
WITH u AS (
  SELECT doc_id, 'rss' AS fmt, 'I' || doc_id || 'a' AS title,
    'https://h' || doc_id || '.example/r1' AS link,
    'Tue, 0' || (1 + doc_id % 9) || ' Jul 2026 10:00:00 GMT'
      AS published
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id, 'rss', 'I' || doc_id || 'b',
    'https://h' || doc_id || '.example/r2', ''
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id, 'atom', 'E' || doc_id || 'a',
    'https://h' || doc_id || '.example/a1',
    '2026-07-0' || (1 + doc_id % 9) || 'T00:00:00Z'
  FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id, 'atom', 'E' || doc_id || 'b',
    'https://h' || doc_id || '.example/a2',
    '2026-08-0' || (1 + doc_id % 9) || 'T00:00:00Z'
  FROM documents WHERE doc_id % 2 = 1)
SELECT doc_id, fmt, title, link, published
FROM u ORDER BY doc_id, link
"""

QUERIES_ROBOTS["feed_parse"] = q_feed_parse
ORACLES_ROBOTS["feed_parse"] = _SQL_FEED
