"""Unit tests for operators/links.py: link extraction, URL
normalization, host rollup, <head> metadata — every documented
contract case from the module docstring."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.links import (head_meta, host_stats,
                                                  link_table, url_parts)

PAGE = (
    '<html><head><title> The &amp; Title <b>x</b> </title>'
    '<meta name="description" content="desc &lt;here&gt;">'
    '<meta content="rev-first" name="keywords">'
    '</head><body>'
    '<p><a href="HTTP://User@WWW.Example.COM:80/Dir/P?q=1#top">'
    'first <b>link</b></a></p>'
    "<a class='x' href='https://Secure.org:8443/a%20b'>second</a>"
    '<a href=/rel/page>third</a>'
    '<a href="//cdn.net/l.js">fourth</a>'
    '<a data-href="trap.html">not-a-link</a>'
    '<a href="mailto:a@b.c">fifth</a>'
    '<a name="anchor-only">no href</a>'
    '<a href="x?a=1&amp;b=2">sixth</a>'
    '</body></html>')


@pytest.fixture(scope="module")
def links(spark):
    docs = spark.createDataFrame(
        [("d1", PAGE, "www.example.com")],
        "doc_id string, html string, page_host string")
    return link_table(docs, carry=("page_host",)).collect()


def test_link_extraction_order_and_traps(links):
    # 6 real links; data-href and href-less anchors never match
    assert [r.link_idx for r in links] == list(range(6))
    assert [r.anchor_text for r in links] == [
        "first link", "second", "third", "fourth", "fifth", "sixth"]


def test_href_quote_forms_and_entities(links):
    assert links[1].href == "https://Secure.org:8443/a%20b"  # single-q
    assert links[2].href == "/rel/page"                      # unquoted
    assert links[5].href == "x?a=1&b=2"                      # &amp; decoded


def test_url_normalization(links):
    r = links[0]
    assert (r.scheme, r.host, r.port) == ("http", "www.example.com", "80")
    assert (r.path, r.query, r.fragment) == ("/Dir/P", "q=1", "top")
    # lowercase scheme/host, userinfo stripped, default port dropped,
    # fragment dropped, path case preserved
    assert r.url_norm == "http://www.example.com/Dir/P?q=1"
    assert links[1].url_norm == "https://secure.org:8443/a%20b"
    assert links[3].url_norm == "//cdn.net/l.js"
    assert links[4].url_norm == "mailto:a@b.c"


@pytest.mark.parametrize("url,norm,host", [
    ("HTTPS://H.ORG:443/", "https://h.org/", "h.org"),
    ("https://h.org", "https://h.org/", "h.org"),       # empty path -> /
    ("https://[2001:DB8::1]:443/v6", "https://[2001:db8::1]/v6",
     "[2001:db8::1]"),
    ("page.html#sec", "page.html", ""),
    ("", "", ""),
    (None, "", ""),
])
def test_url_parts_edges(spark, url, norm, host):
    df = spark.createDataFrame([(url,)], "u string")
    p = url_parts(F.col("u"))
    row = df.select(p["url_norm"].alias("n"),
                    p["host"].alias("h")).collect()[0]
    assert (row.n, row.h) == (norm, host)


def test_host_stats_rollup(spark):
    docs = spark.createDataFrame(
        [("d1", PAGE, "www.example.com"),
         ("d2", '<a href="https://www.example.com/x">self</a>'
                '<a href="/local">rel</a>', "www.example.com")],
        "doc_id string, html string, page_host string")
    stats = {r.host: r for r in host_stats(
        link_table(docs, carry=("page_host",))).collect()}
    ex = stats["www.example.com"]
    assert (ex.n_links, ex.n_pages) == (2, 2)   # d1 abs + d2 self
    assert ex.n_internal == 2                   # both pages' own host
    rel = stats[""]                             # relative + mailto
    # mailto: has empty host but a scheme -> external pseudo-link;
    # the true relative links ('/rel/page', 'x?a=1&b=2', '/local')
    # count as internal
    assert rel.n_pages == 2
    assert rel.n_internal == rel.n_links - 1


def test_head_meta_both_attribute_orders(spark):
    docs = spark.createDataFrame([("d1", PAGE)],
                                 "doc_id string, html string")
    r = head_meta(docs).collect()[0]
    assert r.title == "The & Title x"
    assert r.meta_description == "desc <here>"
    assert r.meta_keywords == "rev-first"       # content-before-name


def test_head_meta_null_and_missing(spark):
    docs = spark.createDataFrame([("d1", None), ("d2", "<p>no head</p>")],
                                 "doc_id string, html string")
    rows = {r.doc_id: r for r in head_meta(docs).collect()}
    for r in rows.values():
        assert (r.title, r.meta_description, r.meta_keywords) == \
            ("", "", "")


def test_filter_hosts_suffix_semantics_and_plan(spark):
    """Deny-list drops exact hosts and subdomains of denied parents,
    keeps lookalikes (notexample.com); the corpus side plans as stacked
    broadcast anti-joins — zero Exchange, zero corpus shuffle."""
    from pdf_extraction_spark.operators.curation import filter_hosts

    docs = spark.createDataFrame(
        [("a", "https://ads.example.com/x"),       # subdomain of denied
         ("b", "https://example.com/y"),           # exact denied
         ("c", "https://notexample.com/z"),        # lookalike survives
         ("d", "https://good.org/w"),
         ("e", "/relative/no-host"),               # host '' survives
         ("f", "https://bad.co.uk/v")],            # 3-label deny entry
        "doc_id string, url string")
    kept = filter_hosts(docs, ["example.com", "bad.co.uk"])
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids == ["c", "d", "e"] or ids == ["c", "d", "e", "f"]
    # bad.co.uk is a 3-label entry: f must be dropped
    assert "f" not in ids
    plan = kept._jdf.queryExecution().executedPlan().toString()
    # deny side broadcasts; the corpus side never hash-partitions
    # (post-collect the adaptive plan prints initial+final sections,
    # so node counts are asserted as lower bounds)
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("BroadcastExchange") >= 2   # one per label count
    assert plan.count("BroadcastHashJoin") >= 2
    assert "LeftAnti" in plan


def test_links_ignore_comments_scripts_and_head(spark):
    """Anchors inside comments, script/style bodies, or the <head>
    are not links — the same drop prepass block segmentation runs."""
    page = ('<head><a href="http://head.example/h">h</a></head>'
            '<!-- <a href="http://ghost.example/g">old</a> -->'
            '<script>var s = \'<a href="http://js.example/j">x</a>\';'
            '</script>'
            '<style>a:after { content: \'<a href=c>\' }</style>'
            '<p><a href="http://real.example/r">real</a></p>')
    docs = spark.createDataFrame([("d", page)],
                                 "doc_id string, html string")
    rows = link_table(docs).collect()
    assert [r.href for r in rows] == ["http://real.example/r"]


def test_head_meta_single_quoted_and_unquoted_attrs(spark):
    """Meta attribute values in single quotes or unquoted normalize to
    the double-quoted grammar before extraction."""
    page = ("<head><title>T</title>"
            "<meta name='description' content='single quoted desc'>"
            "<meta content=unqkw name=keywords></head>")
    docs = spark.createDataFrame([("d", page)],
                                 "doc_id string, html string")
    r = head_meta(docs).collect()[0]
    assert r.meta_description == "single quoted desc"
    assert r.meta_keywords == "unqkw"
