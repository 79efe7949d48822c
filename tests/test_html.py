"""HTML main-content extraction (operators/html.py): hand-built
adversarial pages with known block classifications, entity/comment/
script semantics, NULL handling, and plan shape (zero exchange)."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.html import (extract_main_content,
                                                 html_block_table)

LONG = "these twelve ordinary words make the paragraph long enough ok"


def _pages(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, html string")


def _main(spark, rows):
    return {r.doc_id: r
            for r in extract_main_content(_pages(spark, rows)).collect()}


def test_content_vs_chrome(spark):
    out = _main(spark, [(1,
        "<html><head><title>T</title></head><body>"
        "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
        f"<p>{LONG}</p>"
        f"<footer>{LONG}</footer>"
        "</body></html>")])
    r = out[1]
    assert r.main_text == LONG          # head+nav+footer all stripped
    assert (r.n_content, r.n_nav) == (1, 2)   # nav and footer blocks
    assert r.main_chars == len(LONG)


def test_script_style_comment_dropped(spark):
    out = _main(spark, [(1,
        f"<p>{LONG}</p>"
        "<script type='x'>var p = '<p>fake</p>';</script>"
        "<style>p { color: red }</style>"
        f"<!-- <p>{LONG}</p> -->"
        f"<P CLASS='y'>{LONG}</P>")])       # uppercase tag
    r = out[1]
    assert r.main_text == f"{LONG} {LONG}"
    assert r.n_content == 2


def test_entities_decode_once(spark):
    out = _main(spark, [(1,
        f"<p>{LONG} &amp;lt; A&amp;B &lt;tag&gt; &quot;q&quot; &#39;s&#39; x&nbsp;y</p>")])
    # &amp;lt; -> &lt; (one decode, not '<'); planted entities decode
    assert out[1].main_text == \
        f'{LONG} &lt; A&B <tag> "q" \'s\' x y'


def test_link_density_boilerplate(spark):
    linkful = (f"<div><a href='1'>{LONG}</a> and <a href='2'>{LONG}</a>"
               " tiny glue</div>")
    out = _main(spark, [(1, linkful + f"<p>{LONG} {LONG}</p>")])
    r = out[1]
    assert (r.n_link, r.n_content) == (1, 1)
    assert r.main_text == f"{LONG} {LONG}"
    assert r.anchor_chars == 2 * len(LONG) + 1   # join space


def test_anchor_with_inline_markup(spark):
    out = _main(spark, [(1,
        f"<div><a href='x'><b>{LONG}</b></a></div>")])
    r = out[1]
    # anchor text is measured after inline-tag strip
    assert r.anchor_chars == len(LONG)
    assert r.n_link == 1


def test_short_blocks_and_br(spark):
    out = _main(spark, [(1, f"<p>tiny</p><p>{LONG}<br/>{LONG}</p>")])
    r = out[1]
    assert (r.n_short, r.n_content) == (1, 2)   # br splits the block
    assert r.main_text == f"{LONG} {LONG}"


def test_null_and_empty_and_tagless(spark):
    out = _main(spark, [(1, None), (2, ""), (3, "no tags at all " * 4)])
    assert (out[1].main_text, out[1].n_blocks) == ("", 0)
    assert (out[2].main_text, out[2].n_blocks) == ("", 0)
    # tagless text is one untagged block, content if long enough
    assert out[3].n_content == 1
    assert out[3].main_text == ("no tags at all " * 4).strip()


def test_sentinel_bytes_scrubbed(spark):
    out = _main(spark, [(1, f"<p>\x01evil\x02 {LONG}</p>")])
    assert out[1].main_text == f"evil {LONG}"
    assert out[1].n_content == 1


def test_nested_blocks_and_table(spark):
    rows = {(r.block_idx): r for r in html_block_table(_pages(spark, [
        (1, f"<table><tr><td>{LONG}</td><td>ok</td></tr></table>")
    ])).collect()}
    tags = [rows[i].tag for i in sorted(rows)]
    assert tags[:4] == ["", "table", "tr", "td"]
    cells = [r for r in rows.values() if r.tag == "td"]
    assert {c.cls for c in cells} == {"content", "short"}


def test_block_table_matches_main(spark):
    page = (f"<header><h1>{LONG}</h1></header><p>{LONG}</p>"
            f"<aside>{LONG}</aside>")
    tbl = html_block_table(_pages(spark, [(1, page)]))
    agg = tbl.groupBy("doc_id").agg(
        F.sum(F.when(F.col("cls") == "content", 1).otherwise(0))
         .alias("n_content")).collect()[0]
    main = _main(spark, [(1, page)])[1]
    # h1 inside header is its own block and long enough -> content;
    # aside is chrome by tag
    assert agg.n_content == main.n_content == 2
    assert main.n_nav == 2


def test_plan_zero_exchange(spark):
    df = extract_main_content(_pages(spark, [(1, "<p>x</p>")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# rich in the operator's 8-word stopword set (textstats.EN_STOPWORDS)
STOPPY = "the tide and the wind is one of the ways to see in an hour"


def test_web_curation_tiers_and_chrome_dedup(spark):
    from pdf_extraction_spark.operators.curation import curate_web_corpus
    body = f"<p>{STOPPY}</p>"
    pages = [
        (1, f"<nav><a href=x>only chrome here</a></nav>"),   # no_content
        (2, f"<p>{STOPPY} extra words</p>"),                 # kept
        # same main text as 2, different chrome -> duplicate
        (3, f"<header><h1>Other Site</h1></header><p>{STOPPY} extra"
            f" words</p><footer><a>Imprint</a></footer>"),
        (4, "<p>" + "word " * 30 + STOPPY + "</p>"),         # too_long
        (5, f"<p>{'zz ' * 20}this text has no stopword densitee"
            "</p>"),                                          # low_quality
    ]
    out = {r.doc_id: r for r in curate_web_corpus(
        _pages(spark, pages), min_tokens=10, max_tokens=40,
        min_stop_ppm=200_000).collect()}
    assert out[1].verdict == "no_content"
    assert out[2].verdict == "kept"
    assert out[3].verdict == "duplicate"
    assert out[3].keeper_id == 2
    assert out[3].content_hash == out[2].content_hash
    assert out[4].verdict == "too_long"
    assert out[5].verdict in ("low_quality", "language")


def test_web_curation_single_shuffle(spark):
    from pdf_extraction_spark.operators.curation import curate_web_corpus
    df = curate_web_corpus(_pages(spark, [(1, "<p>x</p>")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1      # only the keeper window


IMG_PAGE = (
    '<html><body>'
    '<h1>A substantial heading over twenty-five chars</h1>'
    '<img src="img://d/0" alt="x">'
    '<p>First paragraph long enough to classify as real content.</p>'
    "<p><img src='img://d/1'></p>"
    '<img src=img://d/2 width=3>'
    '<img alt="no src, no span">'
    '<footer><img src="chrome.png">(c)</footer>'
    '</body></html>')


def test_html_to_spans_interleaves_media_in_order(spark):
    from pdf_extraction_spark.operators.html import html_to_spans

    docs = spark.createDataFrame([("d", IMG_PAGE)],
                                 "doc_id string, html string")
    spans = html_to_spans(docs).collect()[0].spans
    assert [s.kind for s in spans] == \
        ["text", "media", "text", "media", "media", "media"]
    assert [s.media_ref for s in spans if s.kind == "media"] == \
        ["img://d/0", "img://d/1", "img://d/2", "chrome.png"]
    assert [s.offset for s in spans] == list(range(6))  # gapless
    assert all(s.text == "" for s in spans if s.kind == "media")
    assert all(s.media_ref == "" for s in spans if s.kind == "text")


def test_html_to_spans_feeds_fused_extraction(spark):
    """The bridge output IS the contract input: the fused extraction
    plan runs unchanged on crawl pages, and the north rule's media
    pass-through invariant holds end to end (kind, media_ref, order)."""
    from pdf_extraction_spark.operators.html import html_to_spans
    from pdf_extraction_spark.plans.fused import assemble_fused

    docs = spark.createDataFrame([("d", IMG_PAGE)],
                                 "doc_id string, html string")
    bridged = html_to_spans(docs)
    out = assemble_fused(bridged).collect()[0]
    in_spans = bridged.collect()[0].spans
    # the north-rule span-sequence invariant (kind, media_ref, order):
    # every input media span reappears in the output span sequence,
    # same refs, same relative order, text '' (output kind is the
    # oracle's KIND_MEDIA = 'media_ref' label)
    out_media = [s for s in out.spans if s.kind == "media_ref"]
    assert [s.media_ref for s in out_media] == \
        [s.media_ref for s in in_spans if s.kind == "media"]
    assert all(s.text == "" for s in out_media)
    # and the output carries the standard extraction schema
    assert {"doc_id", "metadata", "issues", "tables",
            "raw_sections", "summary"} <= set(out.asDict().keys())


def test_media_spans_chain_into_multimodal_decode(spark):
    """Web images flow end to end: html_to_spans media refs ->
    synthesize_media (the stand-in for a fetch/decode stage) ->
    decode_media feature extraction — the multimodal plumbing accepts
    the bridge's media_ref column unchanged."""
    from pdf_extraction_spark.operators.html import html_to_spans
    from pdf_extraction_spark.operators.multimodal import (decode_media,
                                                           synthesize_media)

    docs = spark.createDataFrame([("d", IMG_PAGE)],
                                 "doc_id string, html string")
    refs = html_to_spans(docs).select(
        F.explode("spans").alias("s")) \
        .where(F.col("s.kind") == "media") \
        .select(F.col("s.media_ref").alias("media_ref"))
    media = synthesize_media(spark, refs)
    feats = decode_media(media, fake=True).collect()
    assert {r.media_ref for r in feats} == \
        {"img://d/0", "img://d/1", "img://d/2", "chrome.png"}
    assert all(len(r.feature) > 0 for r in feats)


# ---------------------------------------------------------- tables


def test_html_table_rows_structure_and_normalization(spark):
    from pdf_extraction_spark.operators.html import html_table_rows
    html = ("<html><head><script>var t='<table><tr><td>ghost</td>"
            "</tr></table>';</script></head><body>"
            "<!-- <table><tr><td>c</td></tr></table> -->"
            "<table class='data'>"
            "<thead><tr><th>Item</th><th>Qty</th></tr></thead>"
            "<tbody><tr><td>pipe &amp; joint</td><td><b>2</b></td></tr>"
            "<tr><td></td><td>x</td></tr>"
            "<tr><td colspan='2'>subtotal</td></tr></tbody></table>"
            "<p>prose</p>"
            "<table><tr><td>A</td><td>B</td></tr></table>"
            "</body></html>")
    df = spark.createDataFrame([("d1", html)],
                               "doc_id string, html string")
    got = [(r.tbl_idx, r.row_idx, r.n_rows, r.n_cells, r.table_text)
           for r in html_table_rows(df)
           .orderBy("tbl_idx", "row_idx").collect()]
    assert got == [
        (0, 0, 4, 2, "Item | Qty"),        # th cells, header row
        (0, 1, 4, 2, "pipe & joint | 2"),  # entity + inline tag
        (0, 2, 4, 2, " | x"),              # empty cell keeps position
        (0, 3, 4, 1, "subtotal"),          # ragged row (colspan)
        (1, 0, 1, 2, "A | B"),             # second table
    ]


def test_html_table_rows_feed_the_s5_chain(spark):
    from pdf_extraction_spark.operators.html import html_table_rows
    from pdf_extraction_spark.operators.tables import (
        extract_tables, ruled_rows_as_spans)
    html = ("<table><tr><th>Item</th><th>Total Cost</th></tr>"
            "<tr><td>beam</td><td>$1,200.50</td></tr>"
            "<tr><td>pipe</td><td>$150.00</td></tr></table>")
    df = spark.createDataFrame([("d1", html)],
                               "doc_id string, html string")
    tables = extract_tables(
        ruled_rows_as_spans(html_table_rows(df))).collect()
    assert len(tables) == 1
    t = tables[0]
    assert t.headers == ["Item", "Total Cost"]
    assert t.table_data == [["beam", "$1,200.50"],
                            ["pipe", "$150.00"]]
    assert t.table_type == "cost_estimate"
    assert t.cost.min == 1200.5


def test_html_table_rows_null_and_tableless(spark):
    from pdf_extraction_spark.operators.html import html_table_rows
    df = spark.createDataFrame(
        [("d1", None), ("d2", "<p>no tables here</p>")],
        "doc_id string, html string")
    assert html_table_rows(df).count() == 0
