"""Differential fuzz harness (committed so the campaign is
reproducible — usage: python tools/fuzz_links.py LO HI):
operators/links.py (Spark) vs its DuckDB SQL twin, two targets per
seed:

* link extraction + per-link URL parsing over random adversarial
  HTML-ish pages (anchor zoo: quote forms, data-href traps, unclosed
  anchors, entities in hrefs, nested markup, sentinel bytes);
* URL parsing alone over random adversarial URL strings (scheme zoo,
  userinfo, ports, IPv6 brackets, %-escapes, empty parts, stray
  delimiters, whitespace).
"""

import random
import sys

import duckdb
import pandas as pd

sys.path.insert(0, __import__("os").path.dirname(__import__("os")
                .path.dirname(__import__("os").path.abspath(__file__))))

from pyspark.sql import functions as F

from pdf_extraction_spark.operators.links import (head_meta, link_table,
                                                  url_parts)
from pdf_extraction_spark.queries_links import (_URL_COLS, sql_html_head,
                                                sql_html_links,
                                                sql_url_parts)
from pdf_extraction_spark.session import get_spark

WORDS = ["click", "here", "more", "x", "&amp;", "&lt;", "a<b", "5>4",
         "link", "text", "now", "&amp;amp;", "\x01", "read"]

HREFS = ["/a/b", "x.html", "HTTP://Ex.COM:80/p?q=1#f",
         "https://User:pw@H.org:8443/%20x?a=1&amp;b=2",
         "//cdn.net/l.js", "mailto:a@b.c", "ftp://f.ex:21/p",
         "page#frag", "?only=query", "#only-frag", "",
         "https://[2001:db8::1]:443/v", "a b", "'quoted'",
         "https://h.org:/empty-port", "  /lead-space",
         "x?a=1&b=2&c", "javascript:void(0)", "tel:+1-713-555",
         "HTTPS://UP.Example.COM/Case"]

ATTRS = ["", " class='k'", " id=z", " data-href='trap'", " rel=nofollow",
         " title=\"a > b\"", "\ntarget=_blank", " /"]


def _words(rng, lo=0, hi=6):
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(lo, hi)))


def gen_page(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randint(1, 25)):
        r = rng.random()
        href = rng.choice(HREFS)
        attr = rng.choice(ATTRS)
        quote = rng.choice(['"', "'", ""])
        if r < 0.45:
            body = _words(rng)
            if rng.random() < 0.3:
                body = f"<b>{body}</b><i>x</i>"
            closing = "</a>" if rng.random() < 0.85 else ""
            href_q = href if quote else href.replace(" ", "")
            parts.append(
                f"<a{attr} href={quote}{href_q}{quote}>{body}{closing}")
        elif r < 0.55:
            parts.append(f"<a{attr}>{_words(rng)}</a>")   # no href
        elif r < 0.63:
            parts.append(f"<a data-href=\"{href}\">trap</a>")
        elif r < 0.72:
            parts.append(f"<p>{_words(rng, 1, 10)}</p>")
        elif r < 0.80:
            parts.append(rng.choice(
                ["<!-- <a href=x>c</a> -->", "< a href=y>sp</a>",
                 "<ahref=z>nosp</a>", "<A HREF=\"UP.html\">caps</A>"]))
        else:
            parts.append(_words(rng, 1, 8))
    return "".join(parts)


def gen_url(rng: random.Random) -> str:
    pieces = []
    if rng.random() < 0.5:
        pieces.append(rng.choice(
            ["http:", "HTTPS:", "Ftp:", "mailto:", "a+b-c.d:", ":",
             "1http:", ""]))
    if rng.random() < 0.6:
        pieces.append("//")
        if rng.random() < 0.3:
            pieces.append(rng.choice(["user@", "u:p@", "@", "a@b@"]))
        pieces.append(rng.choice(
            ["Ex.COM", "h", "[2001:db8::1]", "127.0.0.1", "", "ex_x.y"]))
        if rng.random() < 0.4:
            pieces.append(rng.choice([":80", ":443", ":8080", ":",
                                      ":0", ":x"]))
    if rng.random() < 0.7:
        pieces.append(rng.choice(
            ["/p/q", "/", "p", "/%20a", "/a//b", "/A/B.Html"]))
    if rng.random() < 0.5:
        pieces.append(rng.choice(
            ["?a=1", "?", "?a=1&b=2", "??x", "?q=a b"]))
    if rng.random() < 0.5:
        pieces.append(rng.choice(["#f", "#", "#a#b", "#q?x=1"]))
    return "".join(pieces)


LINK_COLS = ["doc_id", "link_idx", "href", "anchor_text",
             *_URL_COLS]
PAGES = ("SELECT doc_id, COALESCE(html, '') AS page, "
         "'h.example' AS page_host FROM corpus")
HEAD_PAGES = "SELECT doc_id, COALESCE(html, '') AS raw FROM corpus"
HEAD_COLS = ["doc_id", "title", "meta_description", "meta_keywords"]

META_NAMES = ["description", "keywords", "viewport", "author"]


def gen_head(rng: random.Random) -> str:
    parts = ["<head>"]
    if rng.random() < 0.8:
        parts.append(f"<title{rng.choice(ATTRS)}>{_words(rng, 0, 6)}"
                     + ("</title>" if rng.random() < 0.9 else ""))
    quotes = ['"', "'", ""]
    for _ in range(rng.randint(0, 6)):
        name = rng.choice(META_NAMES)
        q1, q2 = rng.choice(quotes), rng.choice(quotes)
        content = _words(rng, 0, 5)
        if q2 != '"':
            content = content.replace("'", "")
        if not q2:
            content = content.replace(" ", "_")
        a = f"name={q1}{name}{q1}"
        b = f"content={q2}{content}{q2}"
        inner = f"{a} {b}" if rng.random() < 0.5 else f"{b} {a}"
        extra = rng.choice(["", " data-x=1", " /"])
        parts.append(f"<meta {inner}{extra}>")
    parts.append("</head><body><p>x</p></body>")
    return "".join(parts)


def main() -> None:
    seeds = range(int(sys.argv[1]), int(sys.argv[2]))
    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for seed in seeds:
        rng = random.Random(seed)
        rows = [(i, gen_page(rng)) for i in range(20)]
        if seed % 7 == 0:
            rows.append((len(rows), None))
        pdf = pd.DataFrame(rows, columns=["doc_id", "html"])
        sdf = spark.createDataFrame(pdf.assign(
            doc_id=pdf.doc_id.astype("int64")))
        con = duckdb.connect()
        con.register("corpus", pdf)

        s = link_table(sdf).toPandas()[LINK_COLS] \
            .sort_values(["doc_id", "link_idx"]).reset_index(drop=True)
        o = con.sql(sql_html_links(PAGES)).df()[LINK_COLS] \
            .sort_values(["doc_id", "link_idx"]).reset_index(drop=True)

        updf = pd.DataFrame(
            [(i, gen_url(rng)) for i in range(60)],
            columns=["doc_id", "u"])
        su = spark.createDataFrame(updf.assign(
            doc_id=updf.doc_id.astype("int64")))
        parts = url_parts(F.col("u"))
        s2 = su.select("doc_id",
                       *[parts[n].alias(n) for n in _URL_COLS]) \
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        con.register("urls", updf)
        p2 = sql_url_parts("u")
        o2 = con.sql(
            "SELECT doc_id, "
            + ", ".join(f"{p2[n]} AS {n}" for n in _URL_COLS)
            + " FROM urls ORDER BY doc_id").df() \
            .sort_values("doc_id").reset_index(drop=True)

        hrows = [(i, gen_head(rng)) for i in range(25)]
        if seed % 5 == 0:
            hrows.append((len(hrows), None))
        hpdf = pd.DataFrame(hrows, columns=["doc_id", "html"])
        hs = spark.createDataFrame(hpdf.assign(
            doc_id=hpdf.doc_id.astype("int64")))
        s3 = head_meta(hs).toPandas()[HEAD_COLS] \
            .sort_values("doc_id").reset_index(drop=True)
        con.register("corpus_head", hpdf)
        o3 = con.sql(sql_html_head(
            HEAD_PAGES.replace("corpus", "corpus_head"))) \
            .df()[HEAD_COLS].sort_values("doc_id").reset_index(drop=True)

        for label, sv, ov, src_df, src_col in (
                ("links", s, o, pdf, "html"),
                ("urls", s2, o2, updf, "u"),
                ("head", s3, o3, hpdf, "html")):
            if sv.equals(ov):
                continue
            bad += 1
            print(f"seed {seed}: {label} DIVERGENCE "
                  f"(spark {len(sv)} rows, oracle {len(ov)} rows)")
            n = min(len(sv), len(ov))
            for c in sv.columns:
                m = sv[c][:n] != ov[c][:n]
                if m.any():
                    i = m.idxmax()
                    did = sv["doc_id"][i]
                    src = src_df[src_df.doc_id == did][src_col].iloc[0]
                    print(" col", c, "doc", did, repr(src)[:200],
                          "\n  spark", repr(sv[c][i])[:150],
                          "\n  oracle", repr(ov[c][i])[:150])
            break
    print(f"{len(list(seeds))} seeds, {bad} divergent")


if __name__ == "__main__":
    main()
