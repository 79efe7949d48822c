"""Adversarial differential fuzz: exploded vs fused vs salted plans vs
the pure-python oracle, on hostile span corpora (unicode whitespace, CJK
adjacency, combining marks, glyph checkboxes, giant lines, unsorted
offsets, interleaved media).

This harness found three real tri-engine regex divergences (Java regexp
vs RE2/pyarrow vs python re) that rules.jre() and the fused kernel's
non-ASCII python-re fallback now close:
  1. NBSP/CJK inside metadata text (Java ASCII-only \\w/\\s vs python),
  2. U+2028/U+2029 as Java line terminators for '.' (UNIX_LINES),
  3. combining marks counted into Java's (?U)\\w and the \\b it induces.
Seeds are fixed so the corpus is deterministic; each seed exercised a
distinct bug class when it was found.
"""

import math
import random

import pytest

from pdf_extraction_spark import oracle
from pdf_extraction_spark.plans.extraction import assemble
from pdf_extraction_spark.plans.fused import assemble_fused
from pdf_extraction_spark.plans.salted import assemble_salted

NASTY = [
    "", " ", "\t \t", " ​", "þþþ ¨✓þ",
    "I. STRUCTURAL SYSTEMS", "IV. ", "IX.  Doubled  Space", "XVIII. Deep Roman",
    "iv. lowercase roman", "II.NoSpace", "V .Spaced dot",
    "A. Foundations", "Z. z", "B.  ", "a. lower sub",
    "þorn's “smart” – quotes — here",
    "ééé combining marks ë",
    "safety hazard gas fire immediate",
    "Comments: leak observed near the foundation",
    "note: minor crack",
    "Deficient item marked D today",
    "checkbox þ ✓ ¨ D status row",
    "Item | Estimated Cost | Notes",
    "Roof fix | $500 - $700 | flashing",
    "Total | 2,000 dollars | combined",
    "weird | table | row | with | many | cells",
    "$1,234.56 and 99$ and 12 dollars",
    "It is recommended that professionals review this report",
    "Noting limitations in scope of the inspection",
    "This report is prepared for the exclusive use",
    "no issues observed - functional and satisfactory",
    "within normal limits",
    "平仮名 カタカナ 漢字 mixed ascii",
    "emoji 🙂 in line 🚰 plumbing",
    "x" * 5000,
    ("long sentence with repair and replace keywords " * 80).strip(),
    "1234 Main St, Houston, TX 77002",
    "Square footage: 2,450 sqft built in 1978 two stories",
    "price range 150$ to $3,000.50 total",
    "NP", "NI", "D", "I", " P ",
    "GENERAL FINDINGS",
    "Observations",
    "\x00null\x00byte",
    "Report Number:\u00a0RPT-9",
    "Inspection Date:\u2003Saturday, August 16, 2025",
    "Square\u00a0footage: 1,999 sqft",
    "Built in\u00a01985, two\u00a0stories",
    "price 45\u00a0$ and 3\u00a0dollars",
    "IV.\u2028Sep Title",
    "IX.\u2003Em Space Title",
    "12 dollars\n\u6f22\u5b57 interleaved\n99 Oak St, Houston, TX 77002",
    "D\u6f22 adjacency \u6f22D and \u00a1NP!",
    "Report Number: RPT-9",
    "Inspection Date: Saturday, August 16, 2025",
    "Square footage: 1,999 sqft",
    "Built in 1985, two stories",
    "price 45 $ and 3 dollars",
    "IV. Sep Title",
    "12 dollars\n漢字 interleaved\n99 Oak St, Houston, TX 77002",
    "D漢 adjacency 漢D and ¡NP!",
    "trailing spaces    ",
    "    leading spaces",
    "line\nwith\ninternal\nnewlines",
    # RE2's \s excludes \x0b and \x1c-\x1f — ASCII chars python's \s
    # matches, so they dodge the fused kernels' non-ASCII python-re
    # reroute; rules.re2() closes the gap (4th tri-engine divergence,
    # found by the extended random-unicode fuzz campaign)
    "A. \x0b\t\n\r\r\x0b\n\n\x0c\x0b\t\r176585748  Deficient item marked D today",
    "IV. \x0bVertical tab section",
    "A. \x1c\x1d\x1e\x1fseparator heading observed",
]


def gen_docs(n_docs, seed):
    rng = random.Random(seed)
    docs = []
    for d in range(n_docs):
        n = rng.randint(1, 60)
        spans = []
        for i in range(n):
            if rng.random() < 0.12:
                spans.append({"kind": "media", "text": "",
                              "media_ref": f"img_{d}_{i}.png", "offset": i})
            else:
                t = rng.choice(NASTY)
                if rng.random() < 0.3:
                    t = t + " " + rng.choice(NASTY)
                spans.append({"kind": "text", "text": t,
                              "media_ref": "", "offset": i})
        rng.shuffle(spans)  # unsorted input order
        docs.append((f"f{d:04d}", spans))
    return docs



PLANS = {
    "exploded": assemble,
    "fused": assemble_fused,
    "salted": lambda df: assemble_salted(df, chunk_spans=16),
}


@pytest.mark.parametrize("seed", [1, 3, 6])
@pytest.mark.parametrize("plan_name", list(PLANS))
def test_adversarial_corpus_matches_oracle(spark, plan_name, seed):
    docs = gen_docs(40, seed)
    sdf = spark.createDataFrame(
        [(d, [(s["kind"], s["text"], s["media_ref"], s["offset"])
              for s in spans]) for d, spans in docs],
        "doc_id string, spans array<struct<kind string, text string, "
        "media_ref string, offset int>>").repartition(4)
    want = {d: oracle.extract_doc(d, spans) for d, spans in docs}
    got = {r["doc_id"]: r.asDict(recursive=True)
           for r in PLANS[plan_name](sdf).collect()}
    assert set(got) == set(want)
    for doc_id, w in want.items():
        g = got[doc_id]
        gs = [(s["kind"], s["text"], s["media_ref"], s["order"])
              for s in g["spans"]]
        ws = [(s["kind"], s["text"], s["media_ref"], s["order"])
              for s in w["spans"]]
        assert gs == ws, f"{doc_id}: span sequence"
        gi = [(x["id"], x["section"], x["subsection"], x["status"],
               x["priority"], x["title"], x["description"],
               tuple(x["page_numbers"])) for x in g["issues"]]
        wi = [(x["id"], x["section"], x["subsection"], x["status"],
               x["priority"], x["title"], x["description"],
               tuple(x["page_numbers"])) for x in w["issues"]]
        assert gi == wi, f"{doc_id}: issues"
        gt = [(t["page_num"], t["section"], t["table_type"],
               tuple(t["headers"]),
               tuple(tuple(r) for r in t["table_data"]))
              for t in g["tables"]]
        wt = [(t["page_num"], t["section"], t["table_type"],
               tuple(t["headers"]),
               tuple(tuple(r) for r in t["table_data"]))
              for t in w["tables"]]
        assert gt == wt, f"{doc_id}: tables"
        assert (g["raw_sections"] or {}) == w["raw_sections"], \
            f"{doc_id}: raw_sections"
        for k, wv in w["summary"].items():
            assert g["summary"][k] == wv, f"{doc_id}: summary {k}"
        for k, wv in w["metadata"].items():
            gv = g["metadata"][k]
            if isinstance(wv, float) and gv is not None:
                assert math.isclose(gv, wv, abs_tol=1e-9), \
                    f"{doc_id}: metadata {k}"
            else:
                assert gv == wv, f"{doc_id}: metadata {k}: {gv!r} != {wv!r}"
