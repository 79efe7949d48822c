"""Differential fuzz harness (committed so the campaign is
reproducible — usage: python tools/fuzz_enrich.py LO HI): the
rule-table-spliced enrichment campaign from BENCH/BASELINE.md §20 —
descriptions built from the ACTUAL taxonomy/trade/severity/action/
quantity vocab plus unicode pools and measurement soup, run through the
hybrid Catalyst plan (plans/enrichment_hybrid) and compared
field-by-field against the all-python ``enrich_document`` path.
"""

from __future__ import annotations

import math
import random
import sys

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from pdf_extraction_spark import enrich_rules as er  # noqa: E402
from pdf_extraction_spark import rules  # noqa: E402
from pdf_extraction_spark.plans.enrichment_hybrid import (  # noqa: E402
    enrich_extracted_hybrid)
from pdf_extraction_spark.session import get_spark  # noqa: E402

# splice pools drawn from the real rule tables, so the fuzz constantly
# crosses taxonomy exact-hits, fuzzy-tier near-misses, and keyword
# collisions (the 'ac'-in-'cracks' class of quirk)
TAXO_KEYS = sorted(er._TAXONOMY_LOOKUP)[:160]
KEYWORDS = sorted({w for kws in (rules.HIGH_PRIORITY_KEYWORDS,
                                 rules.MEDIUM_PRIORITY_KEYWORDS,
                                 rules.ISSUE_KEYWORDS)
                   for w in kws})
MEASURE = ["12 x 8 feet", "1,250 sq ft", "300 square feet", "5 ft",
           "25%", "2x4 ft", "100 sqft", "3 locations", "10 linear feet"]
UNICODE = ["þorn “smart” – text", "漢字 水 damage", "NBSP here",
           "ümlaut ß", "¡x! ¿y?", "é combining"]
GLUE = ["replace", "repair", "monitor", "evaluate", "recommend",
        "observed", "noted", "requires", "further inspection by",
        "licensed technician", "Comments:", "D", "-", ".", ";"]
SECTIONS = ["I. STRUCTURAL SYSTEMS", "II. ELECTRICAL SYSTEMS",
            "III. HEATING", "IV. PLUMBING", "HEADER"]
STATUSES = ["D", "I", "NI", "NP", None]

BOOLS = ("is_duplicate", "needs_manual_review",
         "requires_specialized_labor", "is_grouped")
STRS = ("id", "section", "status", "priority", "title", "description",
        "standard_category", "standard_subcategory", "standard_severity",
        "standard_action", "cost_strategy", "matched_standard_item")
FLOATS = ("severity_confidence", "action_confidence",
          "category_confidence", "data_quality_score", "urgency_score",
          "complexity_factor", "strategy_confidence")


def rand_desc(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randint(1, 8)):
        r = rng.random()
        if r < 0.35:
            parts.append(rng.choice(TAXO_KEYS))
        elif r < 0.55:
            parts.append(rng.choice(KEYWORDS))
        elif r < 0.7:
            parts.append(rng.choice(MEASURE))
        elif r < 0.8:
            parts.append(rng.choice(UNICODE))
        else:
            parts.append(rng.choice(GLUE))
    return " ".join(parts)


def gen(n_docs: int, seed: int):
    rng = random.Random(seed)
    docs = []
    for d in range(n_docs):
        issues = []
        for i in range(rng.randint(0, 12)):
            sec = rng.choice(SECTIONS)
            issues.append({
                "id": f"{sec}_{i}",
                "section": sec,
                "subsection": rng.choice(["A. Foundations", "",
                                          "B. Roof"]),
                "status": rng.choice(STATUSES),
                "priority": rng.choice(["high", "medium", "low",
                                        "info"]),
                "title": rng.choice(["", "Comments:", rand_desc(rng)[:60],
                                     "LOUD", "a" * 150]),
                "description": rand_desc(rng),
                "page_numbers": [rng.randint(1, 40)],
                "estimated_cost": (
                    {"min": 100.0, "max": 900.0, "average": 500.0}
                    if rng.random() < 0.3 else None),
            })
        docs.append((f"z{seed}_{d:03d}", issues))
    return docs


def main() -> None:
    lo, hi = int(sys.argv[1]), int(sys.argv[2])
    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    schema = (
        "doc_id string, issues array<struct<id string, section string, "
        "subsection string, status string, priority string, "
        "title string, description string, page_numbers array<int>, "
        "estimated_cost struct<min double, max double, average double>>>")
    bad = 0
    # ONE DataFrame/plan over every seed's corpus: instantiating the
    # hybrid cascade costs minutes of Catalyst planning per plan, so a
    # per-seed plan would make the campaign planning-bound (measured:
    # 20 plans > 30 min; one plan over 20x the docs ~ 2 min)
    docs = [doc for seed in range(lo, hi) for doc in gen(40, seed)]
    rows = [(d, [(i["id"], i["section"], i["subsection"],
                  i["status"], i["priority"], i["title"],
                  i["description"], i["page_numbers"],
                  (i["estimated_cost"]["min"],
                   i["estimated_cost"]["max"],
                   i["estimated_cost"]["average"])
                  if i["estimated_cost"] else None)
                 for i in issues]) for d, issues in docs]
    sdf = spark.createDataFrame(rows, schema).repartition(16)
    want = {d: er.enrich_document([dict(i) for i in issues])
            for d, issues in docs}
    print(f"{len(docs)} docs, {sum(len(i) for _, i in docs)} issues",
          flush=True)
    got: dict[str, dict[int, dict]] = {}
    for r in enrich_extracted_hybrid(sdf).collect():
        got.setdefault(r["doc_id"], {})[r["issue_order"]] = \
            r.asDict(recursive=True)
    if True:
        for doc_id, res in want.items():
            g = got.get(doc_id, {})
            if len(g) != len(res["issues"]):
                bad += 1
                print(f"{doc_id}: row count "
                      f"{len(g)} != {len(res['issues'])}", flush=True)
                continue
            for order, issue in enumerate(res["issues"]):
                row = g[order]
                cls = issue.get("classification", {})
                diffs = (
                    [k for k in BOOLS
                     if row[k] != bool(issue.get(k, False))]
                    + [k for k in STRS if row[k] != issue.get(k)]
                    + [k for k in FLOATS
                       if not math.isclose(row[k], issue.get(k),
                                           abs_tol=1e-9)]
                    + [k for k in ("trade", "work_type", "complexity")
                       if row[k] != cls.get(k)])
                if diffs:
                    bad += 1
                    print(f"{doc_id}#{order}: DIVERGENCE {diffs}",
                          flush=True)
                    for k in diffs[:4]:
                        print("  ", k, "spark",
                              repr(row.get(k))[:120], "python",
                              repr(issue.get(k,
                                   cls.get(k)))[:120], flush=True)
    print("DONE divergences:", bad, flush=True)


if __name__ == "__main__":
    main()
