"""Gate queries for the enrichment operators that were golden-only in
round 1: C9/T8 attributes, C11-C13 metadata enrichment, C15/C16
classification, T2-T4 cleaning, T5 per-doc dedup, F2-F9 quality routing,
C17/J5 strategy, J1 table-issue link, J2/J3 taxonomy, C19-C21 phase-2
estimation, A2/A3/A5 summaries, S8 checkpoint cache, J8 calibration.

Same contract as queries_enrich.py: inputs derived deterministically from
``orders`` on both sides; Spark runs the REAL implementations
(enrich_rules / estimation_rules / operators), DuckDB runs an independent
ANSI-SQL transcription of the reference semantics.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import enrich_rules as er
from . import rules
from .queries import _pick, _sql_list
from .queries_enrich import ITEMS, PHRASES

# ---------------------------------------------------------------------------
# Derived rich-text issues (attribute/classification inputs)
# ---------------------------------------------------------------------------

N_DOCS = 50

LOC_SFX = ["", " in the kitchen area", " at the master bedroom",
           " near the attic entry", " on the second floor front exterior"]
MEAS_SFX = ["", " damaged area measures 10 x 12 feet",
            " along 15 feet of pipe run",
            " covering 1,200 sq ft of surface",
            " moisture at 60 percent level"]
MAT_SFX = ["", " on the wood framing members",
           " behind drywall sheetrock panels",
           " at the copper supply line", " under asphalt shingles layer"]
ACC_SFX = ["", " difficult to access", " requires ladder staging",
           " found in the crawlspace area", " easily accessible from below"]
SAFE_SFX = ["", " posing a fire hazard risk"]


def derived_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")

    def p(arr: list[str], div: int, mod: int) -> Column:
        return _pick(arr, F.pmod(F.floor(k / div), F.lit(mod)))

    item = p(ITEMS, 7, 5)
    phrase = p(PHRASES, 5, 5)
    desc = F.concat(item, F.lit(" "), phrase, p(LOC_SFX, 3, 5),
                    p(MEAS_SFX, 11, 5), p(MAT_SFX, 13, 5),
                    p(ACC_SFX, 17, 5), _pick(SAFE_SFX, F.pmod(k, F.lit(2))),
                    F.lit("."))
    return o.select(
        F.pmod(k, F.lit(N_DOCS)).alias("doc_id"), k.alias("k"),
        desc.alias("description"),
        F.concat(item, F.lit(" condition")).alias("title"))


def _pick_sql(arr: list[str], div: int, mod: int) -> str:
    return f"{_sql_list(arr)}[CAST(1 + (o_orderkey // {div}) % {mod} AS INT)]"


SQL_RICH_CTE = f"""
rich AS (
  SELECT o_orderkey % {N_DOCS} AS doc_id, o_orderkey AS k,
    {_pick_sql(ITEMS, 7, 5)} || ' ' || {_pick_sql(PHRASES, 5, 5)}
      || {_pick_sql(LOC_SFX, 3, 5)} || {_pick_sql(MEAS_SFX, 11, 5)}
      || {_pick_sql(MAT_SFX, 13, 5)} || {_pick_sql(ACC_SFX, 17, 5)}
      || {_sql_list(SAFE_SFX)}[CAST(1 + o_orderkey % 2 AS INT)]
      || '.' AS description,
    {_pick_sql(ITEMS, 7, 5)} || ' condition' AS title
  FROM orders)
"""


def _like_any(expr: str, words: list[str]) -> str:
    return "(" + " OR ".join(
        f"{expr} LIKE '%" + w.replace("'", "''") + "%'" for w in words) + ")"


# ---------------------------------------------------------------------------
# C9 + T8 — attribute extraction (attribute_extractor.py:81-213)
# ---------------------------------------------------------------------------

def q_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9/T8 via the real er.extract_attributes; list outputs joined with
    '|' so the gate compare stays hashable."""
    df = derived_rich(spark, sf_dir)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, k, d, t in zip(pdf["doc_id"], pdf["k"],
                                       pdf["description"], pdf["title"]):
                a = er.extract_attributes(d, t)
                meas = a.get("measurements", {})
                rows.append({
                    "doc_id": doc_id, "line_key": k,
                    "locations": "|".join(a.get("locations", [])),
                    "dimensions": "|".join(meas.get("dimensions", [])),
                    "lengths": "|".join(meas.get("lengths", [])),
                    "areas": "|".join(meas.get("areas", [])),
                    "materials": "|".join(a.get("materials", [])),
                    "damage_types": "|".join(a.get("damage_types", [])),
                    "safety_related": bool(a.get("safety_related", False)),
                    "accessibility": a.get("accessibility"),
                })
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        run, "doc_id bigint, line_key bigint, locations string, "
             "dimensions string, lengths string, areas string, "
             "materials string, damage_types string, "
             "safety_related boolean, accessibility string")


def _sql_attributes() -> str:
    loc_all = [p for pats in rules.LOCATION_TERMS.values() for p in pats]
    loc_cases = ", ".join(
        f"CASE WHEN t LIKE '%{p}%' THEN '{p}' END" for p in loc_all)
    mat_cases = ", ".join(
        f"CASE WHEN {_like_any('t', kws)} THEN '{m}' END"
        for m, kws in rules.MATERIALS.items())
    dmg_cases = ", ".join(
        f"CASE WHEN {_like_any('t', kws)} THEN '{d}' END"
        for d, kws in rules.DAMAGE_TYPES.items())
    safety = _like_any("t", rules.SAFETY_KEYWORDS)
    acc_case = " ".join(
        f"WHEN {_like_any('t', pats)} THEN '{a}'"
        for a, pats in rules.ACCESSIBILITY_PATTERNS.items())
    # RE2-safe rewrites of ATTR_MEASUREMENT_PATTERNS (\' -> ', \" -> ")
    p_dim = (r"(\d+(?:\.\d+)?)\s*[xX×]\s*(\d+(?:\.\d+)?)"
             r"\s*(?:feet|foot|ft|''|inches|inch|in|\x22)?")
    p_len = r"(\d+(?:\.\d+)?)\s*(?:feet|foot|ft|''|inches|inch|in|\x22)"
    p_sq1 = r"(\d+(?:,\d{3})*(?:\.\d+)?)\s*(?:sq\.?\s*ft|square\s+feet|square\s+foot)"
    p_pct = r"(\d+(?:\.\d+)?)\s*(?:%|percent)"
    p_area = r"(\d+(?:,\d{3})*(?:\.\d+)?)\s*(?:sq\.?\s*ft|square\s+feet)"
    return f"""
WITH {SQL_RICH_CTE},
txt AS (
  SELECT doc_id, k,
    lower(title || ' ' || description) AS t
  FROM rich),
meas AS (
  SELECT *,
    regexp_extract_all(t, '{p_dim}', 1) AS d1,
    regexp_extract_all(t, '{p_dim}', 2) AS d2,
    regexp_extract_all(t, '{p_len}', 1) AS l2,
    regexp_extract_all(t, '{p_sq1}', 1) AS l3,
    regexp_extract_all(t, '{p_pct}', 1) AS l4,
    regexp_extract_all(t, '{p_area}', 1) AS ar
  FROM txt)
SELECT doc_id, k AS line_key,
  concat_ws('|', {loc_cases}) AS locations,
  coalesce(array_to_string(
      [d1[i] || 'x' || d2[i] for i in range(1, len(d1) + 1)], '|'), '')
    AS dimensions,
  coalesce(array_to_string(list_concat(list_concat(l2, l3), l4), '|'), '')
    AS lengths,
  coalesce(array_to_string(list_transform(ar, x -> x || ' sq ft'), '|'), '')
    AS areas,
  concat_ws('|', {mat_cases}) AS materials,
  concat_ws('|', {dmg_cases}) AS damage_types,
  {safety} AS safety_related,
  CASE {acc_case} END AS accessibility
FROM meas
"""


# ---------------------------------------------------------------------------
# C11 + C12 + C13 — metadata enrichment (metadata_enricher.py:119-266)
# ---------------------------------------------------------------------------

META_CATS = ["Structural", "HVAC", "Electrical", "Plumbing", "Roofing",
             "Interior", "Unknown"]
META_ACCS = ["", "difficult", "requires_equipment", "confined_space", "easy"]
SPEC_SFX = ["", " contact a licensed electrician",
            " hire a professional contractor",
            " requires certified specialist review", " general note only"]
META_ACTIONS = ["immediate_repair", "replacement", "further_inspection",
                "monitoring", "maintenance"]
N_LOC_PICKS = [0, 1, 2, 3, 4]
N_DMG_PICKS = [0, 1, 3, 4, 2]
MEAS_PICKS = ["none", "area_mid", "dims", "area_small", "area_comma"]
_MEAS_VALUES = {
    "none": {},
    "area_mid": {"areas": ["120.5 sq ft"]},
    "dims": {"dimensions": ["10x12"]},
    "area_small": {"areas": ["8 sq ft"]},
    "area_comma": {"areas": ["1,250 sq ft"]},
}


def q_metadata_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11 complexity_factor, C12 requires_specialized_labor, C13
    estimate_affected_area via the real enrich_rules code."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    df = o.select(
        F.pmod(k, F.lit(N_DOCS)).alias("doc_id"), k.alias("k"),
        _pick(META_CATS, F.pmod(F.floor(k / 7), F.lit(7))).alias("cat"),
        _pick(META_ACCS, F.pmod(F.floor(k / 5), F.lit(5))).alias("acc"),
        F.concat(_pick(PHRASES, F.pmod(k, F.lit(5))),
                 _pick(SPEC_SFX, F.pmod(F.floor(k / 11), F.lit(5))))
        .alias("description"),
        _pick(META_ACTIONS, F.pmod(F.floor(k / 13), F.lit(5))).alias("act"),
        F.pmod(F.floor(k / 3), F.lit(5)).cast("int").alias("nloc_i"),
        F.pmod(F.floor(k / 17), F.lit(5)).cast("int").alias("ndmg_i"),
        F.pmod(F.floor(k / 19), F.lit(5)).cast("int").alias("meas_i"),
        (F.pmod(k, F.lit(2)) == 0).alias("spec_flag"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                issue = {
                    "standard_category": r.cat,
                    "accessibility_complexity": r.acc,
                    "description": r.description,
                    "standard_action": r.act,
                    "requires_specialized_labor": bool(r.spec_flag),
                    "extracted_attributes": {
                        "locations": [f"loc{i}"
                                      for i in range(N_LOC_PICKS[r.nloc_i])],
                        "damage_types": [f"d{i}"
                                         for i in range(N_DMG_PICKS[r.ndmg_i])],
                        "measurements": dict(
                            _MEAS_VALUES[MEAS_PICKS[r.meas_i]]),
                    },
                }
                cx = er.complexity_factor(issue)
                spec = er.requires_specialized_labor(issue)
                area = er.estimate_affected_area(issue)
                rows.append({
                    "doc_id": r.doc_id, "line_key": r.k,
                    "complexity": cx, "specialized": spec,
                    "square_feet": (area or {}).get("square_feet"),
                    "dimensions": (area or {}).get("dimensions"),
                    "size_category": (area or {}).get("size_category"),
                })
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        run, "doc_id bigint, line_key bigint, complexity double, "
             "specialized boolean, square_feet double, dimensions string, "
             "size_category string")


def _sql_metadata_enrich() -> str:
    cat_pts = " ".join(f"WHEN '{c}' THEN {v!r}"
                       for c, v in rules.CATEGORY_COMPLEXITY.items())
    acc_pts = " ".join(f"WHEN '{a}' THEN {v!r}"
                       for a, v in rules.ACCESSIBILITY_COMPLEXITY.items())
    spec_kw = _like_any("lower(description)", rules.SPECIALIZED_KEYWORDS)
    spec_cats = ", ".join(f"'{c}'" for c in sorted(rules.SPECIALIZED_CATEGORIES))
    sqft_case = (
        "CASE meas WHEN 'area_mid' THEN 120.5 WHEN 'area_small' THEN 8.0 "
        "WHEN 'area_comma' THEN 1250.0 WHEN 'dims' THEN 120.0 END")
    size_case = (
        "CASE WHEN sqft IS NULL THEN NULL WHEN sqft < 10 THEN 'small' "
        "WHEN sqft < 50 THEN 'medium' WHEN sqft < 200 THEN 'large' "
        "ELSE 'very_large' END")
    return f"""
WITH inputs AS (
  SELECT o_orderkey % {N_DOCS} AS doc_id, o_orderkey AS k,
    {_pick_sql(META_CATS, 7, 7)} AS cat,
    {_pick_sql(META_ACCS, 5, 5)} AS acc,
    {_sql_list(PHRASES)}[CAST(1 + o_orderkey % 5 AS INT)]
      || {_pick_sql(SPEC_SFX, 11, 5)} AS description,
    {_pick_sql(META_ACTIONS, 13, 5)} AS act,
    {_sql_list([str(n) for n in N_LOC_PICKS])}[CAST(1 + (o_orderkey // 3) % 5 AS INT)]::INT AS nloc,
    {_sql_list([str(n) for n in N_DMG_PICKS])}[CAST(1 + (o_orderkey // 17) % 5 AS INT)]::INT AS ndmg,
    {_sql_list(MEAS_PICKS)}[CAST(1 + (o_orderkey // 19) % 5 AS INT)] AS meas,
    o_orderkey % 2 = 0 AS spec_flag
  FROM orders),
calc AS (
  SELECT *,
    cat IN ({spec_cats}) OR {spec_kw} OR act = 'further_inspection' AS specialized,
    {sqft_case} AS sqft
  FROM inputs)
SELECT doc_id, k AS line_key,
  round(least(10.0,
    5.0 + CASE cat {cat_pts} ELSE 0.0 END
        + CASE acc {acc_pts} ELSE 0.0 END
        + CASE WHEN spec_flag THEN 1.5 ELSE 0.0 END
        + CASE WHEN nloc > 2 THEN 1.0 ELSE 0.0 END
        + CASE WHEN ndmg > 2 THEN 1.0 ELSE 0.0 END), 2) AS complexity,
  specialized,
  sqft AS square_feet,
  CASE WHEN meas = 'dims' THEN '10x12' END AS dimensions,
  {size_case} AS size_category
FROM calc
"""


# ---------------------------------------------------------------------------
# C15 + C16 — work-type and complexity classification
# (issue_classifier.py:140-221)
# ---------------------------------------------------------------------------

CLS_ACTIONS = ["immediate_repair", "replacement", "further_inspection",
               "monitoring", "maintenance", "no_action", "unknown", ""]
WT_SFX = ["", " fix and patch the seal", " remove and replace the unit",
          " evaluate with a specialist", " clean and service regularly",
          " observe and track the trend"]
CX_FACTORS = ["3.0", "5.0", "7.5", "4.0", "9.0"]
CX_SFX = ["", " minor quick fix involved", " standard typical work",
          " major extensive structural scope",
          " minor issue but major extensive work"]


def q_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C15 classify_work_type + C16 classify_complexity via the real
    enrich_rules code."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    df = o.select(
        F.pmod(k, F.lit(N_DOCS)).alias("doc_id"), k.alias("k"),
        _pick(CLS_ACTIONS, F.pmod(k, F.lit(8))).alias("act"),
        F.concat(_pick(PHRASES, F.pmod(F.floor(k / 5), F.lit(5))),
                 _pick(WT_SFX, F.pmod(F.floor(k / 7), F.lit(6))),
                 _pick(CX_SFX, F.pmod(F.floor(k / 11), F.lit(5))))
        .alias("description"),
        _pick(CX_FACTORS, F.pmod(F.floor(k / 13), F.lit(5)))
        .cast("double").alias("factor"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                issue = {"standard_action": r.act,
                         "description": r.description,
                         "complexity_factor": float(r.factor)}
                wt, wt_conf = er.classify_work_type(issue)
                cx, cx_conf = er.classify_complexity(issue)
                rows.append({"doc_id": r.doc_id, "line_key": r.k,
                             "work_type": wt, "wt_conf": wt_conf,
                             "complexity": cx, "cx_conf": cx_conf})
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        run, "doc_id bigint, line_key bigint, work_type string, "
             "wt_conf double, complexity string, cx_conf double")


def _sql_classification() -> str:
    a2w = " ".join(f"WHEN '{a}' THEN '{w}'"
                   for a, w in rules.ACTION_TO_WORK_TYPE.items())
    works = list(rules.WORK_TYPE_KEYWORDS)
    score_cols = ", ".join(
        "(" + " + ".join(
            f"CASE WHEN c LIKE '%{kw}%' THEN 1 ELSE 0 END"
            for kw in kws) + f") AS s_{w}"
        for w, kws in rules.WORK_TYPE_KEYWORDS.items())
    best = "greatest(" + ", ".join(f"s_{w}" for w in works) + ")"
    best_case = " ".join(
        f"WHEN s_{w} = wb AND s_{w} > 0 THEN '{w}'" for w in works)
    # C16: base tier from factor, then the simple/moderate/complex
    # indicator passes run in dict order, each mutating (tier, conf)
    tiers = list(rules.COMPLEXITY_INDICATORS)
    tier_hits = ", ".join(
        f"{_like_any('d', kws)} AS hit_{t}"
        for t, kws in rules.COMPLEXITY_INDICATORS.items())
    steps = ""
    prev = "0"
    for i, t in enumerate(tiers):
        steps += f""",
cx{i + 1} AS (
  SELECT *,
    CASE WHEN hit_{t} AND cx{i} = '{t}' THEN cx{i}
         WHEN hit_{t} AND cf{i} < 0.8 THEN '{t}'
         ELSE cx{i} END AS cx{i + 1},
    CASE WHEN hit_{t} AND cx{i} = '{t}'
         THEN least(0.95::DOUBLE, cf{i} + 0.1::DOUBLE)
         WHEN hit_{t} AND cf{i} < 0.8 THEN 0.8::DOUBLE
         ELSE cf{i} END AS cf{i + 1}
  FROM cx{i})"""
        prev = str(i + 1)
    return f"""
WITH inputs AS (
  SELECT o_orderkey % {N_DOCS} AS doc_id, o_orderkey AS k,
    {_sql_list(CLS_ACTIONS)}[CAST(1 + o_orderkey % 8 AS INT)] AS act,
    {_pick_sql(PHRASES, 5, 5)} || {_pick_sql(WT_SFX, 7, 6)}
      || {_pick_sql(CX_SFX, 11, 5)} AS description,
    CAST({_pick_sql(CX_FACTORS, 13, 5)} AS DOUBLE) AS factor
  FROM orders),
txt AS (
  SELECT *, lower(act || ' ' || lower(description)) AS c,
         lower(description) AS d
  FROM inputs),
scored AS (SELECT *, {score_cols} FROM txt),
wt AS (
  SELECT *, {best} AS wb FROM scored),
cx0 AS (
  SELECT *,
    CASE WHEN factor >= 7 THEN 'complex' WHEN factor >= 4 THEN 'moderate'
         ELSE 'simple' END AS cx0,
    CASE WHEN factor >= 7 THEN 0.8::DOUBLE WHEN factor >= 4
         THEN 0.75::DOUBLE ELSE 0.7::DOUBLE END AS cf0,
    {tier_hits}
  FROM wt){steps}
SELECT doc_id, k AS line_key,
  CASE WHEN act IN ({', '.join("'" + a + "'" for a in rules.ACTION_TO_WORK_TYPE)})
       THEN CASE act {a2w} END
       WHEN wb = 0 THEN 'repair'
       ELSE CASE {best_case} END END AS work_type,
  CASE WHEN act IN ({', '.join("'" + a + "'" for a in rules.ACTION_TO_WORK_TYPE)})
       THEN 0.9::DOUBLE
       WHEN wb = 0 THEN 0.5::DOUBLE
       ELSE least(0.85::DOUBLE, 0.6::DOUBLE + wb / 5.0::DOUBLE)
       END AS wt_conf,
  cx{prev} AS complexity, cf{prev} AS cx_conf
FROM cx{prev}
"""


QUERIES_ENRICH2: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "attributes": q_attributes,
    "metadata_enrich": q_metadata_enrich,
    "classification": q_classification,
}

ORACLES_ENRICH2: dict[str, str] = {
    "attributes": _sql_attributes(),
    "metadata_enrich": _sql_metadata_enrich(),
    "classification": _sql_classification(),
}
