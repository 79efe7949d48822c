"""Gate queries for the phase-2 estimation layer: C19 strategy selector,
C21 Houston market adjustments, C20 multi-dimensional confidence scorer
(src/estimation/cost_strategy_selector.py, houston_cost_multipliers.py,
confidence_scorer.py). Spark runs the real estimation_rules code; DuckDB
runs an independent SQL transcription generated from the same rule
tables."""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import estimation_rules as est
from .queries import _pick, _sql_list
from .queries_enrich2 import N_DOCS, _like_any, _pick_sql

# ---------------------------------------------------------------------------
# C19 — phase-2 strategy selector
# ---------------------------------------------------------------------------

P2_DESCS = [
    "replace the gfci outlet in hall",
    "gfci outlet damaged at exterior",
    "foundation settling with pier movement",
    "painting needed across 200 sq ft of wall",
    "routine service visit to maintain the unit",
    "condition unclear in the area",
    "possible leak may need review",
    "fence repair along 30 linear feet section",
]
P2_CATS = ["", "electrical", "mold_remediation"]
P2_SEVS = ["low", "medium", "critical", "high"]


def q_phase2_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C19 select_strategy_phase2 via the real estimation_rules code."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    df = o.select(
        F.pmod(k, F.lit(N_DOCS)).alias("doc_id"), k.alias("k"),
        _pick(P2_DESCS, F.pmod(k, F.lit(8))).alias("description"),
        _pick(P2_CATS, F.pmod(F.floor(k / 7), F.lit(3))).alias("category"),
        _pick(P2_SEVS, F.pmod(F.floor(k / 11), F.lit(4))).alias("severity"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                sel = est.select_strategy_phase2(
                    {"title": "", "description": r.description,
                     "category": r.category, "severity": r.severity})
                ce = sel.get("cost_estimate") or {}
                total = (ce.get("cost") or {}).get("total") or {}
                rows.append({
                    "doc_id": r.doc_id, "line_key": r.k,
                    "strategy": sel["strategy"],
                    "confidence": sel["confidence"],
                    "source": ce.get("source"),
                    "total_min": float(total["min"])
                    if "min" in total else None,
                    "total_max": float(total["max"])
                    if "max" in total else None,
                })
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        run, "doc_id bigint, line_key bigint, strategy string, "
             "confidence double, source string, total_min double, "
             "total_max double")


def _sql_phase2_select() -> str:
    lookup_arms = []
    for name, cd in est.SIMPLE_REPAIRS.items():
        lo = cd["labor"][0] + cd["materials"][0] + cd["permits"]
        hi = cd["labor"][1] + cd["materials"][1] + cd["permits"]
        lookup_arms.append(
            f"WHEN text LIKE '%{name}%' THEN "
            f"struct_pack(lo := {lo}::DOUBLE, hi := {hi}::DOUBLE)")
    complex_ind = _like_any("text", est.COMPLEX_INDICATORS)
    complex_kw = _like_any("text", est.COMPLEX_KEYWORDS)
    complex_cat = "(" + " OR ".join(
        f"category LIKE '%{c}%'" for c in est.COMPLEX_CATEGORIES) + ")"
    simple_kw = _like_any("text", est.SIMPLE_KEYWORDS)
    uncertain = _like_any("text", est.UNCERTAINTY_PHRASES)
    hybrid_ind = _like_any("text", est.HYBRID_INDICATORS)
    # formula tier: per category, totals from the (sqft | linear) measures
    formula_arms = []
    for cat, fm in est.FORMULA_CATEGORIES.items():
        nm = cat.replace("_", " ")
        if "labor_per_sqft" in fm:
            l_lo, l_hi = fm["labor_per_sqft"]
            m_lo, m_hi = fm["material_per_sqft"]
            var, guard = "sqft", "sqft IS NOT NULL"
        else:
            l_lo, l_hi = fm["labor_per_linear_ft"]
            m_lo, m_hi = fm["material_per_linear_ft"]
            var, guard = "lf", "sqft IS NULL AND lf IS NOT NULL"
        mc, pm = fm["min_charge"], fm["permits"]
        tot_min = (f"round_even(greatest({var} * {l_lo}::DOUBLE "
                   f"+ {var} * {m_lo}::DOUBLE, {mc}::DOUBLE), 2) "
                   f"+ {pm}")
        raw_max = f"({var} * {l_hi}::DOUBLE + {var} * {m_hi}::DOUBLE)"
        tot_max = (f"round_even(CASE WHEN {raw_max} < greatest({var} * "
                   f"{l_lo}::DOUBLE + {var} * {m_lo}::DOUBLE, "
                   f"{mc}::DOUBLE) THEN greatest({var} * {l_lo}::DOUBLE "
                   f"+ {var} * {m_lo}::DOUBLE, {mc}::DOUBLE) * 1.5 "
                   f"ELSE {raw_max} END, 2) + {pm}")
        formula_arms.append(
            f"WHEN text LIKE '%{nm}%' AND {guard} THEN "
            f"struct_pack(lo := {tot_min}, hi := {tot_max})")
    return f"""
WITH inputs AS (
  SELECT o_orderkey % {N_DOCS} AS doc_id, o_orderkey AS k,
    {_sql_list(P2_DESCS)}[CAST(1 + o_orderkey % 8 AS INT)] AS description,
    {_pick_sql(P2_CATS, 7, 3)} AS category,
    {_pick_sql(P2_SEVS, 11, 4)} AS severity
  FROM orders),
txt AS (
  SELECT *, ' ' || lower(description) AS text,
    CAST(nullif(regexp_extract(lower(description),
      '(\\d+)\\s*(?:square\\s*feet|sq\\.?\\s*ft\\.?|sf)', 1), '')
      AS DOUBLE) AS sqft,
    CAST(nullif(regexp_extract(lower(description),
      '(\\d+)\\s*(?:linear\\s*feet|lf|feet|ft)', 1), '') AS DOUBLE) AS lf
  FROM inputs),
tiers AS (
  SELECT *,
    CASE WHEN NOT {complex_ind}
         THEN CASE {' '.join(lookup_arms)} END END AS lk,
    ({complex_kw} OR {complex_cat}
     OR (severity IN ('critical', 'high') AND NOT {simple_kw})
     OR {uncertain}) AS is_complex,
    CASE {' '.join(formula_arms)} END AS fm,
    (NOT {simple_kw} AND NOT {complex_kw} AND {hybrid_ind}) AS is_hybrid
  FROM txt)
SELECT doc_id, k AS line_key,
  CASE WHEN lk IS NOT NULL THEN 'lookup_table'
       WHEN is_complex THEN 'llm_reasoning'
       WHEN fm IS NOT NULL THEN 'formula_based'
       WHEN is_hybrid THEN 'hybrid'
       ELSE 'llm_reasoning' END AS strategy,
  CASE WHEN lk IS NOT NULL THEN 0.95::DOUBLE
       WHEN is_complex THEN 0.7::DOUBLE
       WHEN fm IS NOT NULL THEN 0.85::DOUBLE
       WHEN is_hybrid THEN 0.75::DOUBLE
       ELSE 0.6::DOUBLE END AS confidence,
  CASE WHEN lk IS NOT NULL THEN 'lookup_table'
       WHEN NOT is_complex AND fm IS NOT NULL THEN 'formula' END AS source,
  CASE WHEN lk IS NOT NULL THEN lk.lo
       WHEN NOT is_complex AND fm IS NOT NULL THEN fm.lo END AS total_min,
  CASE WHEN lk IS NOT NULL THEN lk.hi
       WHEN NOT is_complex AND fm IS NOT NULL THEN fm.hi END AS total_max
FROM tiers
"""


# ---------------------------------------------------------------------------
# C21 — Houston market adjustments
# ---------------------------------------------------------------------------

H_DESCS = ["furnace heating concern at the closet",
           "pipe leak at the water line below",
           "roof shingle wear noted at ridge",
           "foundation pier slab movement observed",
           "replace filter for the unit minor"]
H_CATS = ["", "hvac", "roofing", "foundation", "exterior"]


def q_phase2_houston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C21 houston_adjust via the real estimation_rules code; base costs
    derived as exact integers so every round_even() is boundary-free."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    b = (1 + F.pmod(F.floor(k / 20), F.lit(50))).cast("double")
    df = o.select(
        F.pmod(k, F.lit(N_DOCS)).alias("doc_id"), k.alias("k"),
        (100 * b).alias("labor_min"), (200 * b).alias("labor_max"),
        (40 * b).alias("mat_min"), (80 * b).alias("mat_max"),
        (F.pmod(F.floor(k / 3), F.lit(2)) * 50).cast("double")
        .alias("permit_base"),
        _pick(H_DESCS, F.pmod(k, F.lit(5))).alias("description"),
        _pick(H_CATS, F.pmod(F.floor(k / 7), F.lit(5))).alias("category"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                base = {"cost": {
                    "labor": {"min": r.labor_min, "max": r.labor_max},
                    "materials": {"min": r.mat_min, "max": r.mat_max},
                    "permits": {"min": r.permit_base, "max": r.permit_base},
                }}
                adj = est.houston_adjust(
                    base, {"title": "", "description": r.description,
                           "category": r.category})
                c = adj["cost"]
                rows.append({
                    "doc_id": r.doc_id, "line_key": r.k,
                    "trade": adj["trade"],
                    "permit_type": adj["permit_type"],
                    "climate": float(adj["climate_adjustment"]),
                    "labor_min": c["labor"]["min"],
                    "labor_max": c["labor"]["max"],
                    "mat_min": c["materials"]["min"],
                    "mat_max": c["materials"]["max"],
                    "permit_min": float(c["permits"]["min"]),
                    "permit_max": float(c["permits"]["max"]),
                    "total_min": c["total"]["min"],
                    "total_max": c["total"]["max"],
                })
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        run, "doc_id bigint, line_key bigint, trade string, "
             "permit_type string, climate double, labor_min double, "
             "labor_max double, mat_min double, mat_max double, "
             "permit_min double, permit_max double, total_min double, "
             "total_max double")


def _houston_sql_parts() -> dict[str, str]:
    """Shared SQL fragments transcribing houston_adjust (C21) over
    columns named text / cat / m0 (m0 = materials max after the trade
    multiplier). Used by the phase2_houston and hybrid_routing oracles."""
    trade_case = " ".join(
        "WHEN " + " OR ".join(
            f"text LIKE '%{w}%' OR cat LIKE '%{w}%'" for w in kws)
        + f" THEN '{t}'"
        for t, kws in est.TRADE_KEYWORDS.items())
    no_permit = _like_any("text", est.NO_PERMIT_PHRASES)
    permit_case = " ".join(
        f"WHEN {_like_any('text', kws)} AND NOT {no_permit} "
        f"THEN '{p}'"
        for p, kws in est.PERMIT_KEYWORDS.items())
    lm_case = " ".join(
        f"WHEN '{t}' THEN {m}::DOUBLE"
        for t, m in est.LABOR_MULTIPLIERS.items() if t != "default")
    mm_case = " ".join(
        f"WHEN '{t}' THEN {m}::DOUBLE"
        for t, m in est.MATERIAL_MULTIPLIERS.items() if t != "default")
    pc_min = " ".join(f"WHEN '{p}' THEN {c['min']}::DOUBLE"
                      for p, c in est.PERMIT_COSTS.items())
    pc_max = " ".join(f"WHEN '{p}' THEN {c['max']}::DOUBLE"
                      for p, c in est.PERMIT_COSTS.items())
    # climate: factor adders apply to the already-adjusted mat_max; flat
    # amounts accumulate, iterating the table in order
    clim_factor_steps = []
    clim_flat_terms = []
    for cat, adj in est.CLIMATE_ADJUSTMENTS.items():
        hit = f"(text LIKE '%{cat}%' OR cat LIKE '%{cat}%')"
        for key in ("drainage_factor", "hurricane_rating",
                    "efficiency_premium"):
            if key in adj:
                clim_factor_steps.append((hit, adj[key]))
        flat = sum(adj.get(x, 0) for x in ("soil_testing",
                                           "humidity_control",
                                           "ventilation"))
        if flat:
            clim_flat_terms.append(
                f"CASE WHEN {hit} THEN {flat}::DOUBLE ELSE 0.0::DOUBLE END")
    mm_steps = ""
    prev = "m0"
    for hit, f_ in clim_factor_steps:
        mm_steps += (f" + CASE WHEN {hit} THEN round_even({prev} * "
                     f"({f_}::DOUBLE - 1), 2) ELSE 0.0::DOUBLE END")
        # reference adds round_even(current_max * (f-1)) where current_max
        # includes prior climate additions in table order
        prev = f"({prev} + CASE WHEN {hit} THEN round_even({prev} * " \
               f"({f_}::DOUBLE - 1), 2) ELSE 0.0::DOUBLE END)"
    climate_flat = (" + ".join(clim_flat_terms)
                    if clim_flat_terms else "0.0::DOUBLE")
    return {"trade_case": trade_case, "permit_case": permit_case,
            "lm_case": lm_case, "mm_case": mm_case,
            "pc_min": pc_min, "pc_max": pc_max,
            "mm_steps": mm_steps, "climate_flat": climate_flat}


def _sql_phase2_houston() -> str:
    p = _houston_sql_parts()
    trade_case, permit_case = p["trade_case"], p["permit_case"]
    lm_case, mm_case = p["lm_case"], p["mm_case"]
    pc_min, pc_max = p["pc_min"], p["pc_max"]
    mm_steps, climate_flat = p["mm_steps"], p["climate_flat"]
    return f"""
WITH inputs AS (
  SELECT o_orderkey % {N_DOCS} AS doc_id, o_orderkey AS k,
    CAST(1 + (o_orderkey // 20) % 50 AS DOUBLE) AS b,
    CAST(((o_orderkey // 3) % 2) * 50 AS DOUBLE) AS permit_base,
    {_sql_list(H_DESCS)}[CAST(1 + o_orderkey % 5 AS INT)] AS description,
    {_pick_sql(H_CATS, 7, 5)} AS cat
  FROM orders),
txt AS (
  SELECT *, ' ' || lower(description) AS text FROM inputs),
traded AS (
  SELECT *,
    CASE {trade_case} ELSE 'general' END AS trade,
    CASE {permit_case} ELSE 'none' END AS permit_type
  FROM txt),
mult AS (
  SELECT *,
    CASE trade {lm_case} ELSE 1.10::DOUBLE END AS lm,
    CASE trade {mm_case} ELSE 1.00::DOUBLE END AS mm
  FROM traded),
adjusted AS (
  SELECT *,
    round_even(100 * b * lm, 2) AS labor_min_a,
    round_even(200 * b * lm, 2) AS labor_max_a,
    round_even(40 * b * mm, 2) AS mat_min_a,
    round_even(80 * b * mm, 2) AS m0,
    CASE WHEN permit_type <> 'none'
              AND permit_base < (CASE permit_type {pc_min} END)
         THEN (CASE permit_type {pc_min} END) ELSE permit_base END
      AS permit_min_a,
    CASE WHEN permit_type <> 'none'
              AND permit_base < (CASE permit_type {pc_min} END)
         THEN (CASE permit_type {pc_max} END) ELSE permit_base END
      AS permit_max_a
  FROM mult),
climate AS (
  SELECT *,
    m0{mm_steps} AS mat_max_a,
    {climate_flat} AS clim
  FROM adjusted)
SELECT doc_id, k AS line_key, trade, permit_type, clim AS climate,
  labor_min_a AS labor_min, labor_max_a AS labor_max,
  mat_min_a AS mat_min, mat_max_a AS mat_max,
  permit_min_a AS permit_min, permit_max_a AS permit_max,
  round_even(labor_min_a + mat_min_a + permit_min_a + clim, 0) AS total_min,
  round_even(labor_max_a + mat_max_a + permit_max_a + clim, 0) AS total_max
FROM climate
"""


# ---------------------------------------------------------------------------
# C20 — multi-dimensional confidence scorer
# ---------------------------------------------------------------------------

C_DESCS = [
    "sm",
    "crack noted at the garage wall near front",
    "extensive water damage with leak and moisture at the rear bedroom "
    "measuring 24 inch span",
    "worn surface visible at the exterior with rust stain and corrosion "
    "marks along the accessible lower edge of the panel area today now",
    "condition in the attic behind wall with possible hidden concern",
]
C_LOCS = ["", "northeast bedroom", "roof area", "storage zone"]
C_CATS = ["hvac", "structural", "general items"]
C_ITEMS = ["hvac unit", "roof deck", "misc fixture"]
C_REASONS = [
    "",
    "short note on scope",
    "labor hours estimated from standard tables with material supplies "
    "priced at houston market rates for this repair category today",
]
C_AGES = [None, 10, 18, 30]
C_RATIO = ["2.0", "1.25", "3.5", "0.5"]


def q_phase2_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C20 confidence_score via the real estimation_rules code."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    b = (1 + F.pmod(F.floor(k / 23), F.lit(50))).cast("double")
    low = 4 * b
    df = o.select(
        F.pmod(k, F.lit(N_DOCS)).alias("doc_id"), k.alias("k"),
        _pick(C_DESCS, F.pmod(k, F.lit(5))).alias("description"),
        _pick(C_LOCS, F.pmod(F.floor(k / 3), F.lit(4))).alias("location"),
        _pick(C_CATS, F.pmod(F.floor(k / 7), F.lit(3))).alias("category"),
        _pick(C_ITEMS, F.pmod(F.floor(k / 11), F.lit(3))).alias("item"),
        _pick(["low", "high", "critical"],
              F.pmod(F.floor(k / 13), F.lit(3))).alias("severity"),
        _pick(C_REASONS, F.pmod(F.floor(k / 17), F.lit(3))).alias("reasoning"),
        low.alias("est_low"),
        (low * _pick(C_RATIO, F.pmod(F.floor(k / 19), F.lit(4)))
         .cast("double")).alias("est_high"),
        F.element_at(F.array(*[F.lit(a).cast("int") for a in C_AGES]),
                     (F.pmod(F.floor(k / 29), F.lit(4)) + 1).cast("int"))
        .alias("property_age"),
        (F.pmod(k, F.lit(2)) == 0).alias("has_photos"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                age = None if pd.isna(r.property_age) \
                    else int(r.property_age)
                conf = est.confidence_score(
                    {"estimated_low": r.est_low,
                     "estimated_high": r.est_high,
                     "reasoning": r.reasoning},
                    {"issue": r.description, "description": r.description,
                     "location": r.location, "category": r.category,
                     "item": r.item, "severity": r.severity},
                    property_age=age, has_photos=bool(r.has_photos),
                    database_match_score=0.5003)
                rows.append({
                    "doc_id": r.doc_id, "line_key": r.k,
                    "overall": conf["overall"],
                    "inspection_needed": bool(conf["inspection_needed"]),
                    "manual_review_needed": bool(
                        conf["manual_review_needed"]),
                    "s_desc": conf["breakdown"][
                        "description_completeness"],
                    "s_range": conf["breakdown"][
                        "estimate_range_quality"],
                    "s_access": conf["breakdown"]["access_difficulty"],
                })
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        run, "doc_id bigint, line_key bigint, overall double, "
             "inspection_needed boolean, manual_review_needed boolean, "
             "s_desc double, s_range double, s_access double")


def _sql_phase2_confidence() -> str:
    detail = " + ".join(
        f"CASE WHEN low_d LIKE '%{w}%' THEN 1 ELSE 0 END"
        for w in est._DETAIL_KEYWORDS)
    units = _like_any("low_d",
                      ["inch", "foot", "ft", '"', "'", "cm", "mm"])
    meas_pats = [r"\d+\s*(inch|foot|ft|cm|mm)", r"\d+\s*[\x22']",
                 r"\d+x\d+", r"\d+\s*(sq|square)\s*(ft|feet)"]
    meas = "(" + " OR ".join(
        "regexp_matches(dbl_d, '" + p.replace("'", "''") + "')"
        for p in meas_pats) + ")"
    spec_loc = _like_any("low_l", est._SPECIFIC_LOCATIONS)
    gen_loc = _like_any("low_l", est._GENERAL_LOCATIONS)
    high_cat = _like_any("low_c", est._HIGH_DATA_CATS)
    low_cat = _like_any("low_c", est._LOW_DATA_CATS)
    vague = " + ".join(
        f"CASE WHEN low_r LIKE '%{p}%' THEN 1 ELSE 0 END"
        for p in est._VAGUE_PHRASES)
    age_arms = " ".join(
        f"WHEN low_i LIKE '%{k}%' THEN "
        f"(CASE WHEN property_age <= {t} THEN 90.0::DOUBLE "
        f"WHEN property_age <= {u} THEN 70.0::DOUBLE "
        f"ELSE 50.0::DOUBLE END)"
        for k, (t, u) in est._AGE_CRITICAL.items())
    diff_acc = _like_any("acc_t", est._DIFFICULT_ACCESS)
    easy_acc = _like_any("acc_t", est._EASY_ACCESS)
    risk = " + ".join(
        f"CASE WHEN low_d LIKE '%{w}%' THEN 1 ELSE 0 END"
        for w in est._HIGH_RISK)
    w = est.CONFIDENCE_WEIGHTS
    return f"""
WITH inputs AS (
  SELECT o_orderkey % {N_DOCS} AS doc_id, o_orderkey AS k,
    CAST(1 + (o_orderkey // 23) % 50 AS DOUBLE) AS b,
    {_sql_list(C_DESCS)}[CAST(1 + o_orderkey % 5 AS INT)] AS description,
    {_pick_sql(C_LOCS, 3, 4)} AS location,
    {_pick_sql(C_CATS, 7, 3)} AS category,
    {_pick_sql(C_ITEMS, 11, 3)} AS item,
    {_pick_sql(['low', 'high', 'critical'], 13, 3)} AS severity,
    {_pick_sql(C_REASONS, 17, 3)} AS reasoning,
    [NULL, 10, 18, 30][CAST(1 + (o_orderkey // 29) % 4 AS INT)]
      AS property_age,
    o_orderkey % 2 = 0 AS has_photos,
    CAST({_pick_sql(C_RATIO, 19, 4)} AS DOUBLE) AS ratio_pick
  FROM orders),
txt AS (
  SELECT *,
    lower(description) AS low_d, lower(location) AS low_l,
    lower(category) AS low_c, lower(item) AS low_i,
    lower(reasoning) AS low_r,
    lower(description || ' ' || description) AS dbl_d,
    lower(location || ' ' || description) AS acc_t,
    4 * b AS est_low, 4 * b * ratio_pick AS est_high
  FROM inputs),
scores AS (
  SELECT *,
    least(100.0::DOUBLE,
      (CASE WHEN length(description) < 20 THEN 30.0::DOUBLE
            WHEN length(description) < 50 THEN 50.0::DOUBLE
            WHEN length(description) < 100 THEN 70.0::DOUBLE
            ELSE 85.0::DOUBLE END)
      + least(15, ({detail}) * 3)
      + CASE WHEN {units} THEN 10 ELSE 0 END) AS s_desc,
    CASE WHEN {meas} THEN 90.0::DOUBLE ELSE 50.0::DOUBLE END AS s_meas,
    CASE WHEN has_photos THEN 100.0::DOUBLE ELSE 60.0::DOUBLE END
      AS s_photos,
    CASE WHEN location = '' THEN 30.0::DOUBLE
         WHEN {spec_loc} THEN 100.0::DOUBLE
         WHEN {gen_loc} THEN 70.0::DOUBLE
         ELSE 50.0::DOUBLE END AS s_loc,
    -- database_match_score fixed at 0.5003: keeps every weighted sum
    -- >=0.0045 from a .05 rounding boundary, so python round and DuckDB
    -- round_even agree without tie-breaking subtleties
    (0.5003::DOUBLE * 100) AS s_db,
    CASE WHEN {high_cat} THEN 90.0::DOUBLE
         WHEN {low_cat} THEN 60.0::DOUBLE
         ELSE 75.0::DOUBLE END AS s_market,
    CASE WHEN est_low <= 0 OR est_high <= 0 OR est_low >= est_high
         THEN 0.0::DOUBLE
         WHEN est_high / est_low BETWEEN 1.3 AND 2.5 THEN 100.0::DOUBLE
         WHEN est_high / est_low BETWEEN 1.2 AND 3.0 THEN 85.0::DOUBLE
         WHEN est_high / est_low BETWEEN 1.1 AND 4.0 THEN 70.0::DOUBLE
         WHEN est_high / est_low < 1.1 THEN 40.0::DOUBLE
         ELSE 50.0::DOUBLE END AS s_range,
    CASE WHEN reasoning = '' THEN 0.0::DOUBLE
         ELSE greatest(0.0::DOUBLE, least(100.0::DOUBLE,
           (CASE WHEN length(reasoning) < 50 THEN 20.0::DOUBLE
                 WHEN length(reasoning) < 150 THEN 60.0::DOUBLE
                 WHEN length(reasoning) < 300 THEN 80.0::DOUBLE
                 ELSE 90.0::DOUBLE END)
           + CASE WHEN low_r LIKE '%labor%' OR low_r LIKE '%hours%'
                  THEN 5 ELSE 0 END
           + CASE WHEN low_r LIKE '%material%' OR low_r LIKE '%supplies%'
                  THEN 5 ELSE 0 END
           + CASE WHEN low_r LIKE '%houston%' OR low_r LIKE '%market%'
                  THEN 5 ELSE 0 END
           - ({vague}) * 5)) END AS s_reason,
    CASE WHEN property_age IS NULL THEN 60.0::DOUBLE
         ELSE coalesce(CASE {age_arms} END, 80.0::DOUBLE) END AS s_age,
    CASE WHEN {diff_acc} THEN 50.0::DOUBLE
         WHEN {easy_acc} THEN 95.0::DOUBLE
         ELSE 75.0::DOUBLE END AS s_access,
    CASE WHEN ({risk}) >= 2 OR severity = 'critical' THEN 40.0::DOUBLE
         WHEN ({risk}) = 1 OR severity = 'high' THEN 60.0::DOUBLE
         ELSE 85.0::DOUBLE END AS s_risk
  FROM txt),
overall AS (
  SELECT *,
    ((((((((((s_desc * {w['description_completeness']}::DOUBLE
      + s_meas * {w['has_measurements']}::DOUBLE)
      + s_photos * {w['has_photos']}::DOUBLE)
      + s_loc * {w['has_location']}::DOUBLE)
      + s_db * {w['database_match']}::DOUBLE)
      + s_market * {w['market_data_availability']}::DOUBLE)
      + s_range * {w['estimate_range_quality']}::DOUBLE)
      + s_reason * {w['reasoning_quality']}::DOUBLE)
      + s_age * {w['age_uncertainty']}::DOUBLE)
      + s_access * {w['access_difficulty']}::DOUBLE)
      + s_risk * {w['hidden_damage_risk']}::DOUBLE) AS ov
  FROM scores)
SELECT doc_id, k AS line_key, round_even(ov, 1) AS overall,
  ov < 55 AS inspection_needed,
  ov < 70 AS manual_review_needed,
  round_even(s_desc, 1) AS s_desc, round_even(s_range, 1) AS s_range,
  round_even(s_access, 1) AS s_access
FROM overall
"""


# ---------------------------------------------------------------------------
# Hybrid estimator routing (hybrid_cost_estimator.py:86-341)
# ---------------------------------------------------------------------------

# P2_DESCS[0] "...in hall" trips the 'all' complex-indicator substring
# (a preserved reference quirk) and never reaches the lookup table; the
# hybrid gate swaps in a clean lookup hit so estimator_used covers all
# three values
HY_DESCS = ["replace the gfci outlet in den"] + P2_DESCS[1:]


def q_hybrid_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hybrid-estimator fallback chain via the real
    estimation_rules.hybrid_estimate: C19 strategy select -> route to the
    strategy's own estimator (lookup/formula) or the severity fallback
    heuristic (the no-LLM path of the hybrid/llm branches) -> C21 Houston
    adjustment; chain metadata (estimator_used, fallback_depth) is
    first-class output. The HY corpus exercises every branch: lookup,
    formula sqft, formula linear-ft, hybrid-fallback,
    complex/uncertain/default llm-fallback."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    df = o.select(
        F.pmod(k, F.lit(N_DOCS)).alias("doc_id"), k.alias("k"),
        _pick(HY_DESCS, F.pmod(k, F.lit(8))).alias("description"),
        _pick(P2_CATS, F.pmod(F.floor(k / 7), F.lit(3))).alias("category"),
        _pick(P2_SEVS, F.pmod(F.floor(k / 11), F.lit(4))).alias("severity"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                h = est.hybrid_estimate(
                    {"title": "", "description": r.description,
                     "category": r.category, "severity": r.severity})
                rows.append({
                    "doc_id": r.doc_id, "line_key": r.k,
                    "strategy": h["strategy"],
                    "strategy_confidence": h["strategy_confidence"],
                    "estimator_used": h["estimator_used"],
                    "fallback_depth": h["fallback_depth"],
                    "contractor_type": h["contractor_type"],
                    "urgency": h["urgency"],
                    "trade": h["trade"],
                    "permit_type": h["permit_type"],
                    "total_min": h["total_min"],
                    "total_max": h["total_max"],
                })
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        run, "doc_id bigint, line_key bigint, strategy string, "
             "strategy_confidence double, estimator_used string, "
             "fallback_depth bigint, contractor_type string, "
             "urgency string, trade string, permit_type string, "
             "total_min double, total_max double")


def _sql_hybrid_routing() -> str:
    # --- C19 tiers with component-bearing arms (labor/materials/permits
    # needed separately because Houston multiplies them independently) ---
    lookup_arms = []
    for name, cd in est.SIMPLE_REPAIRS.items():
        lookup_arms.append(
            f"WHEN text LIKE '%{name}%' THEN struct_pack("
            f"ll := {cd['labor'][0]}::DOUBLE, lh := {cd['labor'][1]}::DOUBLE, "
            f"ml := {cd['materials'][0]}::DOUBLE, "
            f"mh := {cd['materials'][1]}::DOUBLE)")
    complex_ind = _like_any("text", est.COMPLEX_INDICATORS)
    complex_kw = _like_any("text", est.COMPLEX_KEYWORDS)
    complex_cat = "(" + " OR ".join(
        f"cat LIKE '%{c}%'" for c in est.COMPLEX_CATEGORIES) + ")"
    simple_kw = _like_any("text", est.SIMPLE_KEYWORDS)
    uncertain = _like_any("text", est.UNCERTAINTY_PHRASES)
    hybrid_ind = _like_any("text", est.HYBRID_INDICATORS)
    formula_arms = []
    for cat, fm in est.FORMULA_CATEGORIES.items():
        nm = cat.replace("_", " ")
        if "labor_per_sqft" in fm:
            l_lo, l_hi = fm["labor_per_sqft"]
            m_lo, m_hi = fm["material_per_sqft"]
            var, guard = "sqft", "sqft IS NOT NULL"
        else:
            l_lo, l_hi = fm["labor_per_linear_ft"]
            m_lo, m_hi = fm["material_per_linear_ft"]
            var, guard = "lf", "sqft IS NULL AND lf IS NOT NULL"
        formula_arms.append(
            f"WHEN text LIKE '%{nm}%' AND {guard} THEN struct_pack("
            f"ll := round_even({var} * {l_lo}::DOUBLE, 2), "
            f"lh := round_even({var} * {l_hi}::DOUBLE, 2), "
            f"ml := round_even({var} * {m_lo}::DOUBLE, 2), "
            f"mh := round_even({var} * {m_hi}::DOUBLE, 2))")
    # severity-banded fallback heuristic (hybrid_cost_estimator.py:247-283)
    sev_base = ("(CASE WHEN severity IN ('critical', 'high') THEN 500 "
                "WHEN severity = 'medium' THEN 200 ELSE 100 END)")
    sev_top = ("(CASE WHEN severity IN ('critical', 'high') THEN 2000 "
               "WHEN severity = 'medium' THEN 800 ELSE 400 END)")
    # contractor keyword ladder over title+description+category
    # (hybrid_cost_estimator.py:300-318)
    contractor_case = " ".join(
        "WHEN " + " OR ".join(
            f"ctext LIKE '%{w}%'" for w in kws) + f" THEN '{c}'"
        for c, kws in est.CONTRACTOR_KEYWORDS.items())
    p = _houston_sql_parts()
    return f"""
WITH inputs AS (
  SELECT o_orderkey % {N_DOCS} AS doc_id, o_orderkey AS k,
    {_sql_list(HY_DESCS)}[CAST(1 + o_orderkey % 8 AS INT)] AS description,
    {_pick_sql(P2_CATS, 7, 3)} AS cat,
    {_pick_sql(P2_SEVS, 11, 4)} AS severity
  FROM orders),
txt AS (
  SELECT *, ' ' || lower(description) AS text,
    lower(' ' || description || ' ' || cat) AS ctext,
    CAST(nullif(regexp_extract(lower(description),
      '(\\d+)\\s*(?:square\\s*feet|sq\\.?\\s*ft\\.?|sf)', 1), '')
      AS DOUBLE) AS sqft,
    CAST(nullif(regexp_extract(lower(description),
      '(\\d+)\\s*(?:linear\\s*feet|lf|feet|ft)', 1), '') AS DOUBLE) AS lf
  FROM inputs),
tiers AS (
  SELECT *,
    CASE WHEN NOT {complex_ind}
         THEN CASE {' '.join(lookup_arms)} END END AS lk,
    ({complex_kw} OR {complex_cat}
     OR (severity IN ('critical', 'high') AND NOT {simple_kw})
     OR {uncertain}) AS is_complex,
    CASE {' '.join(formula_arms)} END AS fm,
    (NOT {simple_kw} AND NOT {complex_kw} AND {hybrid_ind}) AS is_hybrid
  FROM txt),
routed AS (
  SELECT *,
    CASE WHEN lk IS NOT NULL THEN 'lookup_table'
         WHEN is_complex THEN 'llm_reasoning'
         WHEN fm IS NOT NULL THEN 'formula_based'
         WHEN is_hybrid THEN 'hybrid'
         ELSE 'llm_reasoning' END AS strategy,
    CASE WHEN lk IS NOT NULL THEN 0.95::DOUBLE
         WHEN is_complex THEN 0.7::DOUBLE
         WHEN fm IS NOT NULL THEN 0.85::DOUBLE
         WHEN is_hybrid THEN 0.75::DOUBLE
         ELSE 0.6::DOUBLE END AS strategy_confidence
  FROM tiers),
based AS (
  SELECT *,
    CASE strategy WHEN 'lookup_table' THEN 'lookup_table'
         WHEN 'formula_based' THEN 'formula_based'
         ELSE 'fallback_heuristic' END AS estimator_used,
    CASE strategy WHEN 'lookup_table' THEN 0
         WHEN 'formula_based' THEN 0 ELSE 1 END AS fallback_depth,
    CASE strategy WHEN 'lookup_table' THEN lk.ll
         WHEN 'formula_based' THEN fm.ll
         ELSE {sev_base} * 0.6::DOUBLE END AS bll,
    CASE strategy WHEN 'lookup_table' THEN lk.lh
         WHEN 'formula_based' THEN fm.lh
         ELSE {sev_top} * 0.6::DOUBLE END AS blh,
    CASE strategy WHEN 'lookup_table' THEN lk.ml
         WHEN 'formula_based' THEN fm.ml
         ELSE {sev_base} * 0.4::DOUBLE END AS bml,
    CASE strategy WHEN 'lookup_table' THEN lk.mh
         WHEN 'formula_based' THEN fm.mh
         ELSE {sev_top} * 0.4::DOUBLE END AS bmh,
    CASE strategy WHEN 'lookup_table' THEN 'General'
         WHEN 'formula_based' THEN CASE {contractor_case}
                                   ELSE 'General Contractor' END
         ELSE 'General' END AS contractor_type,
    CASE severity WHEN 'critical' THEN 'immediate'
         WHEN 'high' THEN 'urgent'
         WHEN 'medium' THEN 'normal' ELSE 'low' END AS urgency
  FROM routed),
traded AS (
  SELECT *,
    CASE {p['trade_case']} ELSE 'general' END AS trade,
    CASE {p['permit_case']} ELSE 'none' END AS permit_type
  FROM based),
mult AS (
  SELECT *,
    CASE trade {p['lm_case']} ELSE 1.10::DOUBLE END AS lm,
    CASE trade {p['mm_case']} ELSE 1.00::DOUBLE END AS mm
  FROM traded),
adjusted AS (
  SELECT *,
    round_even(bll * lm, 2) AS labor_min_a,
    round_even(blh * lm, 2) AS labor_max_a,
    round_even(bml * mm, 2) AS mat_min_a,
    round_even(bmh * mm, 2) AS m0,
    -- every chain estimator carries zero base permits, so the Houston
    -- replacement fires exactly when a permit type matched
    CASE WHEN permit_type <> 'none'
         THEN (CASE permit_type {p['pc_min']} END)
         ELSE 0.0::DOUBLE END AS permit_min_a,
    CASE WHEN permit_type <> 'none'
         THEN (CASE permit_type {p['pc_max']} END)
         ELSE 0.0::DOUBLE END AS permit_max_a
  FROM mult),
climate AS (
  SELECT *,
    m0{p['mm_steps']} AS mat_max_a,
    {p['climate_flat']} AS clim
  FROM adjusted)
SELECT doc_id, k AS line_key, strategy, strategy_confidence,
  estimator_used, CAST(fallback_depth AS BIGINT) AS fallback_depth,
  contractor_type, urgency, trade, permit_type,
  round_even(labor_min_a + mat_min_a + permit_min_a + clim, 0) AS total_min,
  round_even(labor_max_a + mat_max_a + permit_max_a + clim, 0) AS total_max
FROM climate
"""


# ---------------------------------------------------------------------------
# F2-extension — estimate output validator (output_validator.py:34-460)
# ---------------------------------------------------------------------------

OV_ITEMS = ["fixture", ""]
OV_DESCS = ["replace the worn fixture at entry",
            "surface wear noted at the wall"]
OV_SEVS = ["Low", "Critical", "Medium", "odd"]
OV_ACTIONS = ["monitor area", "immediate replacement needed", "repair"]
OV_REASONS = [
    "brief note",
    "labor and materials estimated from standard regional cost tables "
    "for this repair",
    "as discussed the full scope covers removal of the worn assembly and "
    "replacement with a code compliant unit including surface preparation "
    "fastening sealing and cleanup with materials priced from regional "
    "supplier lists and labor hours drawn from standard production rate "
    "manuals for this trade the access path is open and no structural "
    "modification is expected the final invoice may differ where concealed "
    "conditions are discovered during removal and any such discovery will "
    "be documented with photographs and a revised line item quotation "
    "before additional work proceeds on site",
    "the repair scope is unclear and depends on access conditions behind "
    "the finished wall surface so the range covers both the simple "
    "fastener fix and the partial reframing case with materials at "
    "regional list prices",
]
OV_LOWS = [1000, 200, 100, 433, 500, 0, -5, 120]
OV_HIGHS = [3000, 250, 900, 577, 400, 60000, 50, 480]
OV_CONFS = [95, 82, 45, 150]


def q_output_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate-output validation (output_rules.validate_estimate — the
    deterministic slice of the reference's prompting-layer screen): per
    record the error/warning counts, strict validity, manual-review flag
    and quality score. The pools cover every check: missing field, enum
    violation, range violations, low>=high, narrow/wide/round-thousand
    ranges, all five consistency rules, generic-phrase and precision
    hallucination heuristics, and each review trigger."""
    from . import output_rules as ov

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    df = o.select(
        F.pmod(k, F.lit(N_DOCS)).alias("doc_id"), k.alias("k"),
        _pick(OV_ITEMS, F.pmod(k, F.lit(2))).alias("item"),
        _pick(OV_DESCS, F.pmod(F.floor(k / 2), F.lit(2))).alias("description"),
        _pick(OV_SEVS, F.pmod(F.floor(k / 3), F.lit(4))).alias("severity"),
        _pick(OV_ACTIONS, F.pmod(F.floor(k / 5), F.lit(3))).alias("action"),
        _pick(OV_REASONS, F.pmod(F.floor(k / 7), F.lit(4))).alias("reasoning"),
        _pick([str(x) for x in OV_LOWS],
              F.pmod(F.floor(k / 11), F.lit(8))).cast("long").alias("low"),
        _pick([str(x) for x in OV_HIGHS],
              F.pmod(F.floor(k / 11), F.lit(8))).cast("long").alias("high"),
        _pick([str(x) for x in OV_CONFS],
              F.pmod(F.floor(k / 13), F.lit(4))).cast("long").alias("conf"),
        (F.pmod(k, F.lit(2)) == 0).alias("has_assumptions"),
        (F.pmod(k, F.lit(3)) == 0).alias("has_risks"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                estimate = {
                    "item": r.item, "issue_description": r.description,
                    "severity": r.severity, "suggested_action": r.action,
                    "estimated_low": int(r.low),
                    "estimated_high": int(r.high),
                    "confidence_score": int(r.conf),
                    "reasoning": r.reasoning,
                }
                if r.has_assumptions:
                    estimate["assumptions"] = ["assumes open access"]
                if r.has_risks:
                    estimate["risk_factors"] = ["concealed damage"]
                v = ov.validate_estimate(estimate)
                rows.append({
                    "doc_id": r.doc_id, "line_key": r.k,
                    "n_errors": v["n_errors"],
                    "n_warnings": v["n_warnings"],
                    "valid": v["valid"],
                    "needs_review": v["needs_review"],
                    "quality_score": v["quality_score"],
                })
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        run, "doc_id bigint, line_key bigint, n_errors bigint, "
             "n_warnings bigint, valid boolean, needs_review boolean, "
             "quality_score bigint")


def _sql_output_validate() -> str:
    from . import output_rules as ov

    sev_list = ", ".join(f"'{s}'" for s in ov.VALID_SEVERITIES)
    uncertain = " OR ".join(f"low_r LIKE '%{k}%'"
                            for k in ov.UNCERTAINTY_KEYWORDS)
    generic = " + ".join(
        f"CASE WHEN low_r LIKE '%{p}%' THEN 1 ELSE 0 END"
        for p in ov.GENERIC_PHRASES)
    return f"""
WITH inputs AS (
  SELECT o_orderkey % {N_DOCS} AS doc_id, o_orderkey AS k,
    {_sql_list(OV_ITEMS)}[CAST(1 + o_orderkey % 2 AS INT)] AS item,
    {_sql_list(OV_DESCS)}[CAST(1 + (o_orderkey // 2) % 2 AS INT)]
      AS description,
    {_sql_list(OV_SEVS)}[CAST(1 + (o_orderkey // 3) % 4 AS INT)]
      AS severity,
    {_sql_list(OV_ACTIONS)}[CAST(1 + (o_orderkey // 5) % 3 AS INT)]
      AS action,
    {_sql_list(OV_REASONS)}[CAST(1 + (o_orderkey // 7) % 4 AS INT)]
      AS reasoning,
    {_sql_list([str(x) for x in OV_LOWS])}
      [CAST(1 + (o_orderkey // 11) % 8 AS INT)]::BIGINT AS low,
    {_sql_list([str(x) for x in OV_HIGHS])}
      [CAST(1 + (o_orderkey // 11) % 8 AS INT)]::BIGINT AS high,
    {_sql_list([str(x) for x in OV_CONFS])}
      [CAST(1 + (o_orderkey // 13) % 4 AS INT)]::BIGINT AS conf,
    o_orderkey % 2 = 0 AS has_assumptions,
    o_orderkey % 3 = 0 AS has_risks
  FROM orders),
txt AS (
  SELECT *, lower(reasoning) AS low_r, lower(severity) AS low_s,
    lower(action) AS low_a, lower(description) AS low_d
  FROM inputs),
checks AS (
  SELECT *,
    -- errors (one line for ALL missing fields together; only item can
    -- be empty in this corpus)
    (CASE WHEN item = '' THEN 1 ELSE 0 END)
    + (CASE WHEN severity NOT IN ({sev_list}) THEN 1 ELSE 0 END)
    + (CASE WHEN conf NOT BETWEEN 0 AND 100 THEN 1 ELSE 0 END)
    + (CASE WHEN low < 0 THEN 1 ELSE 0 END)
    + (CASE WHEN high > 50000 THEN 1 ELSE 0 END)
    + (CASE WHEN length(reasoning) < 50 THEN 1 ELSE 0 END)
    + (CASE WHEN low >= high THEN 1 ELSE 0 END) AS ne,
    -- warnings (python % on a negative low differs from SQL %, but both
    -- are nonzero for every pool value, so the =0 outcomes agree)
    (CASE WHEN high - low < 100 AND low > 0 THEN 1 ELSE 0 END)
    + (CASE WHEN low > 0 AND high / low > 5 THEN 1 ELSE 0 END)
    + (CASE WHEN low % 1000 = 0 AND high % 1000 = 0 THEN 1 ELSE 0 END)
    + (CASE WHEN low_s = 'critical' AND low_a LIKE '%monitor%'
            THEN 1 ELSE 0 END)
    + (CASE WHEN low_s = 'low' AND high > 5000 THEN 1 ELSE 0 END)
    + (CASE WHEN conf > 85 AND low > 0 AND high / low > 3
            THEN 1 ELSE 0 END)
    + (CASE WHEN low_a LIKE '%immediate%'
             AND low_s IN ('low', 'informational') THEN 1 ELSE 0 END)
    + (CASE WHEN ({uncertain}) AND conf > 80 THEN 1 ELSE 0 END)
    + ({generic})
    + (CASE WHEN low % 10 <> 0 AND high % 10 <> 0 AND low <> high
             AND (low % 5 <> 0 OR high % 5 <> 0) THEN 1 ELSE 0 END)
    + (CASE WHEN length(reasoning) > 500 AND conf < 70 THEN 1 ELSE 0 END)
    + (CASE WHEN low_d LIKE '%replace%' AND low_r LIKE '%repair%'
             AND low_r NOT LIKE '%replace%' THEN 1 ELSE 0 END) AS nw
  FROM txt),
scored AS (
  SELECT *,
    greatest(0, least(100,
      100 - 20 * ne - 5 * nw
      + (CASE WHEN has_assumptions THEN 5 ELSE 0 END)
      + (CASE WHEN has_risks THEN 5 ELSE 0 END)
      + (CASE WHEN length(reasoning) > 200 THEN 5 ELSE 0 END)
      - (CASE WHEN conf < 50 THEN 10 ELSE 0 END))) AS q
  FROM checks)
SELECT doc_id, k AS line_key,
  CAST(ne AS BIGINT) AS n_errors, CAST(nw AS BIGINT) AS n_warnings,
  ne = 0 AS valid,
  (ne > 0 OR q < 60 OR conf < 60 OR high > 50000 OR nw >= 3
   OR (low > 0 AND high / low > 4)) AS needs_review,
  CAST(q AS BIGINT) AS quality_score
FROM scored
"""


QUERIES_PHASE2: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "phase2_select": q_phase2_select,
    "phase2_houston": q_phase2_houston,
    "phase2_confidence": q_phase2_confidence,
    "hybrid_routing": q_hybrid_routing,
    "output_validate": q_output_validate,
}

ORACLES_PHASE2: dict[str, str] = {
    "phase2_select": _sql_phase2_select(),
    "phase2_houston": _sql_phase2_houston(),
    "phase2_confidence": _sql_phase2_confidence(),
    "hybrid_routing": _sql_hybrid_routing(),
    "output_validate": _sql_output_validate(),
}
