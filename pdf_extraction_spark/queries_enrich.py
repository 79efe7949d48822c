"""Enrichment-operator correctness queries + DuckDB oracle SQL.

Same contract as queries.py: deterministic issue fields derived from the
``orders`` table identically on both sides; the Spark side runs the REAL
enrichment implementation (enrich_rules, the same code the mapInPandas
pipeline executes); the oracle side is an independent ANSI-SQL transcription
of the reference semantics, generated from the rule tables so keyword lists
cannot drift.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import enrich_rules as er
from . import rules
from .queries import _pick, _sql_list

# ---------------------------------------------------------------------------
# Shared derived-issue recipe
# ---------------------------------------------------------------------------

N_DOCS = 50

STATUSES = ["D", "I", "NI", "NP"]
PTEXTS = ["high", "medium", "low", "info"]
ITEMS = ["The window frame", "The door trim", "The ceiling surface",
         "The floor tile", "The wall panel"]
PHRASES = ["shows hairline crack near the corner",
           "has a small leak at the joint",
           "is worn and requires repair",
           "is in acceptable condition",
           "shows rust at the fastener"]
ACTION_SFX = ["", " Recommend replacement of the unit",
              " Monitor condition over time",
              " Routine maintenance and service recommended",
              " Further evaluation by licensed contractor required",
              " Repair immediately to correct the condition"]
BOOST_SFX = ["", " Water damage observed nearby",
             " This is a safety concern",
             " Gas odor present at the fixture", " Roof area affected"]
CATS = ["Electrical", "HVAC", "Plumbing", "Roofing", "Interior", "Unknown"]
SEVERITIES = ["critical", "high", "medium", "low", "unknown"]
COST_SEVERITIES = ["critical", "major", "high", "moderate", "medium",
                   "minor", "unknown"]
COST_WORDS = ["roof shingle wear", "outlet wiring issue",
              "pipe drain problem", "furnace compressor fault",
              "foundation slab settling", "beam joist concern",
              "siding trim wear", "window frame seal issue",
              "drywall ceiling blemish", "carpet floor wear",
              "generic item observation"]
COST_MODS = ["replacement needed", "major extensive scope",
             "leak damage noted", "minor scope", "pier leveling needed",
             "moderate scope", "paint finish", "multiple all units",
             "standard work"]
WORKS = ["repair", "replacement", "inspection", "maintenance", "monitoring"]
TRADES = ["plumbing", "electrical", "hvac", "roofing", "general"]
DAMAGE_PICKS: list[list[str]] = [[], ["water_damage"], ["mold"],
                                 ["water_damage", "mold"], ["crack"]]


def derived_issues(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")

    def p(arr: list[str], div: int, mod: int) -> Column:
        return _pick(arr, F.pmod(F.floor(k / div), F.lit(mod)))

    item = p(ITEMS, 7, 5)
    phrase = p(PHRASES, 5, 5)
    desc = F.concat(item, F.lit(" "), phrase, F.lit("."),
                    p(ACTION_SFX, 3, 6), p(BOOST_SFX, 11, 5))
    return o.select(
        F.pmod(k, F.lit(N_DOCS)).alias("doc_id"), k.alias("k"),
        _pick(STATUSES, F.pmod(k, F.lit(4))).alias("status"),
        p(PTEXTS, 4, 4).alias("ptext"),
        desc.alias("description"),
        F.concat(item, F.lit(" condition")).alias("title"),
        p(CATS, 13, 6).alias("category"),
        p(SEVERITIES, 23, 5).alias("severity"),
        p(WORKS, 17, 5).alias("work_type"),
        p(TRADES, 19, 5).alias("trade"),
        p(COST_SEVERITIES, 29, 7).alias("cost_severity"),
        F.concat(F.lit("found "), p(COST_WORDS, 2, 11), F.lit(" with "),
                 p(COST_MODS, 13, 9)).alias("cost_desc"),
        _pick([str(i) for i in range(5)],
              F.pmod(F.floor(k / 31), F.lit(5))).alias("damage_pick"),
        (F.pmod(k, F.lit(3)) == 0).alias("safety_flag"),
    )


def _pick_sql(arr: list[str], div: int, mod: int) -> str:
    return f"{_sql_list(arr)}[CAST(1 + (o_orderkey // {div}) % {mod} AS INT)]"


SQL_ISSUES_CTE = f"""
issues AS (
  SELECT o_orderkey % {N_DOCS} AS doc_id, o_orderkey AS k,
    {_sql_list(STATUSES)}[CAST(1 + o_orderkey % 4 AS INT)] AS status,
    {_pick_sql(PTEXTS, 4, 4)} AS ptext,
    {_pick_sql(ITEMS, 7, 5)} || ' ' || {_pick_sql(PHRASES, 5, 5)} || '.'
      || {_pick_sql(ACTION_SFX, 3, 6)} || {_pick_sql(BOOST_SFX, 11, 5)} AS description,
    {_pick_sql(ITEMS, 7, 5)} || ' condition' AS title,
    {_pick_sql(CATS, 13, 6)} AS category,
    {_pick_sql(SEVERITIES, 23, 5)} AS severity,
    {_pick_sql(WORKS, 17, 5)} AS work_type,
    {_pick_sql(TRADES, 19, 5)} AS trade,
    {_pick_sql(COST_SEVERITIES, 29, 7)} AS cost_severity,
    'found ' || {_pick_sql(COST_WORDS, 2, 11)} || ' with '
      || {_pick_sql(COST_MODS, 13, 9)} AS cost_desc,
    {_pick_sql([str(i) for i in range(5)], 31, 5)} AS damage_pick,
    o_orderkey % 3 = 0 AS safety_flag
  FROM orders)
"""


def _like_any(expr: str, words: list[str]) -> str:
    return "(" + " OR ".join(
        f"{expr} LIKE '%" + w.replace("'", "''") + "%'" for w in words) + ")"


# ---------------------------------------------------------------------------
# C7 — severity normalization
# ---------------------------------------------------------------------------

def q_severity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 (severity_normalizer.py:59-180) via the real enrich_rules code."""
    df = derived_issues(spark, sf_dir).select("doc_id", "k", "ptext",
                                              "status", "description")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = [er.normalize_severity(t, s, d) for t, s, d in
                   zip(pdf["ptext"], pdf["status"], pdf["description"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "line_key": pdf["k"],
                "std_severity": [r[0] for r in res],
                "confidence": [r[1] for r in res]})

    return df.mapInPandas(
        run, "doc_id bigint, line_key bigint, std_severity string, "
             "confidence double")


def _sql_severity() -> str:
    crit = _like_any("lower(description)", rules.SEVERITY_BOOSTERS["critical"])
    high = _like_any("lower(description)", rules.SEVERITY_BOOSTERS["high"])
    return f"""
WITH {SQL_ISSUES_CTE},
base AS (
  SELECT doc_id, k,
    CASE status WHEN 'D' THEN 'high' WHEN 'I' THEN 'low'
                WHEN 'NI' THEN 'medium' WHEN 'NP' THEN 'low' END AS sev0,
    ptext, description
  FROM issues),
tiered AS (
  -- ptext in (high, medium, low) exact-matches the keyword table at 0.95:
  -- equal to base -> conf 0.95; different with conf>0.8 -> override at 0.95
  SELECT doc_id, k, description,
    CASE WHEN ptext IN ('high','medium','low') THEN ptext ELSE sev0 END AS sev1,
    -- ::DOUBLE literals: bare 0.7 + 0.1 is DECIMAL arithmetic in DuckDB
    -- (exact 0.8) while python computes IEEE 0.7999999999999999 — the
    -- exact-hash comparator sees the difference even though atol doesn't
    CASE WHEN ptext IN ('high','medium','low') THEN 0.95::DOUBLE
         ELSE 0.7::DOUBLE END AS conf1
  FROM base)
SELECT doc_id, k AS line_key,
  CASE WHEN {crit} AND sev1 IN ('low','medium') THEN 'high'
       WHEN {crit} AND sev1 = 'high'
            AND lower(description) LIKE '%safety%' THEN 'critical'
       WHEN {high} AND sev1 = 'low' THEN 'medium'
       ELSE sev1 END AS std_severity,
  CASE WHEN {crit} AND sev1 IN ('low','medium')
         THEN least(0.9::DOUBLE, conf1 + 0.1::DOUBLE)
       WHEN {crit} AND sev1 = 'high'
            AND lower(description) LIKE '%safety%'
         THEN least(0.95::DOUBLE, conf1 + 0.1::DOUBLE)
       WHEN {high} AND sev1 = 'low'
         THEN least(0.85::DOUBLE, conf1 + 0.1::DOUBLE)
       ELSE conf1 END AS confidence
FROM tiered
"""


# ---------------------------------------------------------------------------
# C8 — action normalization
# ---------------------------------------------------------------------------

def q_action(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 (action_normalizer.py:116-217) via the real enrich_rules code."""
    df = derived_issues(spark, sf_dir).select("doc_id", "k", "description",
                                              "severity")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = [er.normalize_action("", d, s)
                   for d, s in zip(pdf["description"], pdf["severity"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "line_key": pdf["k"],
                "std_action": [r[0] for r in res],
                "confidence": [r[1] for r in res]})

    return df.mapInPandas(
        run, "doc_id bigint, line_key bigint, std_action string, "
             "confidence double")


def _sql_action() -> str:
    # per-action best keyword confidence (0.0 when none)
    score_cols = []
    for action, cfg in rules.ACTION_TAXONOMY.items():
        cases = ", ".join(
            "CASE WHEN t LIKE '%" + kw.replace("'", "''")
            + f"%' THEN {min(0.95, 0.6 + len(kw.split()) * 0.1)!r}"
            + " ELSE 0.0 END"
            for kw in cfg["keywords"])
        score_cols.append(f"greatest({cases}) AS s_{action}")
    actions = list(rules.ACTION_TAXONOMY)
    best_conf = "greatest(" + ", ".join(f"s_{a}" for a in actions) + ")"
    best_case = " ".join(
        f"WHEN s_{a} = best AND s_{a} > 0.0 THEN '{a}'" for a in actions)
    pat_case = " ".join(
        "WHEN (" + " OR ".join(
            "regexp_matches(t, '" + p.replace("'", "''") + "')"
            for p in cfg["patterns"]) + f") THEN '{a}'"
        for a, cfg in rules.ACTION_TAXONOMY.items())
    return f"""
WITH {SQL_ISSUES_CTE},
txt AS (SELECT doc_id, k, lower(description) AS t, severity FROM issues),
scored AS (SELECT doc_id, k, t, severity, {', '.join(score_cols)} FROM txt),
kw AS (
  SELECT *, {best_conf} AS best,
    CASE {best_case} ELSE 'unknown' END AS kw_action
  FROM scored),
pat AS (
  SELECT *, CASE {pat_case} END AS pat_action FROM kw),
merged AS (
  SELECT doc_id, k, severity,
    CASE WHEN best < 0.7 AND pat_action IS NOT NULL
         THEN pat_action ELSE kw_action END AS a2,
    CASE WHEN best < 0.7 AND pat_action IS NOT NULL
         THEN 0.85 ELSE best END AS c2
  FROM pat)
SELECT doc_id, k AS line_key,
  CASE WHEN severity IN ('critical','high')
            AND a2 IN ('monitoring','maintenance','no_action')
       THEN 'immediate_repair'
       WHEN severity = 'low' AND a2 = 'immediate_repair' THEN 'maintenance'
       ELSE a2 END AS std_action,
  CASE WHEN severity IN ('critical','high')
            AND a2 IN ('monitoring','maintenance','no_action')
       THEN least(0.85, c2 + 0.1)
       WHEN severity = 'low' AND a2 = 'immediate_repair'
       THEN least(0.8, c2 + 0.1)
       ELSE c2 END AS confidence
FROM merged
"""


# ---------------------------------------------------------------------------
# C10 — urgency score
# ---------------------------------------------------------------------------

def q_urgency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10 (metadata_enricher.py:67-117) via the real enrich_rules code."""
    df = derived_issues(spark, sf_dir).select(
        "doc_id", "k", "severity", "work_type", "safety_flag",
        "damage_pick", "description")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scores = []
            for sev, act, safety, dp, desc in zip(
                    pdf["severity"], pdf["work_type"], pdf["safety_flag"],
                    pdf["damage_pick"], pdf["description"]):
                issue = {
                    "standard_severity": sev,
                    # reuse work_type words as the action string: the rule
                    # only substring-scans it
                    "standard_action": act,
                    "safety_flag": bool(safety),
                    "extracted_attributes": {
                        "damage_types": DAMAGE_PICKS[int(dp)]},
                    "description": desc,
                }
                scores.append(er.urgency_score(issue))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "line_key": pdf["k"], "urgency": scores})

    return df.mapInPandas(
        run, "doc_id bigint, line_key bigint, urgency double")


def _sql_urgency() -> str:
    dmg = _sql_list([",".join(d) for d in DAMAGE_PICKS])
    return f"""
WITH {SQL_ISSUES_CTE},
feat AS (
  SELECT doc_id, k,
    CASE severity WHEN 'critical' THEN 4.0 WHEN 'high' THEN 3.0
                  WHEN 'medium' THEN 2.0 WHEN 'low' THEN 1.0 ELSE 0.0 END AS sev_pts,
    CASE WHEN work_type LIKE '%immediate%' THEN 3.0
         WHEN work_type LIKE '%replacement%' OR work_type LIKE '%replace%' THEN 2.0
         WHEN work_type LIKE '%repair%' THEN 1.5
         WHEN work_type LIKE '%inspect%' OR work_type LIKE '%evaluat%' THEN 1.0
         WHEN work_type LIKE '%monitor%' THEN 0.5 ELSE 0.0 END AS act_pts,
    CASE WHEN safety_flag THEN 3.0 ELSE 0.0 END AS safety_pts,
    {dmg}[CAST(1 + CAST(damage_pick AS INT) AS INT)] AS dmg_s,
    lower(description) AS d
  FROM issues)
SELECT doc_id, k AS line_key,
  round(least(10.0, 5.0 + sev_pts + act_pts + safety_pts
    + CASE WHEN dmg_s LIKE '%water_damage%' OR d LIKE '%leak%' THEN 1.0 ELSE 0.0 END
    + CASE WHEN dmg_s LIKE '%mold%' THEN 1.5 ELSE 0.0 END), 2) AS urgency
FROM feat
"""


# ---------------------------------------------------------------------------
# C14 — trade classification
# ---------------------------------------------------------------------------

def q_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C14 (issue_classifier.py:91-138) via the real enrich_rules code."""
    df = derived_issues(spark, sf_dir).select(
        "doc_id", "k", "category", "description", "title")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = [er.classify_trade({
                "standard_category": c, "description": d, "title": t,
                "section": "I. GENERAL"})
                for c, d, t in zip(pdf["category"], pdf["description"],
                                   pdf["title"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "line_key": pdf["k"],
                "trade": [r[0] for r in res],
                "confidence": [r[1] for r in res]})

    return df.mapInPandas(
        run, "doc_id bigint, line_key bigint, trade string, "
             "confidence double")


def _sql_trade() -> str:
    score_cols = []
    for trade, cfg in rules.TRADE_CLASSIFICATION.items():
        kw = " + ".join(
            "CASE WHEN c LIKE '%" + w.replace("'", "''") + "%' THEN 1 ELSE 0 END"
            for w in cfg["keywords"])
        cat = " + ".join(
            f"CASE WHEN lower(category) LIKE '%{x.lower()}%' THEN 5 ELSE 0 END"
            for x in cfg["categories"])
        score_cols.append(f"({kw} + {cat}) AS s_{trade}")
    trades = list(rules.TRADE_CLASSIFICATION)
    best = "greatest(" + ", ".join(f"s_{t}" for t in trades) + ")"
    best_case = " ".join(
        f"WHEN s_{t} = b AND s_{t} > 0 THEN '{t}'" for t in trades)
    return f"""
WITH {SQL_ISSUES_CTE},
txt AS (
  SELECT doc_id, k, category,
    lower(category || ' ' || lower(description) || ' ' || lower(title)
          || ' ' || 'i. general') AS c
  FROM issues),
scored AS (SELECT doc_id, k, category, c, {', '.join(score_cols)} FROM txt),
ranked AS (SELECT *, {best} AS b FROM scored)
SELECT doc_id, k AS line_key,
  CASE {best_case} ELSE 'general' END AS trade,
  CASE WHEN b > 0 THEN least(0.95, 0.5 + b / 10.0) ELSE 0.3 END AS confidence
FROM ranked
"""


# ---------------------------------------------------------------------------
# C18 — rule-based cost estimation
# ---------------------------------------------------------------------------

def q_cost_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C18 (rule_based_cost_estimator.py:90-300) via the real code."""
    df = derived_issues(spark, sf_dir).select("doc_id", "k", "cost_desc",
                                              "cost_severity")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = [er.estimate_cost({"id": "x", "description": d,
                                     "severity": s})
                   for d, s in zip(pdf["cost_desc"], pdf["cost_severity"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "line_key": pdf["k"],
                "category": [r["category"] for r in res],
                "sub_type": [r["sub_type"] for r in res],
                "confidence_score": [r["confidence_score"] for r in res],
                "estimated_low": [r["estimated_low"] for r in res],
                "estimated_high": [r["estimated_high"] for r in res],
                "needs_review": [r["needs_review"] for r in res]})

    return df.mapInPandas(
        run, "doc_id bigint, line_key bigint, category string, "
             "sub_type string, confidence_score int, estimated_low int, "
             "estimated_high int, needs_review boolean")


def _sql_cost() -> str:
    def any_in(words: tuple[str, ...]) -> str:
        return _like_any("d", list(words))

    ladder = f"""
    CASE
      WHEN {any_in(('roof','shingle','flashing','valley','ridge','soffit','fascia'))} THEN
        CASE WHEN d LIKE '%replace%' OR d LIKE '%replacement%' THEN ['roof','replacement','85']
             WHEN {any_in(('major','extensive','structural'))} THEN ['roof','major','80']
             WHEN {any_in(('leak','damage','missing'))} THEN ['roof','moderate','75']
             ELSE ['roof','minor','70'] END
      WHEN {any_in(('electrical','outlet','switch','wiring','panel','breaker','gfci','circuit'))} THEN
        CASE WHEN d LIKE '%panel%' OR d LIKE '%upgrade%' THEN ['electrical','panel','80']
             WHEN {any_in(('rewire','re-wire','wiring'))} THEN ['electrical','rewire','75']
             WHEN d LIKE '%circuit%' OR d LIKE '%breaker%' THEN ['electrical','circuit','80']
             ELSE ['electrical','outlet','75'] END
      WHEN {any_in(('plumb','pipe','leak','drain','water','sewer','faucet','toilet','sink'))} THEN
        CASE WHEN {any_in(('sewer','main','repipe','re-pipe'))} THEN ['plumbing','major','70']
             WHEN {any_in(('extensive','multiple','throughout'))} THEN ['plumbing','moderate','75']
             ELSE ['plumbing','minor','80'] END
      WHEN {any_in(('hvac','heating','cooling','ac','furnace','air condition','compressor'))} THEN
        CASE WHEN d LIKE '%replace%' OR d LIKE '%replacement%' THEN ['hvac','replacement','80']
             WHEN {any_in(('compressor','coil','fan motor'))} THEN ['hvac','component','75']
             ELSE ['hvac','service','80'] END
      WHEN {any_in(('foundation','slab','pier','settling','structural crack'))} THEN
        CASE WHEN {any_in(('major','extensive','structural'))} THEN ['foundation','major','70']
             WHEN {any_in(('pier','leveling','settlement'))} THEN ['foundation','moderate','75']
             ELSE ['foundation','minor','70'] END
      WHEN {any_in(('structural','beam','joist','support','load-bearing'))} THEN
        CASE WHEN d LIKE '%major%' OR d LIKE '%extensive%' THEN ['structural','major','70']
             WHEN d LIKE '%moderate%' THEN ['structural','moderate','75']
             ELSE ['structural','minor','75'] END
      WHEN {any_in(('siding','exterior','trim','paint','stucco','brick'))} THEN
        CASE WHEN d LIKE '%siding%' AND d LIKE '%replace%' THEN ['exterior','siding','75']
             WHEN d LIKE '%paint%' THEN ['exterior','paint','80']
             ELSE ['exterior','minor','75'] END
      WHEN {any_in(('window','door','glass','frame','seal'))} THEN
        CASE WHEN d LIKE '%replace%' OR d LIKE '%replacement%' THEN
               CASE WHEN d LIKE '%multiple%' OR d LIKE '%all%' THEN ['windows','multiple','75']
                    ELSE ['windows','replacement','80'] END
             ELSE ['windows','repair','80'] END
      WHEN {any_in(('paint','drywall','wall','ceiling','cosmetic'))} THEN
        CASE WHEN d LIKE '%drywall%' THEN ['interior','drywall','80']
             ELSE ['interior','cosmetic','75'] END
      WHEN {any_in(('floor','carpet','tile','hardwood','laminate'))} THEN ['interior','flooring','75']
      WHEN s IN ('critical','major','high') THEN ['misc','major','50']
      WHEN s IN ('moderate','medium') THEN ['misc','moderate','50']
      ELSE ['misc','minor','50']
    END"""

    base_cases = " ".join(
        f"WHEN category = '{cat}' AND sub_type = '{sub}' THEN [{low}, {high}]"
        for cat, subs in rules.COST_DATABASE.items()
        for sub, (low, high, _r) in subs.items())
    return f"""
WITH {SQL_ISSUES_CTE},
txt AS (SELECT doc_id, k, lower(cost_desc) AS d,
               lower(cost_severity) AS s FROM issues),
classified AS (
  SELECT doc_id, k, s, {ladder} AS cls FROM txt),
named AS (
  SELECT doc_id, k, s, cls[1] AS category, cls[2] AS sub_type,
         CAST(cls[3] AS INT) AS confidence_score
  FROM classified),
based AS (
  SELECT *, CASE {base_cases} END AS lh FROM named),
adjusted AS (
  SELECT doc_id, k, category, sub_type, confidence_score,
    CASE WHEN s IN ('critical','major') THEN lh[1] * 1.3
         WHEN s IN ('moderate','medium') THEN lh[1] * 1.0
         ELSE lh[1] * 0.8 END AS low,
    CASE WHEN s IN ('critical','major') THEN lh[2] * 1.5
         WHEN s IN ('moderate','medium') THEN lh[2] * 1.2
         ELSE lh[2] * 1.0 END AS high
  FROM based)
SELECT doc_id, k AS line_key, category, sub_type, confidence_score,
  CAST(floor(low) AS INT) AS estimated_low,
  CAST(floor(high) AS INT) AS estimated_high,
  confidence_score < 70 AS needs_review
FROM adjusted
"""


# ---------------------------------------------------------------------------
# J4 — issue grouping (per-document)
# ---------------------------------------------------------------------------

def q_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 (issue_grouper.py:21-120) via the real per-doc grouping code."""
    df = derived_issues(spark, sf_dir).select(
        "doc_id", "k", "category", "trade", "work_type")

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("k")
        issues = [{"id": str(k), "standard_category": c,
                   "classification": {"trade": t, "work_type": w},
                   "extracted_attributes": {}}
                  for k, c, t, w in zip(pdf["k"], pdf["category"],
                                        pdf["trade"], pdf["work_type"])]
        issues, groups = er.group_issues(issues)
        return pd.DataFrame({
            "doc_id": pdf["doc_id"].values, "line_key": pdf["k"].values,
            "is_grouped": [i["is_grouped"] for i in issues],
            "n_groups": [len(i["grouped_with"]) for i in issues]})

    return df.groupBy("doc_id").applyInPandas(
        per_doc, "doc_id bigint, line_key bigint, is_grouped boolean, "
                 "n_groups int")


SQL_GROUPING = f"""
WITH {SQL_ISSUES_CTE},
keys AS (
  SELECT doc_id, k, 'cat_' || category || '_' || work_type AS gkey FROM issues
  UNION ALL
  SELECT doc_id, k, 'trade_' || trade || '_' || work_type AS gkey FROM issues),
sized AS (
  SELECT doc_id, k, gkey,
         count(*) OVER (PARTITION BY doc_id, gkey) AS n
  FROM keys)
SELECT doc_id, k AS line_key,
  bool_or(n >= 2) AS is_grouped,
  CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS INT) AS n_groups
FROM sized GROUP BY doc_id, k
"""


def q_topn_urgency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — top-N priority view (enrich_data.py:107-132): global sort by
    urgency desc with deterministic tie-break, take N."""
    scored = q_urgency(spark, sf_dir)
    return (scored.orderBy(F.desc("urgency"), "line_key").limit(50))


def _sql_topn() -> str:
    inner = _sql_urgency().strip()
    return f"SELECT * FROM ({inner}) ORDER BY urgency DESC, line_key LIMIT 50"


def q_group_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — economies-of-scale discount schedule
    (issue_grouper.py:122-166) via the real enrich_rules code."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    df = o.select(F.col("o_orderkey").alias("k"),
                  (F.pmod(F.col("o_orderkey"), F.lit(8)) + 1)
                  .cast("int").alias("group_size"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            adj = [er.group_cost_adjustment(int(n))
                   for n in pdf["group_size"]]
            yield pd.DataFrame({
                "line_key": pdf["k"], "group_size": pdf["group_size"],
                "total_cost": [a["total_cost"] for a in adj],
                "savings": [a["savings"] for a in adj]})

    return df.mapInPandas(
        run, "line_key bigint, group_size int, total_cost double, "
             "savings double")


# schedule [1.0, 0.7, 0.6, 0.6, ...]: total(n) = 1000*(1 + 0.7 + 0.6*(n-2))
SQL_GROUP_DISCOUNT = """
WITH g AS (
  SELECT o_orderkey AS line_key,
         CAST(o_orderkey % 8 + 1 AS INT) AS group_size
  FROM orders),
c AS (
  SELECT *, CASE WHEN group_size <= 1 THEN 1000.0
                 WHEN group_size = 2 THEN 1000.0 * (1 + 0.7)
                 ELSE 1000.0 * (1 + 0.7) + 1000.0 * 0.6 * (group_size - 2)
            END AS raw_total
  FROM g)
SELECT line_key, group_size, round(raw_total, 2) AS total_cost,
  CASE WHEN group_size <= 1 THEN 0.0
       ELSE round(1000.0 * group_size - raw_total, 2) END AS savings
FROM c
"""


QUERIES_ENRICH: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "severity_normalize": q_severity,
    "action_normalize": q_action,
    "urgency_score": q_urgency,
    "trade_classify": q_trade,
    "cost_estimate": q_cost_estimate,
    "issue_grouping": q_grouping,
    "topn_urgency": q_topn_urgency,
    "group_discount": q_group_discount,
}

ORACLES_ENRICH: dict[str, str] = {
    "severity_normalize": _sql_severity(),
    "action_normalize": _sql_action(),
    "urgency_score": _sql_urgency(),
    "trade_classify": _sql_trade(),
    "cost_estimate": _sql_cost(),
    "issue_grouping": SQL_GROUPING,
    "topn_urgency": _sql_topn(),
    "group_discount": SQL_GROUP_DISCOUNT,
}
