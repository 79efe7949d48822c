"""Catalyst column-expression forms of the enrichment operators — the
JVM stage of the hybrid enrichment plan (plans/enrichment_hybrid.py).

Each builder mirrors the corresponding python rule function in
enrich_rules.py exactly (the per-batch twin used by the mapInPandas plan
and by the DuckDB gate oracles); tests/test_enrich_columns.py proves the
equivalence row-by-row. Everything here is pure ``pyspark.sql.functions``
— whole-stage codegen, no python in the hot path:

- C7  severity_cols        (severity_normalizer.py:59-180)
- C8  action_cols          (action_normalizer.py:116-217)
- C9  attribute_cols       (attribute_extractor.py:81-213)
- C10 urgency_col          (metadata_enricher.py:67-117)
- C11 complexity_factor_col(metadata_enricher.py:119-171)
- C12 specialized_col      (metadata_enricher.py:173-208)
- C13 affected_area_cols   (metadata_enricher.py:210-266)
- C14 trade_cols           (issue_classifier.py:91-138)
- C15 work_type_cols       (issue_classifier.py:140-182)
- C16 complexity_tier_cols (issue_classifier.py:184-221)
- C17/J5 strategy_cols     (cost_strategy_assigner.py:73-161)
- C18 cost_estimate_cols   (rule_based_cost_estimator.py:90-300)

The only rule tiers that stay python-side (stage A of the hybrid plan)
are the ones built on difflib or per-doc sequential state: T5 dedup,
C7's fuzzy severity-text tier (handled here as a precomputed
label-vocabulary map — exact for the pipeline's closed label set), the
taxonomy fuzzy tier (J2), and F7's quality gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import rules
from . import enrich_rules as er


def _contains_any(c: Column, words: list[str]) -> Column:
    out = F.lit(False)
    for w in words:
        out = out | c.contains(w)
    return out


def _first_match(c: Column, arms: list[tuple[Column, Column]],
                 default: Column) -> Column:
    expr = None
    for cond, val in arms:
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    return expr.otherwise(default) if expr is not None else default


# ---------------------------------------------------------------------------
# C7 — severity normalization
# ---------------------------------------------------------------------------

DEFAULT_SEVERITY_VOCAB = ("", "critical", "high", "medium", "low", "info",
                          "unknown", "minor", "major", "moderate", "severe",
                          "significant", "cosmetic")


def severity_base_col(sev_text: Column, status: Column,
                      vocab: tuple[str, ...] = DEFAULT_SEVERITY_VOCAB,
                      ) -> Column:
    """Pre-boost severity struct<s,c>. The free-text match tier (exact /
    containment / difflib) is precomputed over ``vocab`` via the real
    python function — exact for any pipeline whose severity labels come
    from that closed set (the extraction output's do). Materialize this
    as a column before applying severity_boost_cols so the CASE tree is
    referenced by attribute, not copied."""
    matches = {v: er._match_severity_text(v) for v in vocab}

    def text_sev(v: str) -> str:
        return matches[v][0]

    def text_conf(v: str) -> float:
        return matches[v][1]

    status_sev = _first_match(
        status,
        [(status == s, F.lit(v))
         for s, v in rules.STATUS_TO_SEVERITY.items()],
        F.lit(None).cast("string"))
    has_status = status_sev.isNotNull()

    # status tier: base=status map, conf 0.7; text agreement boosts, a
    # confident disagreement overrides
    st_arms = []
    for v in vocab:
        ts, tc = text_sev(v), text_conf(v)
        agree_conf = min(0.95, 0.7 + tc * 0.3)
        st_arms.append((
            sev_text == v,
            F.when(F.lit(ts) == status_sev,
                   F.struct(status_sev.alias("s"),
                            F.lit(agree_conf).alias("c")))
            .when(F.lit(bool(ts)) & F.lit(tc > 0.8),
                  F.struct(F.lit(ts).alias("s"), F.lit(tc).alias("c")))
            .otherwise(F.struct(status_sev.alias("s"),
                                F.lit(0.7).alias("c")))))
    status_res = _first_match(
        sev_text, st_arms,
        F.struct(status_sev.alias("s"), F.lit(0.7).alias("c")))

    # text-only tier
    txt_arms = [(sev_text == v,
                 F.struct(F.lit(text_sev(v)).alias("s"),
                          F.lit(text_conf(v)).alias("c")))
                for v in vocab]
    text_res = _first_match(
        sev_text, txt_arms,
        F.struct(F.lit("unknown").alias("s"), F.lit(0.0).alias("c")))

    return F.when(F.length(sev_text) == 0,
                  F.when(has_status, status_res)
                  .otherwise(F.struct(F.lit("unknown").alias("s"),
                                      F.lit(0.0).alias("c")))) \
        .otherwise(F.when(has_status, status_res).otherwise(text_res))


def severity_boost_cols(base: Column, sev_text: Column, status: Column,
                        desc_lower: Column) -> tuple[Column, Column]:
    """(standard_severity, severity_confidence): the context-boost tier
    applied to a materialized severity_base_col struct."""
    has_status = _first_match(
        status,
        [(status == s, F.lit(v))
         for s, v in rules.STATUS_TO_SEVERITY.items()],
        F.lit(None).cast("string")).isNotNull()
    crit = _contains_any(desc_lower, rules.SEVERITY_BOOSTERS["critical"])
    high = _contains_any(desc_lower, rules.SEVERITY_BOOSTERS["high"])
    s0, c0 = base["s"], base["c"]
    has_any = (F.length(sev_text) > 0) | has_status
    sev = F.when(~has_any, F.lit("unknown")) \
        .when(crit & s0.isin("low", "medium"), F.lit("high")) \
        .when(crit & (s0 == "high") & desc_lower.contains("safety"),
              F.lit("critical")) \
        .when(high & (s0 == "low"), F.lit("medium")) \
        .otherwise(s0)
    conf = F.when(~has_any, F.lit(0.0)) \
        .when(crit & s0.isin("low", "medium"),
              F.least(F.lit(0.9), c0 + 0.1)) \
        .when(crit & (s0 == "high") & desc_lower.contains("safety"),
              F.least(F.lit(0.95), c0 + 0.1)) \
        .when(high & (s0 == "low"), F.least(F.lit(0.85), c0 + 0.1)) \
        .otherwise(c0)
    return sev, conf


# ---------------------------------------------------------------------------
# C8 — action normalization
# ---------------------------------------------------------------------------

def action_cols(text_lower: Column,
                severity: Column) -> tuple[Column, Column, Column]:
    """(standard_action, action_confidence, action_priority) from the
    combined action+description text (already lowercased)."""
    scores = {}
    for action, cfg in rules.ACTION_TAXONOMY.items():
        s = F.lit(0.0)
        for kw in cfg["keywords"]:
            conf = min(0.95, 0.6 + len(kw.split()) * 0.1)
            s = F.greatest(s, F.when(text_lower.contains(kw), F.lit(conf))
                           .otherwise(F.lit(0.0)))
        scores[action] = s
    best = F.greatest(*scores.values())
    kw_action = _first_match(
        text_lower,
        [((scores[a] == best) & (scores[a] > 0.0), F.lit(a))
         for a in rules.ACTION_TAXONOMY],
        F.lit("unknown"))
    pat_action = _first_match(
        text_lower,
        [(_pat_any(text_lower, cfg["patterns"]), F.lit(a))
         for a, cfg in rules.ACTION_TAXONOMY.items()],
        F.lit(None).cast("string"))
    a2 = F.when((best < 0.7) & pat_action.isNotNull(), pat_action) \
        .otherwise(kw_action)
    c2 = F.when((best < 0.7) & pat_action.isNotNull(), F.lit(0.85)) \
        .otherwise(best)
    demote = severity.isin("critical", "high") \
        & a2.isin("monitoring", "maintenance", "no_action")
    promote = (severity == "low") & (a2 == "immediate_repair")
    action = F.when(demote, F.lit("immediate_repair")) \
        .when(promote, F.lit("maintenance")).otherwise(a2)
    conf = F.when(demote, F.least(F.lit(0.85), c2 + 0.1)) \
        .when(promote, F.least(F.lit(0.8), c2 + 0.1)).otherwise(c2)
    prio = _first_match(
        action,
        [(action == a, F.lit(p))
         for a, p in rules.ACTION_PRIORITY.items()],
        F.lit(0))
    return action, conf, prio


def _pat_any(c: Column, patterns: list[str]) -> Column:
    out = F.lit(False)
    for p in patterns:
        out = out | c.rlike(rules.jre("(?i)" + p))
    return out


# ---------------------------------------------------------------------------
# C9 — attribute extraction
# ---------------------------------------------------------------------------

# RE2/Java-safe equivalents of ATTR_MEASUREMENT_PATTERNS
_P_DIM = (r"(\d+(?:\.\d+)?)\s*[xX×]\s*(\d+(?:\.\d+)?)"
          r"\s*(?:feet|foot|ft|'|inches|inch|in|\x22)?")
_P_LEN = r"(\d+(?:\.\d+)?)\s*(?:feet|foot|ft|'|inches|inch|in|\x22)"
_P_SQ1 = r"(\d+(?:,\d{3})*(?:\.\d+)?)\s*(?:sq\.?\s*ft|square\s+feet|square\s+foot)"
_P_PCT = r"(\d+(?:\.\d+)?)\s*(?:%|percent)"
_P_AREA = r"(\d+(?:,\d{3})*(?:\.\d+)?)\s*(?:sq\.?\s*ft|square\s+feet)"


def attribute_cols(text_lower: Column) -> dict[str, Column]:
    """All C9 outputs from the lowered title+description text."""
    loc_all = [p for pats in rules.LOCATION_TERMS.values() for p in pats]
    locations = F.filter(
        F.array(*[F.when(text_lower.contains(p), F.lit(p)) for p in loc_all]),
        lambda x: x.isNotNull())
    materials = F.filter(
        F.array(*[F.when(_contains_any(text_lower, kws), F.lit(m))
                  for m, kws in rules.MATERIALS.items()]),
        lambda x: x.isNotNull())
    damage = F.filter(
        F.array(*[F.when(_contains_any(text_lower, kws), F.lit(d))
                  for d, kws in rules.DAMAGE_TYPES.items()]),
        lambda x: x.isNotNull())
    safety = _contains_any(text_lower, rules.SAFETY_KEYWORDS)
    accessibility = _first_match(
        text_lower,
        [(_contains_any(text_lower, pats), F.lit(a))
         for a, pats in rules.ACCESSIBILITY_PATTERNS.items()],
        F.lit(None).cast("string"))
    d1 = F.regexp_extract_all(text_lower, F.lit(rules.jre(_P_DIM)), F.lit(1))
    d2 = F.regexp_extract_all(text_lower, F.lit(rules.jre(_P_DIM)), F.lit(2))
    dims = F.zip_with(d1, d2, lambda a, b: F.concat(a, F.lit("x"), b))
    lengths = F.concat(
        F.regexp_extract_all(text_lower, F.lit(rules.jre(_P_LEN)), F.lit(1)),
        F.regexp_extract_all(text_lower, F.lit(rules.jre(_P_SQ1)), F.lit(1)),
        F.regexp_extract_all(text_lower, F.lit(rules.jre(_P_PCT)), F.lit(1)))
    areas = F.transform(
        F.regexp_extract_all(text_lower, F.lit(rules.jre(_P_AREA)), F.lit(1)),
        lambda x: F.concat(x, F.lit(" sq ft")))
    return {"locations": locations, "materials": materials,
            "damage_types": damage, "safety_related": safety,
            "accessibility": accessibility, "dimensions": dims,
            "lengths": lengths, "areas": areas}


# ---------------------------------------------------------------------------
# C10 — urgency score
# ---------------------------------------------------------------------------

def urgency_col(severity: Column, action_lower: Column, safety: Column,
                damage_types: Column, desc_lower: Column) -> Column:
    sev_pts = _first_match(
        severity,
        [(severity == s, F.lit(v))
         for s, v in rules.URGENCY_SEVERITY_SCORES.items()],
        F.lit(0.0))
    act_pts = F.when(action_lower.contains("immediate"), 3.0) \
        .when(action_lower.contains("replacement")
              | action_lower.contains("replace"), 2.0) \
        .when(action_lower.contains("repair"), 1.5) \
        .when(action_lower.contains("inspect")
              | action_lower.contains("evaluat"), 1.0) \
        .when(action_lower.contains("monitor"), 0.5).otherwise(0.0)
    score = (F.lit(5.0) + sev_pts + act_pts
             + F.when(safety, 3.0).otherwise(0.0)
             + F.when(F.array_contains(damage_types, "water_damage")
                      | desc_lower.contains("leak"), 1.0).otherwise(0.0)
             + F.when(F.array_contains(damage_types, "mold"), 1.5)
             .otherwise(0.0))
    return F.round(F.least(F.lit(10.0), score), 2)


# ---------------------------------------------------------------------------
# C11 / C12 / C13 — contextual metadata
# ---------------------------------------------------------------------------

def specialized_col(category: Column, desc_lower: Column,
                    action: Column) -> Column:
    return (category.isin(*sorted(rules.SPECIALIZED_CATEGORIES))
            | _contains_any(desc_lower, rules.SPECIALIZED_KEYWORDS)
            | (action == "further_inspection"))


def complexity_factor_col(category: Column, accessibility: Column,
                          locations: Column, damage_types: Column,
                          specialized: Column | None = None) -> Column:
    """C11. The pipeline quirk: complexity_factor runs BEFORE
    requires_specialized_labor is stored, so the +1.5 never applies there
    — pass specialized=None to reproduce that; pass the C12 column for
    the standalone-operator semantics."""
    cat_pts = _first_match(
        category,
        [(category == c, F.lit(v))
         for c, v in rules.CATEGORY_COMPLEXITY.items()],
        F.lit(0.0))
    acc_pts = _first_match(
        accessibility,
        [(accessibility == a, F.lit(v))
         for a, v in rules.ACCESSIBILITY_COMPLEXITY.items()],
        F.lit(0.0))
    score = (F.lit(5.0) + cat_pts + acc_pts
             + (F.when(specialized, 1.5).otherwise(0.0)
                if specialized is not None else F.lit(0.0))
             + F.when(F.size(locations) > 2, 1.0).otherwise(0.0)
             + F.when(F.size(damage_types) > 2, 1.0).otherwise(0.0))
    return F.round(F.least(F.lit(10.0), score), 2)


def affected_area_cols(areas: Column,
                       dims: Column) -> tuple[Column, Column, Column]:
    """C13: (square_feet, dimensions, size_category)."""
    area_sqft = F.regexp_replace(
        F.split(F.element_at(areas, 1), " ")[0], ",", "").cast("double")
    dim0 = F.element_at(dims, 1)
    parts = F.split(dim0, "x")
    dim_sqft = F.when(F.size(parts) == 2,
                      parts[0].cast("double") * parts[1].cast("double"))
    sqft = F.when(F.size(areas) > 0, area_sqft) \
        .when(F.size(dims) > 0, dim_sqft)
    dimensions = F.when(F.size(areas) > 0, F.lit(None).cast("string")) \
        .when(F.size(dims) > 0, F.when(dim_sqft.isNotNull(), dim0))
    size = F.when(sqft.isNull(), F.lit(None).cast("string"))
    for bound, label in rules.SIZE_BUCKETS:
        size = size.when(sqft < bound, F.lit(label))
    size = size.otherwise(F.lit("very_large"))
    return sqft, dimensions, size


# ---------------------------------------------------------------------------
# C14 / C15 / C16 — classification
# ---------------------------------------------------------------------------

def trade_cols(category: Column,
               combined_lower: Column) -> tuple[Column, Column]:
    """C14: combined = '{category} {description} {title} {section}'
    lowered; category scored separately at 5 points per match."""
    scores = {}
    cat_l = F.lower(category)
    for trade, cfg in rules.TRADE_CLASSIFICATION.items():
        s = F.lit(0)
        for kw in cfg["keywords"]:
            s = s + F.when(combined_lower.contains(kw), 1).otherwise(0)
        for c in cfg["categories"]:
            s = s + F.when(cat_l.contains(c.lower()), 5).otherwise(0)
        scores[trade] = s
    best = F.greatest(*scores.values())
    trade = _first_match(
        category,
        [((scores[t] == best) & (scores[t] > 0), F.lit(t))
         for t in rules.TRADE_CLASSIFICATION],
        F.lit("general"))
    conf = F.when(best > 0, F.least(F.lit(0.95), 0.5 + best / 10)) \
        .otherwise(F.lit(0.3))
    return trade, conf


def work_type_cols(action: Column,
                   combined_lower: Column) -> tuple[Column, Column]:
    """C15: combined = '{action} {description}' lowered."""
    mapped = _first_match(
        action,
        [(action == a, F.lit(w))
         for a, w in rules.ACTION_TO_WORK_TYPE.items()],
        F.lit(None).cast("string"))
    scores = {}
    for work, kws in rules.WORK_TYPE_KEYWORDS.items():
        s = F.lit(0)
        for kw in kws:
            s = s + F.when(combined_lower.contains(kw), 1).otherwise(0)
        scores[work] = s
    best = F.greatest(*scores.values())
    kw_work = _first_match(
        action,
        [((scores[w] == best) & (scores[w] > 0), F.lit(w))
         for w in rules.WORK_TYPE_KEYWORDS],
        F.lit("repair"))
    work = F.when(mapped.isNotNull(), mapped).otherwise(kw_work)
    conf = F.when(mapped.isNotNull(), F.lit(0.9)) \
        .when(best > 0, F.least(F.lit(0.85), 0.6 + best / 5)) \
        .otherwise(F.lit(0.5))
    return work, conf


def complexity_tier_cols(desc_lower: Column,
                         factor: Column) -> tuple[Column, Column]:
    """C16: base tier from the complexity factor, then the
    simple/moderate/complex indicator passes mutate (tier, conf) in dict
    order."""
    cx = F.when(factor >= 7, F.lit("complex")) \
        .when(factor >= 4, F.lit("moderate")).otherwise(F.lit("simple"))
    cf = F.when(factor >= 7, F.lit(0.8)) \
        .when(factor >= 4, F.lit(0.75)).otherwise(F.lit(0.7))
    for tier, indicators in rules.COMPLEXITY_INDICATORS.items():
        hit = _contains_any(desc_lower, indicators)
        new_cx = F.when(hit & (cx == tier), cx) \
            .when(hit & (cf < 0.8), F.lit(tier)).otherwise(cx)
        new_cf = F.when(hit & (cx == tier),
                        F.least(F.lit(0.95), cf + 0.1)) \
            .when(hit & (cf < 0.8), F.lit(0.8)).otherwise(cf)
        cx, cf = new_cx, new_cf
    return cx, cf


# ---------------------------------------------------------------------------
# C17 + J5 — cost strategy
# ---------------------------------------------------------------------------

def strategy_cols(work: Column, complexity: Column, category: Column,
                  trade: Column, description: Column,
                  has_measurements: Column, specialist: Column,
                  ) -> tuple[Column, Column, Column]:
    """(cost_strategy, strategy_confidence, matched_standard_item)."""
    search = F.lower(F.concat_ws(" ", trade, category, description))
    match_arms = []
    for key in rules.STANDARD_REPLACEMENTS:
        cond = F.lit(True)
        for part in key.split("_"):
            cond = cond & search.contains(part)
        match_arms.append((cond, F.lit(key)))
    std_key = _first_match(search, match_arms, F.lit(""))
    simple_mod = complexity.isin("simple", "moderate")
    lookup = (work == "replacement") & simple_mod & (std_key != "")
    strategy = F.when(lookup, F.lit("lookup_table")) \
        .when(complexity == "complex", F.lit("llm_reasoning")) \
        .when(F.length(description) > 200, F.lit("llm_reasoning")) \
        .when(specialist | (work == "inspection"), F.lit("llm_reasoning")) \
        .when(has_measurements & (category != "Unknown") & simple_mod,
              F.lit("ml_model")) \
        .otherwise(F.lit("llm_reasoning"))
    conf = F.when(lookup, F.lit(0.9)) \
        .when(complexity == "complex", F.lit(0.85)) \
        .when(F.length(description) > 200, F.lit(0.8)) \
        .when(specialist | (work == "inspection"), F.lit(0.85)) \
        .when(has_measurements & (category != "Unknown") & simple_mod,
              F.lit(0.75)) \
        .otherwise(F.lit(0.7))
    matched = F.when((work == "replacement") & simple_mod, std_key) \
        .otherwise(F.lit(""))
    return strategy, conf, matched


# ---------------------------------------------------------------------------
# C18 — rule-based cost estimation
# ---------------------------------------------------------------------------

def _cat_ladder(d: Column, loc: Column, sev_l: Column) -> Column:
    """classify_cost_category as a struct<cat,sub,conf> first-match
    cascade (rule_based_cost_estimator.py:152-267)."""
    def any_in(words: tuple[str, ...]) -> Column:
        return _contains_any(d, list(words)) | _contains_any(loc, list(words))

    def res(cat: str, sub: str, conf: int) -> Column:
        return F.struct(F.lit(cat).alias("cat"), F.lit(sub).alias("sub"),
                        F.lit(conf).alias("conf"))

    repl = d.contains("replace") | d.contains("replacement")
    return (
        F.when(any_in(("roof", "shingle", "flashing", "valley", "ridge",
                       "soffit", "fascia")),
               F.when(repl, res("roof", "replacement", 85))
               .when(_contains_any(d, ["major", "extensive", "structural"]),
                     res("roof", "major", 80))
               .when(_contains_any(d, ["leak", "damage", "missing"]),
                     res("roof", "moderate", 75))
               .otherwise(res("roof", "minor", 70)))
        .when(any_in(("electrical", "outlet", "switch", "wiring", "panel",
                      "breaker", "gfci", "circuit")),
              F.when(d.contains("panel") | d.contains("upgrade"),
                     res("electrical", "panel", 80))
              .when(_contains_any(d, ["rewire", "re-wire", "wiring"]),
                    res("electrical", "rewire", 75))
              .when(d.contains("circuit") | d.contains("breaker"),
                    res("electrical", "circuit", 80))
              .otherwise(res("electrical", "outlet", 75)))
        .when(any_in(("plumb", "pipe", "leak", "drain", "water", "sewer",
                      "faucet", "toilet", "sink")),
              F.when(_contains_any(d, ["sewer", "main", "repipe", "re-pipe"]),
                     res("plumbing", "major", 70))
              .when(_contains_any(d, ["extensive", "multiple", "throughout"]),
                    res("plumbing", "moderate", 75))
              .otherwise(res("plumbing", "minor", 80)))
        .when(any_in(("hvac", "heating", "cooling", "ac", "furnace",
                      "air condition", "compressor")),
              F.when(repl, res("hvac", "replacement", 80))
              .when(_contains_any(d, ["compressor", "coil", "fan motor"]),
                    res("hvac", "component", 75))
              .otherwise(res("hvac", "service", 80)))
        .when(any_in(("foundation", "slab", "pier", "settling",
                      "structural crack")),
              F.when(_contains_any(d, ["major", "extensive", "structural"]),
                     res("foundation", "major", 70))
              .when(_contains_any(d, ["pier", "leveling", "settlement"]),
                    res("foundation", "moderate", 75))
              .otherwise(res("foundation", "minor", 70)))
        .when(any_in(("structural", "beam", "joist", "support",
                      "load-bearing")),
              F.when(d.contains("major") | d.contains("extensive"),
                     res("structural", "major", 70))
              .when(d.contains("moderate"), res("structural", "moderate", 75))
              .otherwise(res("structural", "minor", 75)))
        .when(any_in(("siding", "exterior", "trim", "paint", "stucco",
                      "brick")),
              F.when(d.contains("siding") & d.contains("replace"),
                     res("exterior", "siding", 75))
              .when(d.contains("paint"), res("exterior", "paint", 80))
              .otherwise(res("exterior", "minor", 75)))
        .when(any_in(("window", "door", "glass", "frame", "seal")),
              F.when(repl,
                     F.when(d.contains("multiple") | d.contains("all"),
                            res("windows", "multiple", 75))
                     .otherwise(res("windows", "replacement", 80)))
              .otherwise(res("windows", "repair", 80)))
        .when(any_in(("paint", "drywall", "wall", "ceiling", "cosmetic")),
              F.when(d.contains("drywall"), res("interior", "drywall", 80))
              .otherwise(res("interior", "cosmetic", 75)))
        .when(any_in(("floor", "carpet", "tile", "hardwood", "laminate")),
              res("interior", "flooring", 75))
        .otherwise(
            F.when(sev_l.isin("critical", "major", "high"),
                   res("misc", "major", 50))
            .when(sev_l.isin("moderate", "medium"),
                  res("misc", "moderate", 50))
            .otherwise(res("misc", "minor", 50))))


def with_cost_estimate(df, desc_lower: Column, severity_lower: Column,
                       location_lower: Column):
    """C18: category ladder -> cost DB -> severity multipliers -> risks.
    Operates on a DataFrame (not bare columns): the ladder and base-cost
    structs are materialized as intermediate projections so their huge
    CASE trees are referenced by attribute instead of being copied into
    every downstream expression (Catalyst analysis stays linear)."""
    df = df.withColumn("_ladder",
                       _cat_ladder(desc_lower, location_lower,
                                   severity_lower))
    cat, sub = F.col("_ladder.cat"), F.col("_ladder.sub")
    base = None
    for c, subs in rules.COST_DATABASE.items():
        for s, (lo, hi, reason) in subs.items():
            cond = (cat == c) & (sub == s)
            v = F.struct(F.lit(float(lo)).alias("lo"),
                         F.lit(float(hi)).alias("hi"),
                         F.lit(reason).alias("r"), F.lit(False).alias("fb"))
            base = F.when(cond, v) if base is None else base.when(cond, v)
    fb_lo, fb_hi, fb_r = rules.COST_FALLBACK
    base = base.otherwise(
        F.struct(F.lit(float(fb_lo)).alias("lo"),
                 F.lit(float(fb_hi)).alias("hi"),
                 F.lit(fb_r).alias("r"), F.lit(True).alias("fb")))
    df = df.withColumn("_cost_base", base)
    b = F.col("_cost_base")
    conf = F.when(b["fb"], F.greatest(F.lit(30), F.col("_ladder.conf") - 20)) \
        .otherwise(F.col("_ladder.conf"))
    crit = severity_lower.isin("critical", "major")
    mod = severity_lower.isin("moderate", "medium")
    lo = F.when(crit, b["lo"] * 1.3) \
        .when(mod, b["lo"] * 1.0).otherwise(b["lo"] * 0.8)
    hi = F.when(crit, b["hi"] * 1.5) \
        .when(mod, b["hi"] * 1.2).otherwise(b["hi"] * 1.0)
    risk_arr = F.filter(F.array(
        F.when(severity_lower.isin("critical", "major", "high"),
               F.lit("High priority issue - costs may escalate if delayed")),
        F.when(_contains_any(desc_lower, ["hidden", "unknown",
                                          "investigate"]),
               F.lit("May require additional investigation")),
        F.when(_contains_any(desc_lower, ["structural", "foundation",
                                          "load"]),
               F.lit("May require engineering evaluation")),
        F.when(_contains_any(desc_lower, ["code", "permit", "violation"]),
               F.lit("May require permits and inspections")),
        F.when(_contains_any(desc_lower, ["water", "moisture", "mold"]),
               F.lit("May have related water damage or mold issues")),
    ), lambda x: x.isNotNull())
    risks = F.when(F.size(risk_arr) > 0, risk_arr).otherwise(
        F.array(F.lit("Standard repair with typical scope")))
    df = df.withColumns({
        "est_category": cat, "est_sub_type": sub,
        "estimated_low": F.floor(lo).cast("int"),
        "estimated_high": F.floor(hi).cast("int"),
        "confidence_score": conf.cast("int"),
        "reasoning": b["r"], "risk_factors": risks,
        "needs_review": conf < 70,
    })
    return df.drop("_ladder", "_cost_base")
