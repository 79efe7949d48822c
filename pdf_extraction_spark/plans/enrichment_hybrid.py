"""Hybrid enrichment plan: python only where the semantics demand it,
Catalyst for everything else.

The all-python plan (plans/enrichment.py) runs the whole 6-phase
pipeline per issue inside mapInPandas; profiling shows the sequential /
difflib tiers (T5 dedup, F7 quality, fuzzy taxonomy) dominate while the
pure rule cascades (C7-C18) are ~a quarter of the time yet fully
expressible as column expressions. This plan splits accordingly:

  stage A (mapInPandas, per-doc python, zero shuffle):
      F2 schema validation -> T2-T4 cleaning -> T5 per-doc dedup ->
      F3-F9 quality gate -> J2/J3 taxonomy. Emits ONE FLAT ROW PER KEPT
      ISSUE — the shape a training-data pipeline wants anyway.
  stage B (Catalyst, narrow projection, zero shuffle):
      C7 severity, C8 action, C9 attributes, C10 urgency, C11-C13
      metadata, C14-C16 classification, C17/J5 strategy, C18 cost
      estimate — all whole-stage-codegen column expressions
      (enrich_columns.py).
  stage C (one shuffle on doc_id):
      J4 grouping (explode keys -> count -> rank, window per doc),
      A2/A5 summaries (groupBy doc).

Output parity with the python plan is asserted field-by-field by
tests/test_enrich_hybrid.py. Phase-2 estimation (C19-C21) and J7
relationships remain on the per-doc python path (enrichment.py) — both
are document-local and outside this plan's flat-row product.

At 10^12 documents: stages A+B are a single map pass; stage C shuffles
only the enriched issue rows (narrow columns) once.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import enrich_columns as ec
from .. import enrich_rules as er

FLAT_STAGE_A_SCHEMA = (
    "doc_id string, issue_order int, n_excluded int, id string, "
    "section string, subsection string, status string, priority string, "
    "severity string, suggested_action string, title string, "
    "description string, page_numbers array<int>, "
    "estimated_cost struct<min:double,max:double,average:double>, "
    "is_duplicate boolean, data_quality_score double, "
    "needs_manual_review boolean, review_reason string, "
    "validation_status string, standard_category string, "
    "standard_subcategory string, category_confidence double"
)


def _stage_a(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Phases 1.1-1.3 + taxonomy, per document, emitting flat rows."""
    for pdf in batches:
        rows = []
        for doc_id, issues in zip(pdf["doc_id"], pdf["issues"]):
            issues_py = [dict(i) for i in issues] if issues is not None \
                else []
            validated = [er.validate_schema(i)[0] for i in issues_py]
            tracker = er.DuplicateTracker()
            cleaned = []
            for issue in validated:
                c = er.clean_issue(issue)
                if tracker.is_duplicate(c.get("description", "")):
                    c["is_duplicate"] = True
                cleaned.append(c)
            kept, n_excluded = [], 0
            for issue in cleaned:
                action, score, reason = er.quality_validate(issue)
                if action == er.EXCLUDE:
                    n_excluded += 1
                    continue
                issue["data_quality_score"] = score
                if action == er.FLAG:
                    issue["needs_manual_review"] = True
                    issue["review_reason"] = reason
                kept.append(issue)
            for order, issue in enumerate(kept):
                item = (issue.get("item", "") or issue.get("title", "")
                        or issue.get("subsection", "")
                        or issue.get("section", ""))
                cat, sub, conf = er.taxonomy_from_context(
                    item, issue.get("section", ""),
                    issue.get("description", ""))
                cost = issue.get("estimated_cost")
                if cost is not None and not isinstance(cost, dict):
                    cost = None
                rows.append({
                    "doc_id": doc_id, "issue_order": order,
                    "n_excluded": n_excluded,
                    "id": issue.get("id", ""),
                    "section": issue.get("section", ""),
                    "subsection": issue.get("subsection", ""),
                    "status": issue.get("status", ""),
                    "priority": issue.get("priority", "unknown"),
                    "severity": issue.get("severity", "unknown"),
                    "suggested_action": issue.get("suggested_action", ""),
                    "title": issue.get("title", ""),
                    "description": issue.get("description", ""),
                    "page_numbers": [int(p) for p in
                                     (issue.get("page_numbers") or [])],
                    "estimated_cost": cost,
                    "is_duplicate": bool(issue.get("is_duplicate", False)),
                    "data_quality_score": float(
                        issue.get("data_quality_score", 0.0)),
                    "needs_manual_review": bool(
                        issue.get("needs_manual_review", False)),
                    "review_reason": issue.get("review_reason", ""),
                    "validation_status": issue.get("validation_status",
                                                   "pending"),
                    "standard_category": cat,
                    "standard_subcategory": sub,
                    "category_confidence": float(conf),
                })
        yield pd.DataFrame(rows, columns=[
            "doc_id", "issue_order", "n_excluded", "id", "section",
            "subsection", "status", "priority", "severity",
            "suggested_action", "title", "description", "page_numbers",
            "estimated_cost", "is_duplicate", "data_quality_score",
            "needs_manual_review", "review_reason", "validation_status",
            "standard_category", "standard_subcategory",
            "category_confidence"])


def _stage_b(flat: DataFrame) -> DataFrame:
    """Phases 2-4 + 6 + C18 as pure column expressions."""
    desc_l = F.lower(F.col("description"))
    # C7: sev_text = severity or priority (severity is schema-defaulted to
    # 'unknown', so it always wins — reference quirk preserved)
    sev_text = F.when(F.length("severity") > 0, F.col("severity")) \
        .otherwise(F.col("priority"))
    flat = flat.withColumn("_sevb",
                           ec.severity_base_col(sev_text, F.col("status")))
    std_sev, sev_conf = ec.severity_boost_cols(
        F.col("_sevb"), sev_text, F.col("status"), desc_l)
    flat = flat.withColumns({"standard_severity": std_sev,
                             "severity_confidence": sev_conf}) \
        .drop("_sevb")
    # C8: text = suggested_action + description, lowered
    act_text = F.lower(F.concat_ws(
        " ", F.when(F.length("suggested_action") > 0,
                    F.col("suggested_action")),
        F.when(F.length("description") > 0, F.col("description"))))
    std_act, act_conf, act_prio = ec.action_cols(
        act_text, F.col("standard_severity"))
    flat = flat.withColumns({"standard_action": std_act,
                             "action_confidence": act_conf,
                             "action_priority": act_prio})
    # C9: title + description, lowered
    attr_text = F.lower(F.concat_ws(
        " ", F.when(F.length("title") > 0, F.col("title")),
        F.when(F.length("description") > 0, F.col("description"))))
    attrs = ec.attribute_cols(attr_text)
    flat = flat.withColumns({
        "attr_locations": attrs["locations"],
        "attr_materials": attrs["materials"],
        "attr_damage_types": attrs["damage_types"],
        "attr_dimensions": attrs["dimensions"],
        "attr_lengths": attrs["lengths"],
        "attr_areas": attrs["areas"],
        "safety_flag": attrs["safety_related"],
        "accessibility_complexity": attrs["accessibility"],
    })
    # C10 urgency (metadata_enricher order: urgency before C11/C12)
    urgency = ec.urgency_col(
        F.lower(F.col("standard_severity")),
        F.lower(F.col("standard_action")),
        F.col("safety_flag"), F.col("attr_damage_types"), desc_l)
    # C11 (pipeline quirk: the specialized +1.5 never applies)
    cx_factor = ec.complexity_factor_col(
        F.col("standard_category"),
        F.coalesce(F.col("accessibility_complexity"), F.lit("")),
        F.col("attr_locations"), F.col("attr_damage_types"),
        specialized=None)
    specialized = ec.specialized_col(
        F.col("standard_category"), desc_l, F.col("standard_action"))
    sqft, dimensions, size_cat = ec.affected_area_cols(
        F.col("attr_areas"), F.col("attr_dimensions"))
    flat = flat.withColumns({
        "urgency_score": urgency, "complexity_factor": cx_factor,
        "requires_specialized_labor": specialized,
        "area_square_feet": sqft, "area_dimensions": dimensions,
        "area_size_category": size_cat,
    })
    # C14-C16
    combined = F.lower(F.concat(
        F.col("standard_category"), F.lit(" "), desc_l, F.lit(" "),
        F.lower(F.col("title")), F.lit(" "), F.lower(F.col("section"))))
    trade, trade_conf = ec.trade_cols(F.col("standard_category"), combined)
    flat = flat.withColumns({"trade": trade, "trade_confidence": trade_conf})
    wt_text = F.lower(F.concat(F.col("standard_action"), F.lit(" "), desc_l))
    work, work_conf = ec.work_type_cols(F.col("standard_action"), wt_text)
    cx_tier, cx_conf = ec.complexity_tier_cols(
        desc_l, F.col("complexity_factor"))
    flat = flat.withColumns({
        "work_type": work, "work_type_confidence": work_conf,
        "complexity": cx_tier, "complexity_confidence": cx_conf,
    })
    # C17 + J5
    has_meas = (F.size("attr_dimensions") + F.size("attr_lengths")
                + F.size("attr_areas")) > 0
    strategy, strat_conf, matched = ec.strategy_cols(
        F.col("work_type"), F.col("complexity"),
        F.col("standard_category"), F.col("trade"),
        F.col("description"), has_meas,
        F.col("requires_specialized_labor"))
    flat = flat.withColumns({
        "cost_strategy": strategy, "strategy_confidence": strat_conf,
        "matched_standard_item": matched,
    })
    # C18 (reference reads the RAW severity field — schema-defaulted)
    return ec.with_cost_estimate(flat, desc_l, F.lower(F.col("severity")),
                                 F.lit(""))


def _stage_c_grouping(flat: DataFrame) -> DataFrame:
    """J4: per-doc grouping keys -> counts -> first-appearance-ranked
    group ids (issue_grouper.py:21-120)."""
    loc_keys = F.transform(
        "attr_locations",
        lambda x: F.concat(F.lit("loc_"), x, F.lit("_"), F.col("trade")))
    fixed = F.array(
        F.concat(F.lit("cat_"), F.col("standard_category"), F.lit("_"),
                 F.col("work_type")),
        F.concat(F.lit("trade_"), F.col("trade"), F.lit("_"),
                 F.col("work_type")))
    keys = F.concat(loc_keys, fixed)
    k = flat.select("doc_id", "issue_order", "id",
                    F.posexplode(keys).alias("slot", "gkey"))
    per_key = (k.groupBy("doc_id", "gkey")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.min(F.struct("issue_order", "slot")).alias("first"),
                    F.array_sort(F.collect_list(
                        F.struct("issue_order", "id"))).alias("members")))
    w = Window.partitionBy("doc_id").orderBy("first")
    groups = (per_key.where(F.col("n") >= 2)
              .withColumn("group_rank", F.row_number().over(w))
              .withColumn("group_id",
                          F.concat(F.lit("group_"),
                                   F.col("group_rank").cast("string"))))
    issue_groups = (groups
                    .select("doc_id", "group_rank", "group_id",
                            F.explode("members").alias("m"))
                    .groupBy("doc_id", F.col("m.issue_order")
                             .alias("issue_order"))
                    .agg(F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("group_rank", "group_id"))),
                        lambda x: x["group_id"]).alias("grouped_with")))
    out = (flat.join(issue_groups, ["doc_id", "issue_order"], "left")
           .withColumn("grouped_with",
                       F.coalesce("grouped_with",
                                  F.array().cast("array<string>")))
           .withColumn("is_grouped", F.size("grouped_with") > 0))
    return out


def group_rows(flat: DataFrame) -> DataFrame:
    """A3: one row per qualifying group (the `groups` output)."""
    loc_keys = F.transform(
        "attr_locations",
        lambda x: F.concat(F.lit("loc_"), x, F.lit("_"), F.col("trade")))
    fixed = F.array(
        F.concat(F.lit("cat_"), F.col("standard_category"), F.lit("_"),
                 F.col("work_type")),
        F.concat(F.lit("trade_"), F.col("trade"), F.lit("_"),
                 F.col("work_type")))
    keys = F.concat(loc_keys, fixed)
    k = flat.select("doc_id", "issue_order", "id",
                    F.posexplode(keys).alias("slot", "gkey"))
    per_key = (k.groupBy("doc_id", "gkey")
               .agg(F.count(F.lit(1)).alias("issue_count"),
                    F.min(F.struct("issue_order", "slot")).alias("first"),
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("issue_order", "id"))),
                        lambda x: x["id"]).alias("issue_ids")))
    w = Window.partitionBy("doc_id").orderBy("first")
    return (per_key.where(F.col("issue_count") >= 2)
            .withColumn("group_id",
                        F.concat(F.lit("group_"),
                                 F.row_number().over(w).cast("string")))
            .withColumn("group_type",
                        F.when(F.col("gkey").startswith("loc_"),
                               "location_trade")
                        .when(F.col("gkey").startswith("cat_"),
                              "category_work")
                        .otherwise("trade_work"))
            .select("doc_id", "group_id", F.col("gkey").alias("grouping_key"),
                    F.col("issue_count").cast("int").alias("issue_count"),
                    "issue_ids", "group_type"))


def doc_summaries(flat: DataFrame) -> DataFrame:
    """A2 + A5 scalars as one groupBy(doc_id) aggregation over the
    enriched flat rows (the per-value count maps are one further
    groupBy(doc_id, value) away — flat rows keep them first-class).

    ``is_grouped`` is produced by stage C, so on
    enrich_extracted_hybrid(..., with_grouping=False) output it is
    absent — treated here as all-False (grouped_issues = 0) rather than
    failing analysis (round-2 ADVICE)."""
    if "is_grouped" not in flat.columns:
        flat = flat.withColumn("is_grouped", F.lit(False))
    agg = flat.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("total_issues"),
        F.sum(F.when(F.col("safety_flag"), 1).otherwise(0))
        .cast("int").alias("safety_issues"),
        F.sum(F.when(F.col("is_grouped"), 1).otherwise(0))
        .cast("int").alias("grouped_issues"),
        F.round(F.avg("urgency_score"), 2).alias("avg_urgency"),
        F.round(F.avg("complexity_factor"), 2).alias("avg_complexity"),
        F.count(F.lit(1)).cast("int").alias("estimated_issues"),
        F.sum("estimated_low").cast("long").alias("total_estimated_low"),
        F.sum("estimated_high").cast("long").alias("total_estimated_high"),
        F.floor(F.sum("confidence_score")
                / F.count(F.lit(1))).cast("int").alias("average_confidence"),
        F.sum(F.when(F.col("needs_review"), 1).otherwise(0))
        .cast("int").alias("needs_review"),
        F.first("n_excluded").alias("n_excluded"))
    return agg


def enrich_extracted_hybrid(extracted: DataFrame,
                            with_grouping: bool = True) -> DataFrame:
    """extracted (plans/fused.py output) -> enriched FLAT issue rows
    (phases 1-6 + C18). The flat shape is the 100 TB product; use
    group_rows/doc_summaries for the A3/A2/A5 roll-ups, or the all-python
    plans/enrichment.py when the nested per-doc document shape (incl.
    phase-2 + J7) is required."""
    docs = extracted.select("doc_id", "issues")
    flat = docs.mapInPandas(_stage_a, schema=FLAT_STAGE_A_SCHEMA)
    flat = _stage_b(flat)
    if with_grouping:
        flat = _stage_c_grouping(flat)
    return flat
