"""Enrichment plan: extraction output -> enriched issues, per document.

The reference enrichment (src/data_enrichment_pipeline.py:55-107) is
document-scoped: the duplicate tracker resets per doc (:131), grouping keys
and group ids are per-report counters (issue_grouper.py:31-33), and every
phase is a per-issue map. Since the extraction output already carries one
row per document with its issues array, the whole 6-phase pipeline + the
deterministic C18 estimator runs as ONE ``mapInPandas`` pass — zero
shuffles, linear scaling, same architecture as plans/fused.py.

Issue counts are ~50/doc (vs hundreds of spans), so per-issue python inside
the Arrow batch is not the hot path; the heavy span-level work already
happened in the fused extraction pass.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .. import enrich_rules as er

_ATTRS_T = ("struct<locations:array<string>,"
            "measurements:struct<dimensions:array<string>,"
            "lengths:array<string>,areas:array<string>>,"
            "materials:array<string>,damage_types:array<string>,"
            "safety_related:boolean,accessibility:string>")
_AREA_T = "struct<square_feet:double,dimensions:string,size_category:string>"
_CLS_T = ("struct<trade:string,trade_confidence:double,work_type:string,"
          "work_type_confidence:double,complexity:string,"
          "complexity_confidence:double>")
_ISSUE_T = (
    "struct<id:string,section:string,subsection:string,status:string,"
    "priority:string,title:string,description:string,"
    "page_numbers:array<int>,"
    "estimated_cost:struct<min:double,max:double,average:double>,"
    "severity:string,validation_status:string,is_duplicate:boolean,"
    "data_quality_score:double,needs_manual_review:boolean,"
    "review_reason:string,"
    "standard_severity:string,severity_confidence:double,"
    "standard_action:string,action_confidence:double,action_priority:int,"
    "standard_category:string,standard_subcategory:string,"
    "category_confidence:double,"
    f"extracted_attributes:{_ATTRS_T},"
    "safety_flag:boolean,accessibility_complexity:string,"
    "urgency_score:double,complexity_factor:double,"
    "requires_specialized_labor:boolean,"
    f"estimated_affected_area:{_AREA_T},"
    f"classification:{_CLS_T},"
    "grouped_with:array<string>,is_grouped:boolean,"
    "cost_strategy:string,strategy_confidence:double,"
    "matched_standard_item:string>"
)
_GROUP_T = ("struct<group_id:string,grouping_key:string,issue_count:int,"
            "issue_ids:array<string>,group_type:string>")
_EST_T = ("struct<issue_id:string,category:string,sub_type:string,"
          "estimated_low:int,estimated_high:int,confidence_score:int,"
          "reasoning:string,risk_factors:array<string>,needs_review:boolean>")
_SUMMARY_T = ("struct<total_issues:int,by_severity:map<string,int>,"
              "by_action:map<string,int>,by_category:map<string,int>,"
              "by_trade:map<string,int>,by_complexity:map<string,int>,"
              "by_strategy:map<string,int>,safety_issues:int,"
              "grouped_issues:int,avg_urgency:double,avg_complexity:double>")
_EST_SUMMARY_T = ("struct<estimated_issues:int,total_estimated_low:long,"
                  "total_estimated_high:long,average_confidence:int,"
                  "needs_review:int>")
_PHASE2_T = ("struct<issue_id:string,strategy:string,"
             "strategy_confidence:double,adjusted_low:double,"
             "adjusted_high:double,permit_type:string,trade:string,"
             "confidence_overall:double,manual_review:boolean>")
_REL_T = ("struct<causal_chains:array<struct<root_cause_id:string,"
          "caused_issue_ids:array<string>,chain_length:int,priority:string>>,"
          "bundles:array<struct<bundle_type:string,key:string,"
          "issue_ids:array<string>,savings_pct:double>>,"
          "isolated_issue_ids:array<string>,"
          "statistics:struct<total_issues:int,issues_in_chains:int,"
          "isolated_issues:int,potential_bundles:int,"
          "average_savings_pct:double,max_savings_pct:double>>")

ENRICHED_SCHEMA = (
    "doc_id string, "
    f"issues array<{_ISSUE_T}>, "
    f"groups array<{_GROUP_T}>, "
    f"estimates array<{_EST_T}>, "
    f"summary {_SUMMARY_T}, "
    f"estimate_summary {_EST_SUMMARY_T}, "
    f"phase2 array<{_PHASE2_T}>, "
    f"relationships {_REL_T}, "
    "n_excluded int"
)

_ISSUE_FIELDS = [
    "id", "section", "subsection", "status", "priority", "title",
    "description", "page_numbers", "estimated_cost", "severity",
    "validation_status", "is_duplicate", "data_quality_score",
    "needs_manual_review", "review_reason", "standard_severity",
    "severity_confidence", "standard_action", "action_confidence",
    "action_priority", "standard_category", "standard_subcategory",
    "category_confidence", "extracted_attributes", "safety_flag",
    "accessibility_complexity", "urgency_score", "complexity_factor",
    "requires_specialized_labor", "estimated_affected_area",
    "classification", "grouped_with", "is_grouped", "cost_strategy",
    "strategy_confidence", "matched_standard_item",
]


def _issue_row(issue: dict) -> dict:
    """Project an enriched issue dict onto the fixed output struct."""
    attrs = issue.get("extracted_attributes") or {}
    meas = attrs.get("measurements") or {}
    out = {k: issue.get(k) for k in _ISSUE_FIELDS}
    out["page_numbers"] = [int(p) for p in (issue.get("page_numbers") or [])]
    out["extracted_attributes"] = {
        "locations": attrs.get("locations") or [],
        "measurements": {
            "dimensions": meas.get("dimensions") or [],
            "lengths": meas.get("lengths") or [],
            "areas": meas.get("areas") or [],
        },
        "materials": attrs.get("materials") or [],
        "damage_types": attrs.get("damage_types") or [],
        "safety_related": bool(attrs.get("safety_related", False)),
        "accessibility": attrs.get("accessibility"),
    }
    out["is_duplicate"] = bool(issue.get("is_duplicate", False))
    out["needs_manual_review"] = bool(issue.get("needs_manual_review", False))
    out["safety_flag"] = bool(issue.get("safety_flag", False))
    out["is_grouped"] = bool(issue.get("is_grouped", False))
    out["requires_specialized_labor"] = bool(
        issue.get("requires_specialized_labor", False))
    area = issue.get("estimated_affected_area")
    if area is not None:
        out["estimated_affected_area"] = {
            "square_feet": float(area["square_feet"])
            if "square_feet" in area else None,
            "dimensions": area.get("dimensions"),
            "size_category": area.get("size_category"),
        }
    cost = issue.get("estimated_cost")
    if cost is not None and not isinstance(cost, dict):
        cost = None
    out["estimated_cost"] = cost
    return out


def enrich_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Run the 6-phase enrichment + C18 estimation for a batch of extracted
    document rows (doc_id, issues, ...)."""
    rows: list[dict[str, Any]] = []
    for doc_id, issues in zip(pdf["doc_id"], pdf["issues"]):
        issues_py = [dict(i) for i in issues] if issues is not None else []
        result = er.enrich_document(issues_py)
        rows.append({
            "doc_id": doc_id,
            "issues": [_issue_row(i) for i in result["issues"]],
            "groups": result["groups"],
            "estimates": result["estimates"],
            "summary": result["summary"],
            "estimate_summary": result["estimate_summary"],
            "phase2": result["phase2"],
            "relationships": result["relationships"],
            "n_excluded": result["n_excluded"],
        })
    return pd.DataFrame(
        rows, columns=["doc_id", "issues", "groups", "estimates",
                       "summary", "estimate_summary", "phase2",
                       "relationships", "n_excluded"])


def enrich_extracted(extracted: DataFrame) -> DataFrame:
    """extracted (plans/fused.py output) -> one enriched row per doc.

    Zero-shuffle map pass. Giant docs need no dispatch branch here
    (unlike plans/fused.assemble_auto): the enrichment kernel is
    output-sensitive linear after the relationship-index fix, so the
    wall is work-bound, not straggler-bound — a measured giant-isolation
    union variant came out 50% SLOWER (its second stage serializes giant
    tasks behind the normal wave; BENCH/BASELINE.md §23)."""
    docs = extracted.select("doc_id", "issues")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield enrich_batch(pdf)

    return docs.mapInPandas(run, schema=ENRICHED_SCHEMA)
