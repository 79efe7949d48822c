"""Hybrid enrichment plan parity: the Catalyst stage-B/C operators must
produce field-identical output to the all-python enrich_document path on
the same extracted corpus."""

import math

import pytest

from pdf_extraction_spark import corpus
from pdf_extraction_spark import enrich_rules as er
from pdf_extraction_spark.plans.fused import assemble_fused
from pdf_extraction_spark.plans.enrichment_hybrid import (
    doc_summaries, enrich_extracted_hybrid, group_rows)

N_DOCS = 30


@pytest.fixture(scope="module")
def both(spark):
    docs = corpus.generate_docs(spark, N_DOCS, partitions=4)
    extracted = assemble_fused(docs).persist()
    # python reference path (the same code the mapInPandas plan runs)
    want = {}
    for r in extracted.select("doc_id", "issues").collect():
        issues = [i.asDict(recursive=True) for i in r["issues"]]
        want[r["doc_id"]] = er.enrich_document(issues)
    flat = enrich_extracted_hybrid(extracted).persist()
    got = {}
    for r in flat.collect():
        got.setdefault(r["doc_id"], {})[r["issue_order"]] = \
            r.asDict(recursive=True)
    groups = {}
    for r in group_rows(flat).collect():
        groups.setdefault(r["doc_id"], []).append(r.asDict(recursive=True))
    sums = {r["doc_id"]: r.asDict()
            for r in doc_summaries(flat).collect()}
    extracted.unpersist()
    return want, got, groups, sums, flat


def test_issue_field_parity(both):
    want, got, _, _, _ = both
    n_checked = 0
    for doc_id, res in want.items():
        rows = got.get(doc_id, {})
        assert len(rows) == len(res["issues"]), doc_id
        for order, issue in enumerate(res["issues"]):
            row = rows[order]
            ctx = f"{doc_id}#{order}"
            for k_bool in ("is_duplicate", "needs_manual_review",
                           "requires_specialized_labor", "is_grouped"):
                assert row[k_bool] == bool(issue.get(k_bool, False)), \
                    f"{ctx}.{k_bool}"
            for k_row, k_iss in [
                    ("id", "id"), ("section", "section"),
                    ("status", "status"), ("priority", "priority"),
                    ("title", "title"), ("description", "description"),
                    ("standard_category", "standard_category"),
                    ("standard_subcategory", "standard_subcategory"),
                    ("standard_severity", "standard_severity"),
                    ("standard_action", "standard_action"),
                    ("action_priority", "action_priority"),
                    ("cost_strategy", "cost_strategy"),
                    ("matched_standard_item", "matched_standard_item"),
                    ("grouped_with", "grouped_with")]:
                assert row[k_row] == issue.get(k_iss), \
                    f"{ctx}.{k_row}: {row[k_row]!r} != {issue.get(k_iss)!r}"
            for k_row, k_iss in [
                    ("severity_confidence", "severity_confidence"),
                    ("action_confidence", "action_confidence"),
                    ("category_confidence", "category_confidence"),
                    ("data_quality_score", "data_quality_score"),
                    ("urgency_score", "urgency_score"),
                    ("complexity_factor", "complexity_factor"),
                    ("strategy_confidence", "strategy_confidence")]:
                assert math.isclose(row[k_row], issue.get(k_iss),
                                    abs_tol=1e-9), \
                    f"{ctx}.{k_row}: {row[k_row]} != {issue.get(k_iss)}"
            cls = issue.get("classification", {})
            assert row["trade"] == cls.get("trade"), ctx
            assert row["work_type"] == cls.get("work_type"), ctx
            assert row["complexity"] == cls.get("complexity"), ctx
            assert math.isclose(row["trade_confidence"],
                                cls.get("trade_confidence"),
                                abs_tol=1e-9), ctx
            assert math.isclose(row["work_type_confidence"],
                                cls.get("work_type_confidence"),
                                abs_tol=1e-9), ctx
            assert math.isclose(row["complexity_confidence"],
                                cls.get("complexity_confidence"),
                                abs_tol=1e-9), ctx
            # C9 attributes
            attrs = issue.get("extracted_attributes") or {}
            meas = attrs.get("measurements") or {}
            assert row["attr_locations"] == attrs.get("locations", []), ctx
            assert row["attr_materials"] == attrs.get("materials", []), ctx
            assert row["attr_damage_types"] == \
                attrs.get("damage_types", []), ctx
            assert row["attr_dimensions"] == \
                meas.get("dimensions", []), ctx
            assert row["attr_lengths"] == meas.get("lengths", []), ctx
            assert row["attr_areas"] == meas.get("areas", []), ctx
            assert row["safety_flag"] == \
                bool(issue.get("safety_flag", False)), ctx
            assert row["accessibility_complexity"] == \
                issue.get("accessibility_complexity"), ctx
            # C13
            area = issue.get("estimated_affected_area")
            if area is None:
                assert row["area_square_feet"] is None, ctx
            else:
                assert math.isclose(row["area_square_feet"],
                                    area["square_feet"], abs_tol=1e-9), ctx
                assert row["area_dimensions"] == area.get("dimensions"), ctx
                assert row["area_size_category"] == \
                    area.get("size_category"), ctx
            n_checked += 1
    assert n_checked > 100


def test_estimate_parity(both):
    want, got, _, _, _ = both
    for doc_id, res in want.items():
        rows = got.get(doc_id, {})
        for order, est in enumerate(res["estimates"]):
            row = rows[order]
            ctx = f"{doc_id}#{order}"
            assert row["est_category"] == est["category"], ctx
            assert row["est_sub_type"] == est["sub_type"], ctx
            assert row["estimated_low"] == est["estimated_low"], ctx
            assert row["estimated_high"] == est["estimated_high"], ctx
            assert row["confidence_score"] == est["confidence_score"], ctx
            assert row["reasoning"] == est["reasoning"], ctx
            assert row["risk_factors"] == est["risk_factors"], ctx
            assert row["needs_review"] == est["needs_review"], ctx


def test_group_parity(both):
    want, _, groups, _, _ = both
    for doc_id, res in want.items():
        g_want = res["groups"]
        g_got = sorted(groups.get(doc_id, []),
                       key=lambda g: int(g["group_id"].split("_")[1]))
        assert len(g_got) == len(g_want), doc_id
        for a, b in zip(g_got, g_want):
            assert a["group_id"] == b["group_id"], doc_id
            assert a["grouping_key"] == b["grouping_key"], doc_id
            assert a["issue_count"] == b["issue_count"], doc_id
            assert a["issue_ids"] == b["issue_ids"], doc_id
            assert a["group_type"] == b["group_type"], doc_id


def test_summary_parity(both):
    want, _, _, sums, _ = both
    for doc_id, res in want.items():
        s, e = res["summary"], res["estimate_summary"]
        row = sums[doc_id]
        assert row["total_issues"] == s["total_issues"], doc_id
        assert row["safety_issues"] == s["safety_issues"], doc_id
        assert row["grouped_issues"] == s["grouped_issues"], doc_id
        # Spark round is HALF_UP, python round is banker's: equal except
        # at exact .xx5 ties, where they differ by exactly one cent
        assert abs(row["avg_urgency"] - s["avg_urgency"]) <= 0.011, doc_id
        assert abs(row["avg_complexity"] - s["avg_complexity"]) <= 0.011, \
            doc_id
        assert row["estimated_issues"] == e["estimated_issues"], doc_id
        assert row["total_estimated_low"] == e["total_estimated_low"], doc_id
        assert row["total_estimated_high"] == \
            e["total_estimated_high"], doc_id
        assert row["average_confidence"] == e["average_confidence"], doc_id
        assert row["needs_review"] == e["needs_review"], doc_id
        assert row["n_excluded"] == res["n_excluded"], doc_id
