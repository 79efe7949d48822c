"""F2-extension output validator (reference
src/prompting/output_validator.py:34-477) behavioural tests."""

from pdf_extraction_spark import output_rules as ov


def _good_estimate(**over):
    e = {
        "item": "fixture", "issue_description": "worn fixture at entry",
        "severity": "Medium", "suggested_action": "repair",
        "estimated_low": 120, "estimated_high": 480,
        "confidence_score": 82,
        "reasoning": "labor and materials priced from standard regional "
                     "cost tables for this repair",
    }
    e.update(over)
    return e


def test_valid_estimate_passes():
    v = ov.validate_estimate(_good_estimate())
    assert v["valid"] and v["n_errors"] == 0
    assert not v["needs_review"]
    assert v["quality_score"] == 100


def test_error_paths():
    # missing fields collapse into ONE error line (reference
    # output_validator.py:117-120)
    v = ov.validate_estimate(_good_estimate(item="", reasoning=""))
    # missing(item+reasoning) = 1, reasoning too short = 1
    assert v["n_errors"] == 2 and not v["valid"] and v["needs_review"]

    v = ov.validate_estimate(_good_estimate(severity="odd"))
    assert v["n_errors"] == 1

    v = ov.validate_estimate(_good_estimate(confidence_score=150))
    assert v["n_errors"] == 1

    v = ov.validate_estimate(_good_estimate(estimated_low=500,
                                            estimated_high=400))
    assert v["n_errors"] == 1  # low >= high

    v = ov.validate_estimate(_good_estimate(estimated_high=60000))
    assert v["n_errors"] == 1 and v["needs_review"]


def test_warning_paths_and_quality():
    # round thousands + low-severity-high-cost + wide(>5) + review(>4)
    v = ov.validate_estimate(_good_estimate(
        severity="Low", estimated_low=1000, estimated_high=6000))
    assert "Both estimates are round thousands" in v["warnings"]
    assert "Cost range very wide" in v["warnings"]
    assert "Low severity with high cost estimate" in v["warnings"]
    assert v["needs_review"]          # 3 warnings AND ratio > 4
    assert v["quality_score"] == 100 - 5 * v["n_warnings"]

    # critical + monitor inconsistency
    v = ov.validate_estimate(_good_estimate(
        severity="Critical", suggested_action="monitor the area"))
    assert "Critical severity with 'monitor' action" in v["warnings"]

    # uncertainty wording with high confidence
    v = ov.validate_estimate(_good_estimate(
        confidence_score=90,
        reasoning="the final scope is unclear and depends on concealed "
                  "conditions behind the panel"))
    assert any("uncertainty" in w for w in v["warnings"])

    # generic phrase counts once per phrase
    v = ov.validate_estimate(_good_estimate(
        reasoning="as discussed and as mentioned earlier the scope "
                  "covers the full assembly replacement and repair"))
    assert sum("Generic phrase" in w for w in v["warnings"]) == 2


def test_clean_estimate():
    c = ov.clean_estimate({
        "severity": "high", "estimated_low": "120", "estimated_high": "480",
        "confidence_score": "82.0", "item": "  fixture  ",
        "assumptions": "open access; no reframing",
        "risk_factors": '["concealed damage"]',
    })
    assert c["severity"] == "High"
    assert c["estimated_low"] == 120.0 and c["confidence_score"] == 82
    assert c["item"] == "fixture"
    assert c["assumptions"] == ["open access", "no reframing"]
    assert c["risk_factors"] == ["concealed damage"]
