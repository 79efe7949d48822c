"""Gate queries for the reference's report/verification utility scripts.

The reference ships three driver-side report scripts over the estimation
output (`utils/analyze_variance.py:1-53`, `utils/verify_estimates.py:11-107`,
`utils/compare_estimates.py:1-105`). They are thin aggregations over the
C18 cost-estimate records — re-expressed here as distributed groupBy plans
over the same derived corpus the `cost_estimate` gate uses, so a user of
the reference gets the same variance/verification report columns from one
query instead of a driver-side json loop.

Float discipline (driver hashes exact values): every ratio is either an
integer comparison (booleans) or floor(int * 100.0 / int) — identical
IEEE-754 double division on both engines — cast to BIGINT on both sides.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries_enrich import _sql_cost, q_cost_estimate


# ---------------------------------------------------------------------------
# utils/analyze_variance.py — per-category variance drivers
# ---------------------------------------------------------------------------

def q_variance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance analysis (utils/analyze_variance.py:11-53): per-estimate
    spread = high - low, rolled up per category with the category's share
    of total variance — the script's "by category" section, distributed.
    `max_variance_pct` carries the per-estimate (high-low)/low*100 metric
    (low>0 guard as in the script) at floor precision."""
    est = q_cost_estimate(spark, sf_dir).withColumn(
        "variance", (F.col("estimated_high") - F.col("estimated_low"))
        .cast("long"))
    per_cat = est.groupBy("category").agg(
        F.count(F.lit(1)).alias("n_issues"),
        F.sum("variance").alias("total_variance"),
        F.max("variance").alias("max_variance"),
        F.max(F.when(F.col("estimated_low") > 0,
                     F.floor(F.col("variance") * 100.0
                             / F.col("estimated_low"))))
        .alias("max_variance_pct"))
    grand = Window.partitionBy()
    return per_cat.select(
        "category", "n_issues", "total_variance", "max_variance",
        "max_variance_pct",
        F.floor(F.col("total_variance") * 100.0
                / F.sum("total_variance").over(grand))
        .alias("share_pct"))


def _sql_variance_report() -> str:
    return f"""
WITH est AS ({_sql_cost()}),
v AS (
  SELECT category,
         CAST(estimated_high - estimated_low AS BIGINT) AS variance,
         estimated_low
  FROM est),
per_cat AS (
  SELECT category,
         COUNT(*) AS n_issues,
         SUM(variance) AS total_variance,
         MAX(variance) AS max_variance,
         MAX(CASE WHEN estimated_low > 0 THEN
               CAST(floor(variance * 100.0 / estimated_low) AS BIGINT)
             END) AS max_variance_pct
  FROM v GROUP BY category)
SELECT category, n_issues, total_variance, max_variance, max_variance_pct,
  CAST(floor(total_variance * 100.0 / SUM(total_variance) OVER ()) AS BIGINT)
    AS share_pct
FROM per_cat
"""


# ---------------------------------------------------------------------------
# utils/verify_estimates.py — per-report verification verdict
# ---------------------------------------------------------------------------

def q_verify_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate verification (utils/verify_estimates.py:11-107) per
    document: valid/null estimate counts, cost-range totals, confidence
    stats, the script's three warning gates and its final verdict
    (>=90% valid AND nonzero total), all as integer-exact expressions."""
    est = q_cost_estimate(spark, sf_dir)
    valid = F.when(F.col("estimated_low").isNotNull()
                   & (F.col("estimated_low") != 0), 1).otherwise(0)
    agg = est.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_estimates"),
        F.sum(valid).alias("valid_estimates"),
        F.sum("estimated_low").alias("total_low"),
        F.sum("estimated_high").alias("total_high"),
        F.sum("confidence_score").alias("_conf_sum"),
        F.sum(F.when(F.col("confidence_score") >= 85, 1).otherwise(0))
        .alias("high_confidence"),
        F.sum(F.col("needs_review").cast("int")).alias("needs_review_n"))
    return agg.select(
        "doc_id", "n_estimates", "valid_estimates", "total_low",
        "total_high",
        F.floor(F.col("_conf_sum") * 100.0 / F.col("n_estimates"))
        .alias("avg_conf_x100"),
        "high_confidence", "needs_review_n",
        # script warnings: avg confidence < 60; review share > 30%
        (F.col("_conf_sum") < 60 * F.col("n_estimates"))
        .alias("low_conf_warn"),
        (F.col("needs_review_n") * 10 > 3 * F.col("n_estimates"))
        .alias("review_warn"),
        ((F.col("valid_estimates") * 10 >= 9 * F.col("n_estimates"))
         & (F.col("total_low") > 0)).alias("passed"))


def _sql_verify_report() -> str:
    return f"""
WITH est AS ({_sql_cost()}),
agg AS (
  SELECT doc_id,
         COUNT(*) AS n_estimates,
         SUM(CASE WHEN estimated_low IS NOT NULL AND estimated_low != 0
                  THEN 1 ELSE 0 END) AS valid_estimates,
         SUM(estimated_low) AS total_low,
         SUM(estimated_high) AS total_high,
         SUM(confidence_score) AS conf_sum,
         SUM(CASE WHEN confidence_score >= 85 THEN 1 ELSE 0 END)
           AS high_confidence,
         SUM(CASE WHEN needs_review THEN 1 ELSE 0 END) AS needs_review_n
  FROM est GROUP BY doc_id)
SELECT doc_id, n_estimates, valid_estimates, total_low, total_high,
  CAST(floor(conf_sum * 100.0 / n_estimates) AS BIGINT) AS avg_conf_x100,
  high_confidence, needs_review_n,
  conf_sum < 60 * n_estimates AS low_conf_warn,
  needs_review_n * 10 > 3 * n_estimates AS review_warn,
  (valid_estimates * 10 >= 9 * n_estimates AND total_low > 0) AS passed
FROM agg
"""


QUERIES_REPORTS: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "variance_report": q_variance_report,
    "verify_report": q_verify_report,
}

ORACLES_REPORTS: dict[str, str] = {
    "variance_report": _sql_variance_report(),
    "verify_report": _sql_verify_report(),
}
