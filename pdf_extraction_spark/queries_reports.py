"""Gate queries for the reference's report/verification utility scripts.

The reference ships three driver-side report scripts over the estimation
output (`utils/analyze_variance.py:1-53`, `utils/verify_estimates.py:11-107`,
`utils/compare_estimates.py:1-105`). They are thin aggregations over the
C18 cost-estimate records — re-expressed here as distributed groupBy plans
over the same derived corpus the `cost_estimate` gate uses, so a user of
the reference gets the same variance/verification/comparison report columns
from one query instead of a driver-side json loop.

Float discipline (round-5 rewrite; driver hashes exact values): the r04
driver run red-flagged `variance_report`/`verify_report` (rows+schema green,
hash red) while the local bit-exact comparator passed at sf0.001/0.01/0.1.
The shared signature of the red rows was float arithmetic in the oracle
surface — `floor(x * 100.0 / y)` types the `100.0` literal as DECIMAL(4,1)
in DuckDB and its DOUBLE-promotion rules are version-sensitive, so the
driver's DuckDB could legally produce a different last bit than the local
one. These gates now use NO floats at all: every ratio column is truncating
integer division on BIGINTs — Spark `div`, DuckDB `//`, both truncate toward
zero and every operand here is non-negative, so the result is
version-independent on both engines. Nullable ratio cells are coalesced to
the -1 sentinel so the column stays int64 end-to-end (a NULL BIGINT cell
turns the fetched pandas column float64, which a dtype-aware value hash
would flag even with equal values).
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
    `max_variance_pct` carries the per-estimate (high-low)*100/low metric
    (low>0 guard as in the script; -1 when no estimate in the category has
    a positive low) as truncating BIGINT division."""
    est = q_cost_estimate(spark, sf_dir).withColumn(
        "variance", (F.col("estimated_high") - F.col("estimated_low"))
        .cast("long"))
    per_cat = est.groupBy("category").agg(
        F.count(F.lit(1)).alias("n_issues"),
        F.sum("variance").alias("total_variance"),
        F.max("variance").alias("max_variance"),
        F.coalesce(
            F.max(F.when(
                F.col("estimated_low") > 0,
                F.expr("(variance * 100) div estimated_low"))),
            F.lit(-1).cast("long"))
        .alias("max_variance_pct"))
    grand = Window.partitionBy()
    return per_cat.withColumn(
        "grand_total", F.sum("total_variance").over(grand)).select(
        "category", "n_issues", "total_variance", "max_variance",
        "max_variance_pct",
        # -1 sentinel when every estimate is point-valued (grand total
        # spread 0): keeps the column non-null int64 on both engines
        F.when(F.col("grand_total") > 0,
               F.expr("(total_variance * 100) div grand_total"))
        .otherwise(F.lit(-1).cast("long")).alias("share_pct"))


def _sql_variance_report() -> str:
    return f"""
WITH est AS ({_sql_cost()}),
v AS (
  SELECT category,
         CAST(estimated_high - estimated_low AS BIGINT) AS variance,
         CAST(estimated_low AS BIGINT) AS estimated_low
  FROM est),
per_cat AS (
  SELECT category,
         COUNT(*) AS n_issues,
         -- DuckDB SUM(BIGINT) yields HUGEINT, which pandas fetches as
         -- float64 while Spark's long sum stays int64 — a dtype-level
         -- hash divergence even at equal values; CAST every integer
         -- aggregate (and every // involving one) back to BIGINT
         CAST(SUM(variance) AS BIGINT) AS total_variance,
         MAX(variance) AS max_variance,
         COALESCE(MAX(CASE WHEN estimated_low > 0 THEN
               (variance * 100) // estimated_low
             END), -1) AS max_variance_pct
  FROM v GROUP BY category)
SELECT category, n_issues, total_variance, max_variance, max_variance_pct,
  CASE WHEN SUM(total_variance) OVER () > 0 THEN
    CAST((total_variance * 100) // CAST(SUM(total_variance) OVER () AS BIGINT)
         AS BIGINT)
  ELSE -1 END AS share_pct
FROM per_cat
"""


# ---------------------------------------------------------------------------
# utils/verify_estimates.py — per-report verification verdict
# ---------------------------------------------------------------------------

def q_verify_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate verification (utils/verify_estimates.py:11-107) per
    document: valid/null estimate counts, cost-range totals, confidence
    stats, the script's three warning gates and its final verdict
    (>=90% valid AND nonzero total), all as integer-exact expressions
    (avg_conf_x100 is truncating BIGINT division, no doubles anywhere)."""
    est = q_cost_estimate(spark, sf_dir)
    valid = F.when(F.col("estimated_low").isNotNull()
                   & (F.col("estimated_low") != 0), 1).otherwise(0)
    agg = est.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_estimates"),
        F.sum(valid).alias("valid_estimates"),
        F.sum("estimated_low").alias("total_low"),
        F.sum("estimated_high").alias("total_high"),
        F.sum("confidence_score").cast("long").alias("_conf_sum"),
        F.sum(F.when(F.col("confidence_score") >= 85, 1).otherwise(0))
        .alias("high_confidence"),
        F.sum(F.col("needs_review").cast("int")).alias("needs_review_n"))
    return agg.select(
        "doc_id", "n_estimates", "valid_estimates", "total_low",
        "total_high",
        F.expr("(_conf_sum * 100) div n_estimates").alias("avg_conf_x100"),
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
         -- CAST every integer SUM: DuckDB SUM(int) -> HUGEINT -> pandas
         -- float64, a dtype divergence vs Spark's int64 (see variance
         -- report oracle)
         CAST(SUM(CASE WHEN estimated_low IS NOT NULL AND estimated_low != 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS valid_estimates,
         CAST(SUM(estimated_low) AS BIGINT) AS total_low,
         CAST(SUM(estimated_high) AS BIGINT) AS total_high,
         CAST(SUM(confidence_score) AS BIGINT) AS conf_sum,
         CAST(SUM(CASE WHEN confidence_score >= 85 THEN 1 ELSE 0 END)
           AS BIGINT) AS high_confidence,
         CAST(SUM(CASE WHEN needs_review THEN 1 ELSE 0 END) AS BIGINT)
           AS needs_review_n
  FROM est GROUP BY doc_id)
SELECT doc_id, n_estimates, valid_estimates, total_low, total_high,
  (conf_sum * 100) // n_estimates AS avg_conf_x100,
  high_confidence, needs_review_n,
  conf_sum < 60 * n_estimates AS low_conf_warn,
  needs_review_n * 10 > 3 * n_estimates AS review_warn,
  (valid_estimates * 10 >= 9 * n_estimates AND total_low > 0) AS passed
FROM agg
"""


# ---------------------------------------------------------------------------
# utils/compare_estimates.py — original vs precise-method comparison
# ---------------------------------------------------------------------------

def q_compare_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate-method comparison (utils/compare_estimates.py:1-105) per
    document. The script compares the original rule-based range against the
    "precise tight" method's range + most-likely value, reports each
    method's variance pct ((high-low)/low*100), the improvement, and the
    top-3 most expensive issues by most-likely estimate.

    The reference's precise method is LLM glue (precise_cost_estimator.py)
    that the contract replaces with a deterministic rule: per estimate,
    most_likely = (low+high) div 2 and the tight range shrinks each side of
    the original range by a quarter of the spread (prec_low = low +
    spread div 4, prec_high = high - spread div 4) — the script's documented
    "~75% -> ~28%" tightening, made reproducible. All ratio columns are
    truncating BIGINT division on both engines (no doubles; see module
    docstring); top-k slots beyond the estimate count are -1."""
    est = q_cost_estimate(spark, sf_dir).select(
        "doc_id",
        F.col("estimated_low").cast("long").alias("low"),
        F.col("estimated_high").cast("long").alias("high"))
    est = est.withColumn("spread", F.col("high") - F.col("low")).select(
        "doc_id", "low", "high",
        (F.col("low") + F.expr("spread div 4")).alias("prec_low"),
        (F.col("high") - F.expr("spread div 4")).alias("prec_high"),
        F.expr("(low + high) div 2").alias("most_likely"))
    agg = est.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_estimates"),
        F.sum("low").alias("orig_low"),
        F.sum("high").alias("orig_high"),
        F.sum("prec_low").alias("prec_low"),
        F.sum("prec_high").alias("prec_high"),
        F.sum("most_likely").alias("total_most_likely"),
        # top-3 most expensive by most_likely; only the values are
        # reported, so equal values need no tie-break and a plain value
        # sort is deterministic on both engines
        F.expr("slice(reverse(array_sort(collect_list(most_likely))), 1, 3)")
        .alias("_top"))
    # try_element_at: plain element_at THROWS under ANSI mode (the
    # session default) when a doc has fewer than 3 estimates; the
    # missing-slot contract is -1, matching the oracle's out-of-range
    # NULL -> COALESCE
    top = [F.coalesce(F.try_element_at("_top", F.lit(i)),
                      F.lit(-1).cast("long"))
           .alias(f"top{i}_most_likely")
           for i in (1, 2, 3)]
    # -1 sentinel when a doc's summed low is 0 (all-null/zero lows are
    # possible in the rule's output — see verify_report's valid gate):
    # keeps the pct columns non-null int64 on both engines
    ovar = F.when(F.col("orig_low") > 0,
                  F.expr("((orig_high - orig_low) * 100) div orig_low")) \
        .otherwise(F.lit(-1).cast("long"))
    pvar = F.when(F.col("prec_low") > 0,
                  F.expr("((prec_high - prec_low) * 100) div prec_low")) \
        .otherwise(F.lit(-1).cast("long"))
    return agg.select(
        "doc_id", "n_estimates", "orig_low", "orig_high",
        ovar.alias("orig_var_pct"),
        "prec_low", "prec_high",
        pvar.alias("prec_var_pct"),
        # the script computes improvement only when the original
        # variance is meaningful; -1-sentinel rows report 0
        F.when((F.col("orig_low") > 0) & (F.col("prec_low") > 0),
               ovar - pvar).otherwise(F.lit(0).cast("long"))
        .alias("improvement_pct"),
        "total_most_likely", *top)


def _sql_compare_report() -> str:
    return f"""
WITH est AS ({_sql_cost()}),
p AS (
  SELECT doc_id,
         CAST(estimated_low AS BIGINT) AS low,
         CAST(estimated_high AS BIGINT) AS high,
         CAST(estimated_low AS BIGINT)
           + (CAST(estimated_high - estimated_low AS BIGINT) // 4)
           AS prec_low,
         CAST(estimated_high AS BIGINT)
           - (CAST(estimated_high - estimated_low AS BIGINT) // 4)
           AS prec_high,
         CAST(estimated_low + estimated_high AS BIGINT) // 2 AS most_likely
  FROM est),
agg AS (
  SELECT doc_id,
         COUNT(*) AS n_estimates,
         -- CAST every integer SUM: DuckDB SUM(BIGINT) -> HUGEINT ->
         -- pandas float64 (see variance report oracle)
         CAST(SUM(low) AS BIGINT) AS orig_low,
         CAST(SUM(high) AS BIGINT) AS orig_high,
         CAST(SUM(prec_low) AS BIGINT) AS prec_low,
         CAST(SUM(prec_high) AS BIGINT) AS prec_high,
         CAST(SUM(most_likely) AS BIGINT) AS total_most_likely,
         list_sort(list(most_likely), 'DESC') AS top_list
  FROM p GROUP BY doc_id)
SELECT doc_id, n_estimates, orig_low, orig_high,
  CASE WHEN orig_low > 0
    THEN ((orig_high - orig_low) * 100) // orig_low
    ELSE -1 END AS orig_var_pct,
  prec_low, prec_high,
  CASE WHEN prec_low > 0
    THEN ((prec_high - prec_low) * 100) // prec_low
    ELSE -1 END AS prec_var_pct,
  CASE WHEN orig_low > 0 AND prec_low > 0 THEN
    ((orig_high - orig_low) * 100) // orig_low
      - ((prec_high - prec_low) * 100) // prec_low
  ELSE 0 END AS improvement_pct,
  total_most_likely,
  COALESCE(top_list[1], -1) AS top1_most_likely,
  COALESCE(top_list[2], -1) AS top2_most_likely,
  COALESCE(top_list[3], -1) AS top3_most_likely
FROM agg
"""


QUERIES_REPORTS: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "variance_report": q_variance_report,
    "verify_report": q_verify_report,
    "compare_report": q_compare_report,
}

ORACLES_REPORTS: dict[str, str] = {
    "variance_report": _sql_variance_report(),
    "verify_report": _sql_verify_report(),
    "compare_report": _sql_compare_report(),
}
