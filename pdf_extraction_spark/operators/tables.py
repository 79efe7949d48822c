"""S5/C6/W5/J1/T6 — table assembly, classification, section context, and
cost-estimate linking, all as pure DataFrame expressions (no UDFs).

Tables are contiguous runs of ``table_row`` spans (run detection via the
offset − row_number trick); cells come from higher-order array functions, so
the whole path stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .. import rules
from ..corpus import LINES_PER_PAGE


def page_col(offset: Column) -> Column:
    return (offset / LINES_PER_PAGE).cast("int") + 1


def _clean_cell(c: Column) -> Column:
    # ' '.join(c.split()) equivalent (src/table_extractor.py:59-84);
    # (?U) so Java \s splits on the same unicode whitespace python does
    return F.trim(F.regexp_replace(c, rules.jre(r"\s+"), " "))


def _classify_table(combined_lower: Column) -> Column:
    """C6 substring-containment cascade (src/table_extractor.py:87-116)."""
    result = None
    for ttype, kws in rules.TABLE_TYPE_KEYWORDS:
        cond = F.lit(False)
        for kw in kws:
            cond = cond | combined_lower.contains(kw)
        result = F.when(cond, F.lit(ttype)) if result is None else result.when(cond, F.lit(ttype))
    return result.otherwise(F.lit("generic"))


def _cell_prices(c: Column) -> Column:
    """T6 — first matching price pattern wins per cell
    (src/data_structurer.py:194-217)."""
    extracted = [F.regexp_extract_all(c, F.lit(rules.jre(p)), F.lit(1))
                 for p in rules.PRICE_PATTERNS]
    return (F.when(F.size(extracted[0]) > 0, extracted[0])
            .when(F.size(extracted[1]) > 0, extracted[1])
            .when(F.size(extracted[2]) > 0, extracted[2])
            .otherwise(F.array().cast("array<string>")))


def extract_tables(spans: DataFrame) -> DataFrame:
    """spans(doc_id, offset, norm, out_kind, ...) -> one row per table:
    (doc_id, first_offset, page_num, section, headers, table_data,
    table_type, cost)."""
    trows = spans.filter(F.col("out_kind") == "table_row")
    w = Window.partitionBy("doc_id").orderBy("offset")
    trows = (trows
             .withColumn("_rn", F.row_number().over(w))
             .withColumn("_run", F.col("offset") - F.col("_rn")))

    tables = (trows.groupBy("doc_id", "_run")
              .agg(F.min("offset").alias("first_offset"),
                   F.array_sort(F.collect_list(F.struct("offset", "norm"))).alias("_rows")))

    cells = F.filter(
        F.transform("_rows", lambda r: F.transform(F.split(r["norm"], r"\|"), _clean_cell)),
        lambda row: F.exists(row, lambda c: c != ""),
    )
    tables = (tables.withColumn("_cells", cells)
              .filter(F.size("_cells") >= 2)   # table_extractor.py:23-29
              .withColumn("headers", F.element_at("_cells", 1))
              .withColumn("table_data", F.slice(F.col("_cells"), 2, F.size("_cells") - 1))
              # F10 size gate (table_extractor.py:183-203)
              .filter((F.size("table_data") <= rules.TABLE_MAX_ROWS)
                      & (F.size("headers") <= rules.TABLE_MAX_COLS))
              .drop("_rows", "_cells", "_rn"))

    combined = F.lower(F.concat_ws(
        " ",
        F.array_join(F.col("headers"), " "),
        F.array_join(F.transform("table_data", lambda r: F.array_join(r, " ")), " ")))
    tables = tables.withColumn("table_type", _classify_table(combined))
    tables = tables.withColumn("page_num", page_col(F.col("first_offset")))

    # W5 — section context: first section heading on the page, else PAGE_n
    # (src/table_extractor.py:119-145)
    page_sections = (spans.filter(F.col("out_kind") == "section_heading")
                     .withColumn("page_num", page_col(F.col("offset")))
                     .groupBy("doc_id", "page_num")
                     .agg(F.min_by("norm", "offset").alias("_page_section")))
    tables = (tables.join(page_sections, ["doc_id", "page_num"], "left")
              .withColumn("section",
                          F.coalesce("_page_section",
                                     F.concat(F.lit("PAGE_"), F.col("page_num"))))
              .drop("_page_section"))

    # T6 — cost struct: first price-bearing row, last price-bearing cell
    # (src/data_structurer.py:181-224)
    row_last = F.transform(
        "table_data",
        lambda row: F.when(
            F.size(F.filter(F.transform(row, _cell_prices), lambda p: F.size(p) > 0)) > 0,
            F.element_at(F.filter(F.transform(row, _cell_prices), lambda p: F.size(p) > 0), -1)))
    nn = F.filter(row_last, lambda x: x.isNotNull())
    first_prices = F.when(F.size(nn) > 0, F.element_at(nn, 1))
    tables = tables.withColumn("_prices_s", first_prices)
    prices_d = F.transform("_prices_s", lambda x: F.replace(x, F.lit(","), F.lit("")).cast("double"))
    cost = F.when(
        F.col("_prices_s").isNotNull(),
        F.struct(
            F.array_min(prices_d).alias("min"),
            F.array_max(prices_d).alias("max"),
            (F.aggregate(prices_d, F.lit(0.0), lambda a, x: a + x)
             / F.size("_prices_s")).alias("average")))
    return tables.withColumn("cost", cost).drop("_prices_s", "_run")


def link_costs(issues: DataFrame, tables: DataFrame) -> DataFrame:
    """J1 — attach each cost_estimate table's cost to the *first* issue with
    the same section and overlapping page; later tables overwrite earlier
    (src/data_structurer.py:160-178)."""
    cost_tables = (tables
                   .filter((F.col("table_type") == "cost_estimate")
                           & F.col("cost").isNotNull())
                   .select(F.col("doc_id").alias("_t_doc"),
                           F.col("first_offset").alias("_t_order"),
                           F.col("section").alias("_t_section"),
                           F.col("page_num").alias("_t_page"), "cost"))

    cand = issues.join(
        cost_tables,
        (F.col("doc_id") == F.col("_t_doc"))
        & (F.col("section") == F.col("_t_section"))
        & F.array_contains(F.col("page_numbers"), F.col("_t_page")),
        "inner").drop("_t_doc")

    # per table: first issue in issue order
    w_table = Window.partitionBy("doc_id", "_t_order").orderBy("issue_order")
    cand = cand.withColumn("_r1", F.row_number().over(w_table)).filter(F.col("_r1") == 1)
    # per issue: last table wins
    w_issue = Window.partitionBy("doc_id", "issue_order").orderBy(F.desc("_t_order"))
    cand = (cand.withColumn("_r2", F.row_number().over(w_issue))
            .filter(F.col("_r2") == 1)
            .select("doc_id", "issue_order", F.col("cost").alias("estimated_cost")))

    return issues.join(cand, ["doc_id", "issue_order"], "left")


def ruled_rows_as_spans(rows: DataFrame) -> DataFrame:
    """Bridge `layout.detect_ruled_tables` output (one row per ruled
    table row) onto the span shape :func:`extract_tables` consumes, so
    drawn-grid tables flow through the same S5 assembly → F10 size
    gate → C6 classification → T6 price parsing as text-strategy
    tables: ``extract_tables(ruled_rows_as_spans(ruled_rows))``.

    Offsets are synthetic — ``tbl_idx * (TABLE_MAX_ROWS + 2) +
    row_idx`` keeps each ruled table one contiguous offset run with a
    gap between tables, so the run-detection trick reconstructs table
    boundaries exactly.  No section_heading spans ride along, so W5
    section context degrades to the reference's own ``PAGE_n``
    fallback (src/table_extractor.py:119-145); callers that need real
    section context should interleave table rows into the full span
    pipeline instead."""
    return rows.select(
        "doc_id",
        (F.col("tbl_idx").cast("long")
         * (rules.TABLE_MAX_ROWS + 2)
         + F.col("row_idx")).alias("offset"),
        F.col("table_text").alias("norm"),
        F.lit("table_row").alias("out_kind"))
