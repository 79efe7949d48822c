"""W1 — running section/subsection tracking (text_extractor.pyc:90-129).

Expressed as window ``last(..., ignoreNulls)`` over document order; the
subsection is epoch-guarded so it resets when a new section heading appears
(the reference resets ``current_subsection`` on every section match) without
needing a second shuffle key: the captured struct carries the epoch it was
seen in, and is only valid if that epoch is the current one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import rules


def track_sections(df: DataFrame) -> DataFrame:
    """Input: span rows with (doc_id, offset, norm, out_kind).
    Adds: section, subsection (nullable; null section => HEADER downstream)."""
    w = (Window.partitionBy("doc_id").orderBy("offset")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    is_section = F.col("out_kind") == "section_heading"
    is_subsection = F.col("out_kind") == "subsection_heading"

    df = df.withColumn("_epoch", F.sum(is_section.cast("int")).over(w))
    df = df.withColumn(
        "section",
        F.last(F.when(is_section, F.col("norm")), ignorenulls=True).over(w))
    sub_struct = F.last(
        F.when(is_subsection, F.struct(F.col("_epoch").alias("epoch"),
                                       F.col("norm").alias("value"))),
        ignorenulls=True).over(w)
    df = df.withColumn(
        "subsection",
        F.when(sub_struct["epoch"] == F.col("_epoch"), sub_struct["value"]))
    return df.drop("_epoch")


def with_defaults(df: DataFrame) -> DataFrame:
    """HEADER / '' defaults for pre-section blocks (text_extractor.pyc:124-125)."""
    return (df
            .withColumn("section", F.coalesce("section", F.lit(rules.DEFAULT_SECTION)))
            .withColumn("subsection", F.coalesce("subsection", F.lit(rules.DEFAULT_SUBSECTION))))
