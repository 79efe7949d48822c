"""Gate queries for the geometric layout-reconstruction operators
(``operators/layout.py``): positioned text runs -> lines -> blocks with
font-size-histogram heading detection.

Derived corpus (dyadic-arithmetic contract): positioned runs generated
from ``orders`` — 3 runs per visual line with ±2pt top jitter (inside
the 3.0 y-tolerance), lines 12pt apart (4pt whitespace gap, inside the
10pt block gap), every 4th line shifted +30pt (34pt gap -> new block),
every 6th line at font size 14 over a size-10 body (the histogram mode
is 10, so those lines are headings).  Rendered identically into Spark
columns and DuckDB SQL; the oracle re-implements the single-linkage
clustering with SQL window functions.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.layout import block_text, reconstruct_blocks
from .queries import _pick, _sql_list

RWORDS = ["roof", "leak", "panel", "attic", "vent", "joist", "crack",
          "beam", "flue", "sump"]
N_LDOCS = 40


def _runs_corpus(spark: SparkSession, sf_dir: str,
                 with_k: bool = False) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    doc = F.pmod(k, F.lit(N_LDOCS))
    rn = F.row_number().over(
        Window.partitionBy(doc).orderBy(k)) - 1
    li = F.floor(rn / 3)
    pos = rn % 3
    y0 = (li * 12 + F.floor(li / 4) * 30 + F.pmod(k, F.lit(3))) \
        .cast("double")
    x0 = (pos * 50 + F.pmod(k, F.lit(7))).cast("double")
    return o.select(
        doc.alias("doc_id"),
        *([k.alias("k")] if with_k else []),
        _pick(RWORDS, F.pmod(F.floor(k / 11), F.lit(len(RWORDS))))
        .alias("text"),
        x0.alias("x0"), y0.alias("y0"),
        (x0 + 40).alias("x1"), (y0 + 8).alias("y1"),
        F.when(F.pmod(li, F.lit(6)) == 0, F.lit(14.0))
        .otherwise(F.lit(10.0)).alias("size"))


def _runs_media_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same grid with every k%9==0 run turned into a media run
    (text null, media_ref set) — interleaved figures at real positions."""
    r = _runs_corpus(spark, sf_dir, with_k=True)
    is_m = F.pmod(F.col("k"), F.lit(9)) == 0
    return r.select(
        "doc_id",
        F.when(is_m, F.lit(None).cast("string"))
        .otherwise(F.col("text")).alias("text"),
        "x0", "y0", "x1", "y1", "size",
        F.when(is_m, F.concat(F.lit("img:"), F.col("k").cast("string")))
        .alias("media_ref"))


def _sql_layout_cte(text_pred: str = "TRUE") -> str:
    """The shared oracle CTE chain; ``text_pred`` filters which runs
    enter the line/block clustering (the spans query excludes media
    runs, mirroring spans_from_runs)."""
    return f"""
r0 AS (
  SELECT o_orderkey AS k, o_orderkey % {N_LDOCS} AS doc_id,
    ROW_NUMBER() OVER (PARTITION BY o_orderkey % {N_LDOCS}
                       ORDER BY o_orderkey) - 1 AS rn
  FROM orders),
runs AS (
  SELECT doc_id, k, rn // 3 AS li, rn % 3 AS pos,
    {_sql_list(RWORDS)}[CAST(1 + (k // 11) % {len(RWORDS)} AS INT)]
      AS text,
    CAST((rn % 3) * 50 + k % 7 AS DOUBLE) AS x0,
    CAST((rn // 3) * 12 + ((rn // 3) // 4) * 30 + k % 3 AS DOUBLE)
      AS y0,
    CAST((rn % 3) * 50 + k % 7 + 40 AS DOUBLE) AS x1,
    CAST((rn // 3) * 12 + ((rn // 3) // 4) * 30 + k % 3 + 8 AS DOUBLE)
      AS y1,
    CASE WHEN (rn // 3) % 6 = 0 THEN 14.0 ELSE 10.0 END AS size
  FROM r0),
tr AS (SELECT * FROM runs WHERE {text_pred}),
lc AS (
  SELECT *, CASE WHEN lag(y0) OVER w IS NULL
                   OR y0 - lag(y0) OVER w > 3.0
            THEN 1 ELSE 0 END AS nl
  FROM tr
  WINDOW w AS (PARTITION BY doc_id
               ORDER BY y0, x0, text, x1, y1, size)),
lid AS (
  SELECT *, SUM(nl) OVER (PARTITION BY doc_id
                          ORDER BY y0, x0, text, x1, y1, size
                          ROWS UNBOUNDED PRECEDING) - 1 AS line_id
  FROM lc),
lines AS (
  SELECT doc_id, line_id,
    string_agg(text, ' ' ORDER BY x0, text) AS text,
    min(x0) AS x0, min(y0) AS y0, max(x1) AS x1, max(y1) AS y1,
    max(size) AS max_size, count(*) AS n_runs
  FROM lid GROUP BY doc_id, line_id),
bc AS (
  -- running max of previous bottoms (interval-merge), not lag(y1)
  SELECT *, CASE WHEN max(y1) OVER w2 IS NULL
                   OR y0 - max(y1) OVER w2 > 10.0
            THEN 1 ELSE 0 END AS nb
  FROM lines
  WINDOW w2 AS (PARTITION BY doc_id ORDER BY y0, x0, line_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
bid AS (
  SELECT *, SUM(nb) OVER (PARTITION BY doc_id ORDER BY y0, x0, line_id
                          ROWS UNBOUNDED PRECEDING) - 1 AS block_id
  FROM bc),
mode AS (
  SELECT doc_id, size AS modal_size
  FROM tr GROUP BY doc_id, size
  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                             ORDER BY count(*) DESC, size DESC) = 1),
blocks AS (
  SELECT b.doc_id, CAST(b.block_id AS BIGINT) AS block_id,
    CAST(b.line_id AS BIGINT) AS line_id, b.text,
    b.x0, b.y0, b.x1, b.y1, b.max_size,
    CAST(b.n_runs AS BIGINT) AS n_runs,
    coalesce(b.max_size > m.modal_size + 0.5, FALSE) AS is_heading
  FROM bid b LEFT JOIN mode m ON b.doc_id = m.doc_id)
"""


def q_layout_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level layout parse: y-tolerance line clustering, whitespace-
    gap block segmentation, font-size-histogram headings."""
    return reconstruct_blocks(_runs_corpus(spark, sf_dir))


SQL_LAYOUT_BLOCKS = f"""
WITH {_sql_layout_cte()}
SELECT * FROM blocks
"""


def q_layout_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-level rollup: lines joined with newlines in reading order —
    the unit the span-classification pipeline consumes."""
    return block_text(reconstruct_blocks(_runs_corpus(spark, sf_dir)))


SQL_LAYOUT_TEXT = f"""
WITH {_sql_layout_cte()}
SELECT doc_id, block_id,
  string_agg(text, chr(10) ORDER BY y0, x0) AS text,
  min(x0) AS x0, min(y0) AS y0, max(x1) AS x1, max(y1) AS y1,
  CAST(count(*) AS BIGINT) AS n_lines,
  max(is_heading) AS has_heading
FROM blocks GROUP BY doc_id, block_id
"""


def q_layout_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-table -> contract spans: text blocks become kind-'text' spans,
    media runs pass through interleaved at their positions (exploded
    form of the input-hint spans array)."""
    from .operators.layout import spans_from_runs
    return spans_from_runs(_runs_media_corpus(spark, sf_dir))


SQL_LAYOUT_SPANS = f"""
WITH {_sql_layout_cte("k % 9 <> 0")},
bt AS (
  SELECT doc_id,
    string_agg(text, chr(10) ORDER BY y0, x0) AS text,
    min(x0) AS x0, min(y0) AS y0
  FROM blocks GROUP BY doc_id, block_id),
units AS (
  SELECT doc_id, y0, x0, 'text' AS kind, text,
    CAST(NULL AS VARCHAR) AS media_ref
  FROM bt
  UNION ALL
  SELECT doc_id, y0, x0, 'media' AS kind, CAST(NULL AS VARCHAR),
    'img:' || CAST(k AS VARCHAR)
  FROM runs WHERE k % 9 = 0)
SELECT doc_id,
  CAST(ROW_NUMBER() OVER (
      PARTITION BY doc_id
      ORDER BY y0, x0, kind, coalesce(text, ''),
               coalesce(media_ref, '')) - 1 AS INT) AS "offset",
  kind, text, media_ref
FROM units
"""


QUERIES_LAYOUT: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "layout_blocks": q_layout_blocks,
    "layout_text": q_layout_text,
    "layout_spans": q_layout_spans,
}

ORACLES_LAYOUT: dict[str, str] = {
    "layout_blocks": SQL_LAYOUT_BLOCKS,
    "layout_text": SQL_LAYOUT_TEXT,
    "layout_spans": SQL_LAYOUT_SPANS,
}
