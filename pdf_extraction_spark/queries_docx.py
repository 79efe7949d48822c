"""Gate queries for the DOCX ingestion layer (``operators/docx.py``):
raw .docx bytes -> zip container -> WordprocessingML parse -> typed
element rows and contract spans.

The Spark side synthesizes a complete .docx per document row with the
deterministic writer (``build_one_docx``: heading style, preserved-
space + bold runs with planted XML entities, a rels-resolved inline
image on doc%3==0, a 2x2 table with an empty and a two-run cell on
doc%4==0, a tab and a line break) and runs the actual parser over the
bytes; the DuckDB oracle computes every expected row in CLOSED FORM
from the same doc_id arithmetic — entity decoding, run concatenation,
tab/break rendering, rels resolution and element ordering are forced
to agree with spec-implied content."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.docx import build_docx_files, docx_rows_from_files, \
    docx_to_spans


def _docx_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_docx_files(d)


def q_docx_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element rows: kind/style/text/media_ref/n_cells in document
    order (zip + OOXML scan as one map-only Arrow pass)."""
    rows = docx_rows_from_files(_docx_files(spark, sf_dir))
    return rows.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "el_idx", "kind", "style", "text", "media_ref", "n_cells") \
        .orderBy("doc_id", "el_idx")


_SQL_TEXT = """
WITH b AS (
  SELECT doc_id, COALESCE(text, '') AS t,
    CAST(doc_id % 3 = 0 AS INT) AS i3,
    CAST(doc_id % 4 = 0 AS INT) AS i4
  FROM documents),
u AS (
  SELECT doc_id, 0 AS el_idx, 'heading' AS kind,
    'Heading1' AS style, 'Doc ' || doc_id || ' title' AS text,
    '' AS media_ref, 0 AS n_cells FROM b
  UNION ALL
  SELECT doc_id, 1, 'para', '',
    t || ' bold' || doc_id || ' & x <y>', '', 0 FROM b
  UNION ALL
  SELECT doc_id, 2, 'image', '', '', 'word/media/image1.png', 0
  FROM b WHERE i3 = 1
  UNION ALL
  SELECT doc_id, 2 + i3, 'table_row', '',
    'c' || doc_id || 'a | c' || doc_id || 'b', '', 2
  FROM b WHERE i4 = 1
  UNION ALL
  SELECT doc_id, 3 + i3, 'table_row', '',
    'c' || doc_id || 'c | ', '', 2 FROM b WHERE i4 = 1
  UNION ALL
  SELECT doc_id, 2 + i3 + 2 * i4, 'para', '',
    'tail ' || doc_id || chr(9) || 'col' || chr(10) || 'next line',
    '', 0 FROM b)
SELECT doc_id, CAST(el_idx AS INT) AS el_idx, kind, style, text,
  media_ref, CAST(n_cells AS INT) AS n_cells
FROM u ORDER BY doc_id, el_idx
"""


def q_docx_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract span bridge: text spans per element, media spans for
    rels-resolved inline images, gapless document-order offsets."""
    spans = docx_to_spans(_docx_files(spark, sf_dir))
    e = spans.select(F.col("doc_id").cast("long").alias("doc_id"),
                     F.explode("spans").alias("s"))
    return e.select(
        "doc_id", F.col("s.offset").cast("int").alias("offset"),
        F.col("s.kind").alias("kind"), F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref")) \
        .orderBy("doc_id", "offset")


_SQL_SPANS = """
WITH b AS (
  SELECT doc_id, COALESCE(text, '') AS t,
    CAST(doc_id % 3 = 0 AS INT) AS i3,
    CAST(doc_id % 4 = 0 AS INT) AS i4
  FROM documents),
u AS (
  SELECT doc_id, 0 AS off, 'text' AS kind,
    'Doc ' || doc_id || ' title' AS text, '' AS media_ref FROM b
  UNION ALL
  SELECT doc_id, 1, 'text',
    t || ' bold' || doc_id || ' & x <y>', '' FROM b
  UNION ALL
  SELECT doc_id, 2, 'media', '', 'word/media/image1.png'
  FROM b WHERE i3 = 1
  UNION ALL
  SELECT doc_id, 2 + i3, 'text',
    'c' || doc_id || 'a | c' || doc_id || 'b', '' FROM b WHERE i4 = 1
  UNION ALL
  SELECT doc_id, 3 + i3, 'text', 'c' || doc_id || 'c | ', ''
  FROM b WHERE i4 = 1
  UNION ALL
  SELECT doc_id, 2 + i3 + 2 * i4, 'text',
    'tail ' || doc_id || chr(9) || 'col' || chr(10) || 'next line',
    '' FROM b)
SELECT doc_id, CAST(off AS INT) AS "offset", kind, text, media_ref
FROM u ORDER BY doc_id, "offset"
"""


QUERIES_DOCX: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "docx_text": q_docx_text,
    "docx_spans": q_docx_spans,
}

ORACLES_DOCX: dict[str, str] = {
    "docx_text": _SQL_TEXT,
    "docx_spans": _SQL_SPANS,
}


def _pptx_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.pptx import build_pptx_files
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_pptx_files(d)


def q_pptx_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPTX element rows in DECK order: title/body/image per slide,
    with the sldIdLst->rels chain load-bearing (doc%4==2 decks list
    slide 2 first, so part numbering and zip order both disagree with
    the expected output)."""
    from .operators.pptx import pptx_rows_from_files
    rows = pptx_rows_from_files(_pptx_files(spark, sf_dir))
    return rows.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "slide", "el_idx", "kind", "text", "media_ref") \
        .orderBy("doc_id", "el_idx")


_SQL_PPTX_TEXT = """
WITH b AS (
  SELECT doc_id, COALESCE(text, '') AS t,
    CAST(doc_id % 3 = 0 AS INT) AS img,
    CAST(doc_id % 2 = 0 AS INT) AS two,
    CAST(doc_id % 4 = 2 AS INT) AS rev
  FROM documents),
u AS (
  SELECT doc_id, 1 + rev AS slide, 2 * rev + 0 AS el,
    'title' AS kind, 'Deck ' || doc_id || ' title' AS text,
    '' AS mr FROM b
  UNION ALL
  SELECT doc_id, 1 + rev, 2 * rev + 1, 'body',
    t || ' s1p' || doc_id || ' & a <b>', '' FROM b
  UNION ALL
  SELECT doc_id, 1 + rev, 2 * rev + 2, 'image', '',
    'ppt/media/image1.png' FROM b WHERE img = 1
  UNION ALL
  SELECT doc_id, 2 - rev,
    CASE WHEN rev = 1 THEN 0 ELSE 2 + img END, 'body',
    's2 ' || doc_id, '' FROM b WHERE two = 1
  UNION ALL
  SELECT doc_id, 2 - rev,
    CASE WHEN rev = 1 THEN 1 ELSE 3 + img END, 'body',
    'second half', '' FROM b WHERE two = 1)
SELECT doc_id, CAST(slide AS INT) AS slide, CAST(el AS INT) AS el_idx,
  kind, text, mr AS media_ref
FROM u ORDER BY doc_id, el_idx
"""


def q_pptx_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract span bridge for slide decks: text spans per
    title/body paragraph, media spans for slide images, deck-order
    gapless offsets."""
    from .operators.pptx import pptx_to_spans
    spans = pptx_to_spans(_pptx_files(spark, sf_dir))
    e = spans.select(F.col("doc_id").cast("long").alias("doc_id"),
                     F.explode("spans").alias("s"))
    return e.select(
        "doc_id", F.col("s.offset").cast("int").alias("offset"),
        F.col("s.kind").alias("kind"), F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref")) \
        .orderBy("doc_id", "offset")


_SQL_PPTX_SPANS = """
WITH b AS (
  SELECT doc_id, COALESCE(text, '') AS t,
    CAST(doc_id % 3 = 0 AS INT) AS img,
    CAST(doc_id % 2 = 0 AS INT) AS two,
    CAST(doc_id % 4 = 2 AS INT) AS rev
  FROM documents),
u AS (
  SELECT doc_id, 2 * rev + 0 AS off, 'text' AS kind,
    'Deck ' || doc_id || ' title' AS text, '' AS mr FROM b
  UNION ALL
  SELECT doc_id, 2 * rev + 1, 'text',
    t || ' s1p' || doc_id || ' & a <b>', '' FROM b
  UNION ALL
  SELECT doc_id, 2 * rev + 2, 'media', '', 'ppt/media/image1.png'
  FROM b WHERE img = 1
  UNION ALL
  SELECT doc_id, CASE WHEN rev = 1 THEN 0 ELSE 2 + img END, 'text',
    's2 ' || doc_id, '' FROM b WHERE two = 1
  UNION ALL
  SELECT doc_id, CASE WHEN rev = 1 THEN 1 ELSE 3 + img END, 'text',
    'second half', '' FROM b WHERE two = 1)
SELECT doc_id, CAST(off AS INT) AS "offset", kind, text,
  mr AS media_ref
FROM u ORDER BY doc_id, "offset"
"""


QUERIES_DOCX["pptx_text"] = q_pptx_text
QUERIES_DOCX["pptx_spans"] = q_pptx_spans
ORACLES_DOCX["pptx_text"] = _SQL_PPTX_TEXT
ORACLES_DOCX["pptx_spans"] = _SQL_PPTX_SPANS


def _xlsx_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.xlsx import build_xlsx_files
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_xlsx_files(d)


def q_xlsx_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XLSX element rows in WORKBOOK order: sheet names + ' | '-joined
    cell rows, with shared-string indirection, rich-text <si> runs,
    inline/formula strings, raw numerics, a value-less cell, and the
    workbook-rels order resolution all value-gated (doc%4==2
    workbooks list sheet 2 first with non-sequential rIds)."""
    from .operators.xlsx import xlsx_rows_from_files
    rows = xlsx_rows_from_files(_xlsx_files(spark, sf_dir))
    return rows.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "sheet", "el_idx", "kind", "text", "n_cells") \
        .orderBy("doc_id", "el_idx")


_SQL_XLSX_TEXT = """
WITH b AS (
  SELECT doc_id, COALESCE(text, '') AS t,
    CAST(doc_id % 2 = 0 AS INT) AS two,
    CAST(doc_id % 4 = 2 AS INT) AS rev
  FROM documents),
u AS (
  SELECT doc_id, 1 + rev AS sheet, 2 * rev + 0 AS el,
    'sheet' AS kind, 'Alpha ' || doc_id AS text, 0 AS n_cells FROM b
  UNION ALL
  SELECT doc_id, 1 + rev, 2 * rev + 1, 'row',
    'Doc ' || doc_id || ' head | inl ' || doc_id, 2 FROM b
  UNION ALL
  SELECT doc_id, 1 + rev, 2 * rev + 2, 'row',
    CAST(10 + doc_id % 90 AS VARCHAR) || ' |  | ' || substr(t, 1, 40)
      || ' & x <y>', 3 FROM b
  UNION ALL
  SELECT doc_id, 2 - rev, CASE WHEN rev = 1 THEN 0 ELSE 3 END,
    'sheet', 'Beta', 0 FROM b WHERE two = 1
  UNION ALL
  SELECT doc_id, 2 - rev, CASE WHEN rev = 1 THEN 1 ELSE 4 END,
    'row', 'mark' || doc_id || ' | f' || doc_id, 2 FROM b
  WHERE two = 1)
SELECT doc_id, CAST(sheet AS INT) AS sheet, CAST(el AS INT) AS el_idx,
  kind, text, CAST(n_cells AS INT) AS n_cells
FROM u ORDER BY doc_id, el_idx
"""


def q_xlsx_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract span bridge for spreadsheets: sheet names and row
    texts as text spans in workbook order, gapless offsets."""
    from .operators.xlsx import xlsx_to_spans
    spans = xlsx_to_spans(_xlsx_files(spark, sf_dir))
    e = spans.select(F.col("doc_id").cast("long").alias("doc_id"),
                     F.explode("spans").alias("s"))
    return e.select(
        "doc_id", F.col("s.offset").cast("int").alias("offset"),
        F.col("s.kind").alias("kind"), F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref")) \
        .orderBy("doc_id", "offset")


_SQL_XLSX_SPANS = """
WITH b AS (
  SELECT doc_id, COALESCE(text, '') AS t,
    CAST(doc_id % 2 = 0 AS INT) AS two,
    CAST(doc_id % 4 = 2 AS INT) AS rev
  FROM documents),
u AS (
  SELECT doc_id, 2 * rev + 0 AS off, 'Alpha ' || doc_id AS text
  FROM b
  UNION ALL
  SELECT doc_id, 2 * rev + 1,
    'Doc ' || doc_id || ' head | inl ' || doc_id FROM b
  UNION ALL
  SELECT doc_id, 2 * rev + 2,
    CAST(10 + doc_id % 90 AS VARCHAR) || ' |  | ' || substr(t, 1, 40)
      || ' & x <y>' FROM b
  UNION ALL
  SELECT doc_id, CASE WHEN rev = 1 THEN 0 ELSE 3 END, 'Beta'
  FROM b WHERE two = 1
  UNION ALL
  SELECT doc_id, CASE WHEN rev = 1 THEN 1 ELSE 4 END,
    'mark' || doc_id || ' | f' || doc_id FROM b WHERE two = 1)
SELECT doc_id, CAST(off AS INT) AS "offset", 'text' AS kind, text,
  '' AS media_ref
FROM u ORDER BY doc_id, "offset"
"""


QUERIES_DOCX["xlsx_text"] = q_xlsx_text
QUERIES_DOCX["xlsx_spans"] = q_xlsx_spans
ORACLES_DOCX["xlsx_text"] = _SQL_XLSX_TEXT
ORACLES_DOCX["xlsx_spans"] = _SQL_XLSX_SPANS


def _epub_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.epub import build_epub_files
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_epub_files(d)


def q_epub_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPUB -> contract spans: container.xml -> OPF -> spine
    resolution (rotated spine with non-sequential manifest ids on
    doc%4==2 — filename order must NOT win), each chapter through the
    gated html block classifier, chapters concatenated in spine order
    with globally gapless offsets."""
    from .operators.epub import epub_to_spans
    spans = epub_to_spans(_epub_files(spark, sf_dir))
    e = spans.select(F.col("doc_id").cast("long").alias("doc_id"),
                     F.explode("spans").alias("s"))
    return e.select(
        "doc_id", F.col("s.offset").cast("int").alias("offset"),
        F.col("s.kind").alias("kind"), F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref")) \
        .orderBy("doc_id", "offset")


def _sql_epub_spans() -> str:
    from .queries_html import _WS_SQL

    # per-(doc, chapter) spine POSITION in closed form: rev implies
    # doc even (c2=1); rotation puts the last chapter (3 if present,
    # else 2) first
    return f"""
WITH b AS (
  SELECT doc_id, COALESCE(text, '') AS t,
    CAST(doc_id % 2 = 0 AS INT) AS c2,
    CAST(doc_id % 3 = 0 AS INT) AS c3,
    CAST(doc_id % 4 = 2 AS INT) AS rev
  FROM documents),
ch AS (
  SELECT doc_id, t, 1 AS k,
    CASE WHEN rev = 1 THEN 2 ELSE 1 END AS pos FROM b
  UNION ALL
  SELECT doc_id, t, 2,
    CASE WHEN rev = 1 AND c3 = 1 THEN 3
         WHEN rev = 1 THEN 1 ELSE 2 END FROM b WHERE c2 = 1
  UNION ALL
  SELECT doc_id, t, 3,
    CASE WHEN rev = 1 THEN 1 ELSE 2 + c2 END FROM b WHERE c3 = 1),
sp AS (
  SELECT doc_id, 4 * (pos - 1) + 0 AS off, 'text' AS kind,
    'Heading ' || k || ' of ' || doc_id
      || ' spanning enough characters' AS text, '' AS mr FROM ch
  UNION ALL
  SELECT doc_id, 4 * (pos - 1) + 1, 'text',
    trim(regexp_replace(
      substr(t, 40 * (k - 1) + 1, 80) || ' chapter ' || k
        || ' body of doc ' || doc_id
        || ' with padding past the minimum',
      '{_WS_SQL}', ' ', 'g')), '' FROM ch
  UNION ALL
  SELECT doc_id, 4 * (pos - 1) + 2, 'media', '',
    'img://' || doc_id || '/' || k FROM ch
  UNION ALL
  SELECT doc_id, 4 * (pos - 1) + 3, 'text',
    'Closing paragraph ' || k || ' of document ' || doc_id
      || ' with sufficient length for the gate', '' FROM ch)
SELECT doc_id, CAST(off AS INT) AS "offset", kind, text,
  mr AS media_ref
FROM sp ORDER BY doc_id, "offset"
"""


QUERIES_DOCX["epub_spans"] = q_epub_spans
ORACLES_DOCX["epub_spans"] = _sql_epub_spans()
