"""Differential fuzz harness (committed so the campaign is
reproducible — usage: python tools/fuzz_layout.py LO HI): operators/layout.py (Spark windows) vs a DuckDB
SQL twin of the same clustering, on random run corpora that hit the
tolerance boundaries (y diffs of exactly 3.0, gaps of exactly 10.0,
duplicate (y,x,text) rows, single-run docs, media interleaves)."""
import random
import sys

import duckdb
import pandas as pd

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from pdf_extraction_spark.operators.layout import (block_text,
                                                   reconstruct_blocks,
                                                   spans_from_runs)
from pdf_extraction_spark.session import get_spark

WORDS = ["roof", "leak", "a", "b", "x", "attic", "vent", "crack"]
SIZES = [8.0, 10.0, 10.0, 10.0, 12.0, 14.0]

SQL_CTE = """
tr AS (SELECT * FROM runs WHERE media_ref IS NULL),
lc AS (
  SELECT *, CASE WHEN lag(y0) OVER w IS NULL
                   OR y0 - lag(y0) OVER w > 3.0
            THEN 1 ELSE 0 END AS nl
  FROM tr WINDOW w AS (PARTITION BY doc_id ORDER BY y0, x0, text, x1, y1, size)),
lid AS (
  SELECT *, SUM(nl) OVER (PARTITION BY doc_id ORDER BY y0, x0, text, x1, y1, size
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
  FROM tr WHERE size IS NOT NULL GROUP BY doc_id, size
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

SQL_BLOCKS = f"WITH {SQL_CTE} SELECT * FROM blocks"
SQL_SPANS = f"""
WITH {SQL_CTE},
bt AS (
  SELECT doc_id, string_agg(text, chr(10) ORDER BY y0, x0) AS text,
    min(x0) AS x0, min(y0) AS y0
  FROM blocks GROUP BY doc_id, block_id),
units AS (
  SELECT doc_id, y0, x0, 'text' AS kind, text,
    CAST(NULL AS VARCHAR) AS media_ref FROM bt
  UNION ALL
  SELECT doc_id, y0, x0, 'media', CAST(NULL AS VARCHAR), media_ref
  FROM runs WHERE media_ref IS NOT NULL)
SELECT doc_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
       ORDER BY y0, x0, kind, coalesce(text, ''),
                coalesce(media_ref, '')) - 1 AS INT) AS "offset",
  kind, text, media_ref
FROM units
"""


def gen_runs(rng, n_docs=8):
    rows = []
    for d in range(n_docs):
        y = 0.0
        for _ in range(rng.randint(1, 40)):
            # y step: exact-boundary values included
            y += rng.choice([0.0, 0.5, 1.0, 3.0, 3.5, 8.0, 10.0,
                             12.0, 18.0, 30.0])
            x = rng.choice([0.0, 10.0, 50.0, 50.0, 100.0, 7.5])
            w = rng.choice(WORDS)
            media = rng.random() < 0.1
            rows.append((
                d,
                None if media else w,
                x, y, x + rng.choice([5.0, 40.0]),
                y + rng.choice([8.0, 10.0]),
                None if media else rng.choice(SIZES),
                f"img:{len(rows)}" if media else None))
    return rows


def main():
    lo, hi = int(sys.argv[1]), int(sys.argv[2])
    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for seed in range(lo, hi):
        rng = random.Random(1000 + seed)
        rows = gen_runs(rng)
        pdf = pd.DataFrame(rows, columns=[
            "doc_id", "text", "x0", "y0", "x1", "y1", "size",
            "media_ref"])
        sdf = spark.createDataFrame(
            pdf, "doc_id long, text string, x0 double, y0 double, "
                 "x1 double, y1 double, size double, media_ref string")
        con = duckdb.connect()
        con.register("runs", pdf)

        for name, sq, oq in [
            ("blocks",
             reconstruct_blocks(sdf.where("media_ref IS NULL")
                                .drop("media_ref")), SQL_BLOCKS),
            ("spans", spans_from_runs(sdf), SQL_SPANS),
        ]:
            s = sq.toPandas()
            o = con.sql(oq).df()
            key = sorted(s.columns)
            s = s[key].sort_values(key).reset_index(drop=True)
            o = o[key].sort_values(key).reset_index(drop=True)
            if not s.equals(o):
                bad += 1
                print(f"seed {seed} {name}: DIVERGENCE")
                cmp = (s != o) & ~(s.isna() & o.isna())
                idx = cmp.any(axis=1)
                print(s[idx].head(3))
                print(o[idx].head(3))
        if seed % 10 == 0:
            print("seed", seed, "ok" if bad == 0 else f"bad={bad}")
    print("DONE divergences:", bad)


if __name__ == "__main__":
    main()
