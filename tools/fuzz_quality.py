"""Differential fuzz harness (committed so the campaign is
reproducible — usage: python tools/fuzz_quality.py LO HI): operators/pii.py + operators/repetition.py (Spark)
vs their DuckDB SQL twins on random adversarial ASCII corpora.

Corpus generator biases toward PII-shaped fragments (digit groups, dots,
dashes, @, TLD-ish tails) and repetition-shaped structure (newlines,
repeated lines/tokens, blank/space-only lines) so both rule sets fire
constantly rather than never.
"""
import random
import sys

import duckdb
import pandas as pd

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from pdf_extraction_spark.operators.pii import PII_RULES, scrub_pii
from pdf_extraction_spark.operators.repetition import repetition_stats
from pdf_extraction_spark.session import get_spark

WORDS = ["mail", "call", "now", "user", "x", "example", "com", "co",
         "net", "a", "b", "dog", "table", "spark", "10", "713", "555",
         "0101", "192", "168", "0", "1", "%", "+", "_", ".", "-", "@",
         "..", "@@", "a@b", "1.2", "1.2.3", "1.2.3.4", "1.2.3.4.5",
         "123-456-7890", "123.456.7890", "123 456 7890", "12-34-5678",
         "a@b.cd", "a@b.c", "x@y.museum", "-a@b.cd-", ".a@b.cd.",
         "999.999.999.999", "00.00.00.00", "1...2", "@.", "a-b.c@d.ee"]


def gen_text(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randint(1, 60)):
        r = rng.random()
        if r < 0.08:
            parts.append("\n")
        elif r < 0.12:
            parts.append("\n \n")
        else:
            parts.append(rng.choice(WORDS))
        if rng.random() < 0.85:
            parts.append(rng.choice([" ", " ", "  ", "\t"]))
    return "".join(parts)


def sql_pii() -> str:
    scrubbed = "text"
    counts = []
    for name, pat, token in PII_RULES:
        counts.append(
            f"CAST(len(regexp_extract_all({scrubbed}, '{pat}'))"
            f" AS BIGINT) AS n_{name}")
        scrubbed = f"regexp_replace({scrubbed}, '{pat}', '{token}', 'g')"
    return (f"SELECT doc_id, {', '.join(counts)}, {scrubbed} AS text "
            "FROM corpus ORDER BY doc_id")


SQL_REP = r"""
WITH tok AS (
  SELECT doc_id,
    string_split_regex(trim(lower(text)), '\s+') AS toks,
    list_filter(list_transform(string_split(text, chr(10)),
                               s -> trim(s)), s -> s <> '') AS lines
  FROM corpus),
bg AS (
  SELECT doc_id, toks, lines,
    [toks[i] || ' ' || toks[i + 1] FOR i IN range(1, len(toks))] AS bgs
  FROM tok),
top AS (
  SELECT doc_id, toks, lines,
    coalesce(list_max(list_transform(
      list_distinct(bgs), b -> len(list_filter(bgs, x -> x = b)))), 0)
      AS top_c
  FROM bg)
SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(lines) AS BIGINT) AS n_lines,
  CASE WHEN len(lines) > 0 THEN CAST(FLOOR(
      (len(lines) - len(list_distinct(lines))) * 1000000.0 / len(lines))
    AS BIGINT) ELSE 0 END AS dup_line_ppm,
  CAST(top_c AS BIGINT) AS top_bigram_count,
  CASE WHEN len(toks) > 0 THEN CAST(FLOOR(
      top_c * 2 * 1000000.0 / len(toks)) AS BIGINT) ELSE 0 END
    AS top_bigram_ppm
FROM top ORDER BY doc_id
"""


def main() -> None:
    seeds = range(int(sys.argv[1]), int(sys.argv[2]))
    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for seed in seeds:
        rng = random.Random(seed)
        rows = [(i, gen_text(rng)) for i in range(30)]
        pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
        sdf = spark.createDataFrame(pdf.assign(
            doc_id=pdf.doc_id.astype("int64")))
        con = duckdb.connect()
        con.register("corpus", pdf)

        s1 = scrub_pii(sdf).select(
            "doc_id", "n_email", "n_phone", "n_ipv4", "text") \
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        o1 = con.sql(sql_pii()).df()[s1.columns]
        if not s1.equals(o1):
            bad += 1
            print(f"seed {seed}: PII DIVERGENCE")
            for c in s1.columns:
                m = s1[c] != o1[c]
                if m.any():
                    i = m.idxmax()
                    print(" col", c, "row", i,
                          repr(rows[i][1])[:200],
                          "spark", repr(s1[c][i])[:120],
                          "oracle", repr(o1[c][i])[:120])

        s2 = repetition_stats(sdf).toPandas() \
            .sort_values("doc_id").reset_index(drop=True)
        o2 = con.sql(SQL_REP).df()[s2.columns]
        if not s2.equals(o2):
            bad += 1
            print(f"seed {seed}: REPETITION DIVERGENCE")
            for c in s2.columns:
                m = s2[c] != o2[c]
                if m.any():
                    i = m.idxmax()
                    print(" col", c, "row", i, repr(rows[i][1])[:200],
                          "spark", s2[c][i], "oracle", o2[c][i])
        if seed % 10 == 0:
            print("seed", seed, "ok" if bad == 0 else f"bad={bad}")
    print("DONE", "divergences:", bad)


if __name__ == "__main__":
    main()
