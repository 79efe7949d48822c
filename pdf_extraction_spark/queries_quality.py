"""Gate queries for the repetition-quality and PII-scrubbing operators
(``operators/repetition.py``, ``operators/pii.py``).

Derived corpora (same dyadic-arithmetic contract as the other gate
modules): duplicate lines and PII strings are injected deterministically
from ``doc_id``, rendered identically into Spark columns and DuckDB SQL,
so every branch (dup lines present/absent, each PII rule, clean docs)
fires and both engines see byte-identical input.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.pii import PII_RULES, scrub_pii
from .operators.repetition import repetition_stats


# ---------------------------------------------------------------------------
# repetition stats over a duplicate-line-injected corpus
# ---------------------------------------------------------------------------

def _rep_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = F.col("text").substr(
        F.lit(1), F.lit(40) + F.pmod(F.col("doc_id"), F.lit(3)) * 7)
    text2 = F.concat(
        F.col("text"), F.lit("\n"), base, F.lit("\n"), base,
        F.when(F.pmod(F.col("doc_id"), F.lit(4)) == 0,
               F.concat(F.lit("\n"), base)).otherwise(F.lit("")))
    return d.select("doc_id", text2.alias("text"))


SQL_REP_TEXT = ("text || chr(10) || substr(text, 1, 40 + (doc_id % 3) * 7)"
                " || chr(10) || substr(text, 1, 40 + (doc_id % 3) * 7)"
                " || CASE WHEN doc_id % 4 = 0 THEN chr(10) ||"
                " substr(text, 1, 40 + (doc_id % 3) * 7) ELSE '' END")


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-family repetition signals (dup-line ppm, top-bigram share)
    over a corpus with injected duplicate lines."""
    return repetition_stats(_rep_corpus(spark, sf_dir))


SQL_REPETITION = rf"""
WITH d AS (SELECT doc_id, {SQL_REP_TEXT} AS text FROM documents),
tok AS (
  SELECT doc_id,
    string_split_regex(trim(lower(text)), '\s+') AS toks,
    list_filter(list_transform(string_split(text, chr(10)),
                               s -> trim(s)), s -> s <> '') AS lines
  FROM d),
bg AS (
  SELECT doc_id, toks, lines,
    [toks[i] || ' ' || toks[i + 1] FOR i IN range(1, len(toks))] AS bgs
  FROM tok),
top AS (
  SELECT doc_id, toks, lines,
    coalesce(list_max(list_transform(
      list_distinct(bgs),
      b -> len(list_filter(bgs, x -> x = b)))), 0) AS top_c
  FROM bg)
SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(lines) AS BIGINT) AS n_lines,
  CASE WHEN len(lines) > 0 THEN CAST(FLOOR(
      (len(lines) - len(list_distinct(lines))) * 1000000.0 / len(lines))
    AS BIGINT) ELSE 0 END AS dup_line_ppm,
  CAST(top_c AS BIGINT) AS top_bigram_count,
  CASE WHEN len(toks) > 0 THEN CAST(FLOOR(
      top_c * 2 * 1000000.0 / len(toks)) AS BIGINT)
    ELSE 0 END AS top_bigram_ppm
FROM top
"""


# ---------------------------------------------------------------------------
# PII scrub over an injected-PII corpus
# ---------------------------------------------------------------------------

def _pii_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    k = F.col("doc_id")
    email = F.when(F.pmod(k, F.lit(3)) == 0, F.concat(
        F.lit(" contact user."), k.cast("string"),
        F.lit("@mail.example.com now"))).otherwise(F.lit(""))
    phone = F.when(F.pmod(k, F.lit(5)) == 0, F.concat(
        F.lit(" call 713-555-"),
        F.lpad(F.pmod(k, F.lit(10000)).cast("string"), 4, "0"),
        F.lit(" today"))).otherwise(F.lit(""))
    ip = F.when(F.pmod(k, F.lit(7)) == 0, F.concat(
        F.lit(" from 10.0."), F.pmod(k, F.lit(256)).cast("string"),
        F.lit("."), F.pmod(k * 3, F.lit(256)).cast("string"),
        F.lit(" logged"))).otherwise(F.lit(""))
    return d.select("doc_id",
                    F.concat(F.col("text"), email, phone, ip).alias("text"))


SQL_PII_TEXT = (
    "text"
    " || CASE WHEN doc_id % 3 = 0 THEN ' contact user.' ||"
    " CAST(doc_id AS VARCHAR) || '@mail.example.com now' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' call 713-555-' ||"
    " lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.' ||"
    " CAST(doc_id % 256 AS VARCHAR) || '.' ||"
    " CAST((doc_id * 3) % 256 AS VARCHAR) || ' logged' ELSE '' END")


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-mail/phone/IPv4 detection + redaction over injected PII; the
    scrubbed text itself is part of the compared output."""
    return scrub_pii(_pii_corpus(spark, sf_dir)) \
        .select("doc_id", "text", "n_email", "n_phone", "n_ipv4",
                "has_pii")


def _sql_pii_scrub() -> str:
    scrubbed = "text"
    counts = []
    for name, pat, token in PII_RULES:
        # each count on the text after the EARLIER rules' redactions,
        # mirroring pii_count_columns (n_<rule> = tokens inserted)
        counts.append(
            f"CAST(len(regexp_extract_all({scrubbed}, '{pat}'))"
            f" AS BIGINT) AS n_{name}")
        scrubbed = f"regexp_replace({scrubbed}, '{pat}', '{token}', 'g')"
    return f"""
WITH d AS (SELECT doc_id, {SQL_PII_TEXT} AS text FROM documents),
c AS (SELECT doc_id, {', '.join(counts)}, {scrubbed} AS text FROM d)
SELECT doc_id, text, n_email, n_phone, n_ipv4,
  (n_email + n_phone + n_ipv4) > 0 AS has_pii
FROM c
"""


# planted line-break corpus: two joinable lowercase breaks, one
# capitalized compound that must KEEP its hyphen, a digit range, a
# soft hyphen, and an indent after one break
_DEHYPH_TEXT = (
    "substr(t, 1, 20) || 'exam-' || chr(10) || 'ple ' "
    "|| substr(t, 21, 20) || ' multi-' || chr(10) || '  line ' "
    "|| 'Sub-' || chr(10) || 'Committee 10-' || chr(10) || '20 ' "
    "|| 'so' || chr(173) || 'ft ' || substr(t, 41, 20)")


def q_dehyphenate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-break dehyphenation (operators/textstats.py dehyphenate):
    lowercase hyphen-newline breaks re-join, soft hyphens drop,
    capitalized compounds and digit ranges keep their characters."""
    from .operators.textstats import dehyphenate

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = d.select(
        "doc_id", F.expr("COALESCE(text, '')").alias("t")) \
        .select("doc_id", F.expr(_DEHYPH_TEXT).alias("text"))
    return planted.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        dehyphenate(F.col("text")).alias("clean")).orderBy("doc_id")


def _sql_dehyphenate() -> str:
    return f"""
WITH d AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents),
p AS (SELECT doc_id, {_DEHYPH_TEXT} AS text FROM d)
SELECT doc_id,
  regexp_replace(replace(text, chr(173), ''),
                 '([a-z])-\n[ \t]*([a-z])', '\\1\\2', 'g') AS clean
FROM p ORDER BY doc_id
"""


def q_lexical_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics lexical quality (operators/textstats.py
    lexical_commonness — the CCNet perplexity-filter idea with the
    corpus as its own LM; integer-exact flog2 scoring)."""
    from .operators.textstats import lexical_commonness

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return lexical_commonness(d).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_tokens", "common_milli").orderBy("doc_id")


SQL_LEXICAL_QUALITY = """
WITH ex AS (SELECT doc_id, unnest(string_split_regex(
         trim(COALESCE(text, '')), '\\s+')) AS tok FROM documents),
freq AS (SELECT tok, length(bin(count(*))) - 1 AS flog2
         FROM ex WHERE tok <> '' GROUP BY tok HAVING count(*) >= 2),
sc AS (SELECT e.doc_id, e.tok, f.flog2
       FROM ex e LEFT JOIN freq f ON e.tok = f.tok),
o AS (SELECT doc_id,
        count(CASE WHEN tok <> '' THEN 1 END) AS n_tokens,
        COALESCE(sum(flog2), 0) AS s FROM sc GROUP BY doc_id)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
  CASE WHEN n_tokens > 0
    THEN cast(floor(s * 1000 / n_tokens) as bigint)
    ELSE CAST(0 AS BIGINT) END AS common_milli
FROM o ORDER BY doc_id
"""


QUERIES_QUALITY: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "repetition": q_repetition,
    "pii_scrub": q_pii_scrub,
    "dehyphenate": q_dehyphenate,
    "lexical_quality": q_lexical_quality,
}

ORACLES_QUALITY: dict[str, str] = {
    "repetition": SQL_REPETITION,
    "pii_scrub": _sql_pii_scrub(),
    "dehyphenate": _sql_dehyphenate(),
    "lexical_quality": SQL_LEXICAL_QUALITY,
}
