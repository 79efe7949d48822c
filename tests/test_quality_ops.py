"""Repetition-quality (operators/repetition.py) and PII-scrubbing
(operators/pii.py) unit tests: hand-built adversarial docs with known
expected values, plus plan shape."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.pii import scrub_pii
from pdf_extraction_spark.operators.repetition import repetition_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_known_values(spark):
    out = {r.doc_id: r for r in repetition_stats(_docs(spark, [
        (1, "a a a a"),                      # "a a" x3 overlapping
        (2, "x\ny\nx\n  \nx"),               # 5 raw, 4 nonempty, 2 dup
        (3, "unique words only here"),
        (4, "solo"),                          # <2 tokens: no bigram
    ])).collect()}
    r1 = out[1]
    assert (r1.n_tokens, r1.top_bigram_count) == (4, 3)
    assert r1.top_bigram_ppm == 3 * 2 * 1_000_000 // 4  # can exceed 1e6
    r2 = out[2]
    assert (r2.n_lines, r2.dup_line_ppm) == (4, 2 * 1_000_000 // 4)
    r3 = out[3]
    assert (r3.dup_line_ppm, r3.top_bigram_count) == (0, 1)
    r4 = out[4]
    assert (r4.n_tokens, r4.top_bigram_count, r4.top_bigram_ppm) == (1, 0, 0)


def test_repetition_case_folds_tokens_not_lines(spark):
    out = repetition_stats(_docs(spark, [(1, "Dog dog\ndog Dog")])).head()
    # bigrams fold case and cross line breaks ("dog dog" x3);
    # lines keep case (no dup)
    assert out.top_bigram_count == 3
    assert out.dup_line_ppm == 0


def test_pii_scrub_redacts_and_counts(spark):
    out = {r.doc_id: r for r in scrub_pii(_docs(spark, [
        (1, "mail a.b-c_1%x@sub.example.co.uk ok"),
        (2, "call 713-555-0101 or 713.555.0102 or 713 555 0103"),
        (3, "host 192.168.0.1 and 10.0.255.3"),
        (4, "clean text, no identifiers at all"),
        (5, "mix bob@x.io at 1.2.3.4 tel 800-555-1234"),
    ])).collect()}
    assert out[1].text == "mail <EMAIL> ok"
    assert (out[1].n_email, out[1].has_pii) == (1, True)
    assert out[2].text == "call <PHONE> or <PHONE> or <PHONE>"
    assert out[2].n_phone == 3
    assert out[3].text == "host <IP> and <IP>"
    assert out[3].n_ipv4 == 2
    assert out[4].text == "clean text, no identifiers at all"
    assert out[4].has_pii is False
    assert out[5].text == "mix <EMAIL> at <IP> tel <PHONE>"
    assert (out[5].n_email, out[5].n_phone, out[5].n_ipv4) == (1, 1, 1)


def test_repetition_no_int32_overflow_on_huge_dup_count(spark):
    # 3000 duplicate lines: dup * 1e6 overflows int32 unless cast to
    # long first — ANSI Spark threw ARITHMETIC_OVERFLOW (review finding)
    out = repetition_stats(_docs(
        spark, [(1, "\n".join(["same line"] * 3000))])).head()
    assert out.n_lines == 3000
    assert out.dup_line_ppm == 2999 * 1_000_000 // 3000


def test_pii_counts_are_tokens_inserted_not_raw_matches(spark):
    # phone-shaped email local part: consumed whole by the email rule,
    # so n_phone must be 0 (counts reconcile with inserted tokens)
    out = scrub_pii(_docs(
        spark, [(1, "call 800-555-1234@mail.com now")])).head()
    assert out.text == "call <EMAIL> now"
    assert (out.n_email, out.n_phone, out.n_ipv4) == (1, 0, 0)


def test_pii_phone_not_eaten_by_ip_rule(spark):
    # dotted phone: 3 dot-groups must become <PHONE>, never a partial <IP>
    out = scrub_pii(_docs(spark, [(1, "x 713.555.0102 y")])).head()
    assert out.text == "x <PHONE> y"
    assert (out.n_phone, out.n_ipv4) == (1, 0)


def test_pii_scrub_zero_shuffle(spark):
    plan = scrub_pii(_docs(spark, [(1, "a")]))._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bpe_pretokenizer_known_pieces(spark):
    """Contractions bind first; space-prefixed letter/digit/punct runs;
    multi-space runs are ONE whitespace piece (documented deviation
    from GPT-2's lookahead rule)."""
    from pdf_extraction_spark.operators.textstats import bpe_tokens_col

    df = spark.createDataFrame(
        [("don't stop, it's 42%  done!",)], "text string")
    pieces = df.select(bpe_tokens_col(F.col("text")).alias("p")) \
        .collect()[0].p
    assert pieces == ["don", "'t", " stop", ",", " it", "'s", " 42",
                      "%", "  ", "done", "!"]


def test_bpe_pretokenizer_tri_engine_parity(spark):
    """The pattern is in the Java/RE2/python common subset: all three
    engines must produce identical pieces on the whitespace zoo and
    punctuation edges (incl. \\x0b, which the engines' \\s classes
    disagree on — the reason the pattern spells its class explicitly)."""
    import re

    import duckdb

    from pdf_extraction_spark.operators.textstats import (
        BPE_TOKEN_PATTERN, bpe_tokens_col)

    samples = ["a\x0bb", "tab\there", "  lead", "trail  ", "x\r\ny",
               "'''", "it'll we've I'm", "a1b2", "3.14", "-5",
               "\x0c\x0b \t", "naive—word", "", "Don'T"]
    sdf = spark.createDataFrame([(s,) for s in samples], "text string")
    spark_out = [r.p for r in
                 sdf.select(bpe_tokens_col(F.col("text")).alias("p"))
                 .collect()]
    con = duckdb.connect()
    pat = BPE_TOKEN_PATTERN.replace("'", "''")
    duck_out = [
        con.sql(f"SELECT regexp_extract_all(?, '{pat}')",
                params=[s]).fetchone()[0]
        for s in samples]
    py_out = [re.findall(BPE_TOKEN_PATTERN, s) and
              [m.group(0) for m in re.finditer(BPE_TOKEN_PATTERN, s)]
              or [] for s in samples]
    assert spark_out == duck_out == py_out


def test_dehyphenate_rules(spark):
    from pyspark.sql import functions as F

    from pdf_extraction_spark.operators.textstats import dehyphenate
    df = spark.createDataFrame(
        [("a", "exam-\nple"),            # plain break: joins
         ("b", "multi-\n  line"),        # indent after break: joins
         ("c", "Sub-\nCommittee"),       # capitalized: untouched
         ("d", "pages 10-\n20"),         # digit range: untouched
         ("e", "so­ft"),            # soft hyphen: dropped
         ("f", "well-known fact"),       # in-line hyphen: untouched
         ("g", None)],
        "doc_id string, text string")
    got = {r.doc_id: r.clean for r in df.select(
        "doc_id", dehyphenate(F.col("text")).alias("clean")).collect()}
    assert got == {"a": "example", "b": "multiline",
                   "c": "Sub-\nCommittee", "d": "pages 10-\n20",
                   "e": "soft", "f": "well-known fact", "g": None}


def test_lexical_commonness_scores_fluency(spark):
    from pdf_extraction_spark.operators.textstats import \
        lexical_commonness
    df = spark.createDataFrame(
        [("a", "the cat sat on the mat"),
         ("b", "the the the the"),
         ("c", "zxqv kjhw pqrs"),     # all-rare gibberish -> 0
         ("d", ""), ("e", None)],
        "doc_id string, text string")
    got = {r.doc_id: (r.n_tokens, r.common_milli)
           for r in lexical_commonness(df).collect()}
    # 'the' appears 6x corpus-wide -> flog2 = 2 per occurrence
    assert got == {"a": (6, 666), "b": (4, 2000), "c": (3, 0),
                   "d": (0, 0), "e": (0, 0)}
    assert got["b"][1] > got["a"][1] > got["c"][1]
