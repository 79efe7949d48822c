"""rules.jre(): the python-semantics Java-regex compiler (no Spark)."""

from pdf_extraction_spark import rules


def test_class_rewrites():
    out = rules.jre(r"\b([DINP])\b")
    assert out.startswith("(?Ud)")
    assert r"\b" not in out            # rewritten to lookaround pair
    assert out.count("(?<=") == 2 and out.count("(?<!") == 2
    assert rules.jre(r"[\w\s]+") == \
        "(?Ud)[[\\p{L}\\p{N}_][\\s\\x1c-\\x1f]]+"
    assert rules.jre(r"\S+") == "(?Ud)[^\\s\\x1c-\\x1f]+"


def test_non_class_escapes_pass_through():
    # \x22 (a quote), \. and \d survive untouched; \d relies on (?U)
    assert rules.jre(r"(\d+)\.\x22") == "(?Ud)(\\d+)\\.\\x22"


def test_literals_unchanged_and_cached():
    assert rules.jre("^([IVX]+)") == "(?Ud)^([IVX]+)"
    assert rules.jre("abc") is rules.jre("abc")  # cache hit
