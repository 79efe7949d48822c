"""spark-submit job: training-data ingest — curation filters + exact
dedup + incremental MinHash near-dup against a persisted signature store.

The daily-ingest composition a 100 TB curation pipeline runs: optionally
downsample the new batch (deterministic key-hash — stable under re-runs),
filter it (length / language / stopword-density), gate repetitive docs
(duplicate-line ppm) and scrub PII from the survivors, exact-dedup, then
near-dup against everything already ingested WITHOUT touching the stored
corpus (signature table scanned once, batch broadcast). Re-running with
the same store is incremental by construction.

Identity re-ingestion (same doc_id, same content) is the checkpoint's
job (sources/checkpoint.run_incremental upstream of this), not the
near-dup store's: self-pairs are excluded from candidates, so feeding
the identical batch twice reports the second pass as kept, not as
duplicates of itself.

    spark-submit --master local[8] \
        --py-files pdf_extraction_spark.zip \
        tools/curate_job.py --input /root/testdata/sf0.01/documents.parquet \
        --store /tmp/curation_store

``--input`` also accepts an Iceberg catalog identifier (catalog.db.tbl)
on a cluster with the Iceberg runtime configured; the signature store
follows suit via sources/catalog.get_store.

Prints ONE JSON line with per-stage counts and wall times.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--store", required=True,
                    help="signature-store location: a directory path "
                         "(parquet) or catalog.namespace (Iceberg)")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--max-bucket", type=int, default=10_000,
                    help="hot-bucket guard for the near-dup candidate "
                         "join: LSH buckets larger than this star-join "
                         "around their hub ids instead of all-pairs. "
                         "0 disables (exact candidates — small corpora "
                         "only; one degenerate bucket goes quadratic)")
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--langs", default="en")
    ap.add_argument("--sample-rate", type=float, default=None,
                    help="deterministic key-hash downsample applied "
                         "before anything else (stable under re-runs "
                         "and corpus growth)")
    ap.add_argument("--max-dup-line-ppm", type=int, default=None,
                    help="drop filter survivors whose duplicate-line "
                         "ppm exceeds this (Gopher-style repetition "
                         "gate; zero extra shuffle)")
    ap.add_argument("--max-substr-dup-ppm", type=int, default=None,
                    help="drop filter survivors whose cross-document "
                         "windowed-substring duplication (ExactSubstr "
                         "signal, measured WITHIN this batch) exceeds "
                         "this ppm — catches shared boilerplate "
                         "paragraphs doc-level dedup misses; "
                         "token-linear, three extra hash exchanges")
    ap.add_argument("--scrub-pii", action="store_true",
                    help="redact email/phone/IPv4 in survivor text "
                         "before it reaches the signature store")
    ap.add_argument("--html", action="store_true",
                    help="input is a crawl-page table (doc_id, html"
                         "[, url]): strip boilerplate to main text "
                         "first (operators/html.extract_main_content), "
                         "then run the same curation chain")
    ap.add_argument("--pdf", action="store_true",
                    help="input is a raw content-stream table (doc_id, "
                         "stream): tokenize + layout-parse to text "
                         "first (operators/pdfstream.pdf_to_spans), "
                         "then run the same curation chain")
    ap.add_argument("--pdf-files", action="store_true",
                    help="input is a whole-PDF-file table (doc_id, "
                         "pdf binary): xref/filter/page-tree parse + "
                         "tokenize + layout to text first "
                         "(operators/pdffile.files_to_spans), then run "
                         "the same curation chain")
    ap.add_argument("--deny-hosts", default=None,
                    help="comma-separated denied domains (html mode, "
                         "needs --url-col): drop pages on or under "
                         "these hosts before any content work")
    ap.add_argument("--url-col", default="url")
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    # a bare spark-submit session defaults to 200 shuffle partitions —
    # pure scheduling overhead for the store-sized shuffles here; size
    # from parallelism unless the submitter set it explicitly
    if not spark.sparkContext.getConf().contains(
            "spark.sql.shuffle.partitions"):
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(max(spark.sparkContext.defaultParallelism, 8)))

    from pdf_extraction_spark.operators.curation import (curate_corpus,
                                                         curated)
    from pdf_extraction_spark.operators.dedup import update_signature_store
    from pdf_extraction_spark.operators.pii import scrub_pii
    from pdf_extraction_spark.operators.repetition import line_stats_columns
    from pdf_extraction_spark.operators.sampling import sample_corpus
    from pdf_extraction_spark.sources.catalog import get_store, load_docs

    raw = load_docs(spark, args.input)
    n_denied = 0
    if args.html:
        from pdf_extraction_spark.operators.curation import filter_hosts
        from pdf_extraction_spark.operators.html import \
            extract_main_content

        if args.deny_hosts:
            n_before = raw.count()
            raw = filter_hosts(raw, args.deny_hosts.split(","),
                               url_col=args.url_col)
            n_denied = n_before - raw.count()
        docs = extract_main_content(raw).select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.col("main_text").alias("text"))
    elif args.pdf or args.pdf_files:
        if args.pdf_files:
            from pdf_extraction_spark.operators.pdffile import \
                files_to_spans as _to_spans
        else:
            from pdf_extraction_spark.operators.pdfstream import \
                pdf_to_spans as _to_spans

        docs = _to_spans(raw).select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.array_join(F.transform(
                F.filter("spans", lambda s: s["kind"] == "text"),
                lambda s: s["text"]), "\n").alias("text"))
    else:
        docs = raw.select(
            F.col("doc_id").cast("string").alias("doc_id"), "text")
    store = get_store(spark, args.store)

    n_presample = None
    if args.sample_rate is not None:
        n_presample = docs.count()
        docs = sample_corpus(docs, args.sample_rate)

    t0 = time.time()
    verdicts = curate_corpus(
        docs, min_tokens=args.min_tokens,
        allowed_langs=tuple(args.langs.split(","))).persist()
    by_verdict = {r["verdict"]: r["n"]
                  for r in verdicts.groupBy("verdict")
                  .agg(F.count(F.lit(1)).alias("n")).collect()}
    t_curate = time.time() - t0

    survivors = curated(docs, verdicts=verdicts)
    staged = []  # caches released once the verdicts are checkpointed
    n_repetitive = 0
    if args.max_dup_line_ppm is not None:
        # zero-shuffle array-expression gate (the top-bigram signal
        # needs an aggregation and stays an offline analysis here)
        gated = survivors.withColumns(
            dict(zip(["n_lines", "dup_line_ppm"],
                     line_stats_columns(F.col("text"))))).persist()
        staged.append(gated)
        n_repetitive = gated.where(
            F.col("dup_line_ppm") > args.max_dup_line_ppm).count()
        survivors = gated.where(
            F.col("dup_line_ppm") <= args.max_dup_line_ppm) \
            .drop("n_lines", "dup_line_ppm")
    n_substr = 0
    if args.max_substr_dup_ppm is not None:
        from pdf_extraction_spark.operators.dedup import \
            substring_dup_stats
        flagged = substring_dup_stats(survivors).where(
            F.col("dup_ppm") > args.max_substr_dup_ppm) \
            .select("doc_id").persist()
        staged.append(flagged)
        n_substr = flagged.count()
        survivors = survivors.join(flagged, "doc_id", "left_anti")
    n_pii = 0
    if args.scrub_pii:
        scrubbed = scrub_pii(survivors).persist()
        staged.append(scrubbed)
        n_pii = scrubbed.where("has_pii").count()
        survivors = scrubbed.select("doc_id", "text")
    t0 = time.time()
    near = update_signature_store(
        spark, survivors, store, threshold=args.threshold,
        max_bucket=args.max_bucket if args.max_bucket > 0 else None)
    # near is eagerly localCheckpoint-ed inside update_signature_store,
    # so the survivor-text caches are dead weight from here on — release
    # them before the near-dup counts rather than pinning two copies of
    # the batch text through the rest of the job
    for df in staged:
        df.unpersist()
    n_near_dup = near.where("is_near_duplicate").count()
    n_final = near.count() - n_near_dup
    t_dedup = time.time() - t0
    verdicts.unpersist()

    n_docs = sum(by_verdict.values())
    wall = t_curate + t_dedup
    print(json.dumps({
        "docs": n_docs,
        "denied_hosts_dropped": n_denied,
        "presample_docs": n_presample,
        "by_verdict": by_verdict,
        "repetitive_dropped": n_repetitive,
        "substr_dup_dropped": n_substr,
        "pii_docs_scrubbed": n_pii,
        "near_duplicates_vs_store": n_near_dup,
        "ingested": n_final,
        "wall_sec": round(wall, 2),
        "curate_sec": round(t_curate, 2),
        "dedup_sec": round(t_dedup, 2),
        "docs_per_sec": round(n_docs / wall, 1) if wall else None,
        "store": args.store,
        "store_format": store.format,
    }))


if __name__ == "__main__":
    main()
