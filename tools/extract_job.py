"""spark-submit job: timed end-to-end extraction over a parquet span corpus.

Usage (master/cores come from spark-submit):

    spark-submit --master local[8] \
        --py-files pdf_extraction_spark.zip \
        tools/extract_job.py --input /tmp/corpus --warmup 512

Prints ONE JSON line: {"cores": ..., "docs": N, "wall_sec": ...,
"docs_per_sec": ..., "spans": M, "spans_per_sec": ...}.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet path, or an Iceberg catalog table "
                         "identifier (catalog.db.table) on a cluster "
                         "with the Iceberg runtime configured")
    ap.add_argument("--warmup", type=int, default=2048)
    ap.add_argument("--plan", default="auto",
                    choices=["auto", "fused", "salted"],
                    help="auto = fused with the giant-doc tail routed "
                         "through the salted plan in the same job "
                         "(span-count dispatch at 500k)")
    ap.add_argument("--stage", default="extract",
                    choices=["extract", "pipeline", "web", "pdf",
                             "pdffile", "ruled", "warc", "docx",
                             "dispatch"],
                    help="extract = fused/salted extraction only; "
                         "pipeline = extraction + full 6-phase enrichment "
                         "(both map-only, the production chain); "
                         "web = crawl HTML corpus (doc_id, html) -> "
                         "html_to_spans bridge -> extraction (the whole "
                         "web-ingest path, still map-only); "
                         "pdf = raw content-stream corpus (doc_id, stream) "
                         "-> pdf_to_spans bridge (tokenize + layout) -> "
                         "extraction; "
                         "pdffile = whole-file corpus (doc_id, pdf binary) "
                         "-> files_to_spans (xref/filter/page-tree parse + "
                         "tokenize + layout) -> extraction; "
                         "ruled = content-stream corpus -> ruled_table_rows "
                         "(path interpretation + grid recovery + cell "
                         "assembly — the standalone S5 table job)")
    ap.add_argument("--walls", type=int, default=6,
                    help="timed steady-state repetitions (best is scored); "
                         "lower for long-corpus scaling runs where one "
                         "wall is already minutes")
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    from pdf_extraction_spark.plans.enrichment import enrich_extracted
    from pdf_extraction_spark.plans.fused import assemble_auto, assemble_fused
    from pdf_extraction_spark.plans.salted import assemble_salted

    if args.plan == "auto":
        def extract(d):
            return assemble_auto(d)
    elif args.plan == "fused":
        def extract(d):
            return assemble_fused(d)
    else:
        def extract(d):
            return assemble_salted(d, chunk_spans=8192, partitions=cores * 3)

    if args.stage == "extract":
        plan = extract
    elif args.stage == "web":
        from pdf_extraction_spark.operators.html import html_to_spans

        def plan(d):
            return extract(html_to_spans(d))
    elif args.stage == "pdf":
        from pdf_extraction_spark.operators.pdfstream import pdf_to_spans

        def plan(d):
            return extract(pdf_to_spans(d))
    elif args.stage == "pdffile":
        from pdf_extraction_spark.operators.pdffile import files_to_spans

        def plan(d):
            return extract(files_to_spans(d))
    elif args.stage == "warc":
        from pdf_extraction_spark.operators.warc import warc_to_spans

        def plan(d):
            return extract(warc_to_spans(d))
    elif args.stage == "docx":
        from pdf_extraction_spark.operators.docx import docx_to_spans

        def plan(d):
            return extract(docx_to_spans(d))
    elif args.stage == "dispatch":
        # the mixed-container capstone: mime-routed html/pdf/docx/pptx
        # payloads -> unified contract spans -> fused extraction
        from pdf_extraction_spark.operators.warc import \
            warc_dispatch_spans

        def plan(d):
            return extract(warc_dispatch_spans(d))
    elif args.stage == "ruled":
        from pdf_extraction_spark.operators.pdfstream import \
            ruled_table_rows

        def plan(d):
            return ruled_table_rows(d)
    else:
        def plan(d):
            return enrich_extracted(extract(d))

    from pdf_extraction_spark.sources.catalog import load_docs
    docs = load_docs(spark, args.input)
    n_docs = docs.count()
    if args.stage == "web":
        from pdf_extraction_spark.operators.html import html_to_spans
        n_spans = html_to_spans(docs) \
            .select(F.sum(F.size("spans"))).first()[0]
    elif args.stage == "pdf":
        from pdf_extraction_spark.operators.pdfstream import pdf_to_spans
        n_spans = pdf_to_spans(docs) \
            .select(F.sum(F.size("spans"))).first()[0]
    elif args.stage == "pdffile":
        from pdf_extraction_spark.operators.pdffile import files_to_spans
        n_spans = files_to_spans(docs) \
            .select(F.sum(F.size("spans"))).first()[0]
    elif args.stage == "warc":
        from pdf_extraction_spark.operators.warc import warc_to_spans
        n_spans = warc_to_spans(docs) \
            .select(F.sum(F.size("spans"))).first()[0]
    elif args.stage == "docx":
        from pdf_extraction_spark.operators.docx import docx_to_spans
        n_spans = docx_to_spans(docs) \
            .select(F.sum(F.size("spans"))).first()[0]
    elif args.stage == "dispatch":
        from pdf_extraction_spark.operators.warc import \
            warc_dispatch_spans
        n_spans = warc_dispatch_spans(docs) \
            .select(F.sum(F.size("spans"))).first()[0]
    elif args.stage == "ruled":
        from pdf_extraction_spark.operators.pdfstream import \
            ruled_table_rows
        n_spans = ruled_table_rows(docs).count()  # table rows
    else:
        n_spans = docs.select(F.sum(F.size("spans"))).first()[0]

    # warm-up: spin up python workers + JIT outside the timed region
    plan(docs.limit(args.warmup)) \
        .write.format("noop").mode("overwrite").save()

    walls = []
    for _ in range(args.walls):
        t0 = time.time()
        plan(docs).write.format("noop").mode("overwrite").save()
        walls.append(time.time() - t0)
    wall = min(walls)  # steady-state throughput

    print(json.dumps({
        "cores": cores, "plan": args.plan, "stage": args.stage,
        "docs": n_docs,
        "spans": int(n_spans), "wall_sec": round(wall, 2),
        "walls": [round(w, 2) for w in walls],
        "docs_per_sec": round(n_docs / wall, 1),
        "spans_per_sec": round(n_spans / wall, 0),
    }))


if __name__ == "__main__":
    main()
