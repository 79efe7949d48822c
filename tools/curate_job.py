"""spark-submit job: training-data ingest — curation filters + exact
dedup + incremental MinHash near-dup against a persisted signature store.

The daily-ingest composition a 100 TB curation pipeline runs: filter the
new batch (length / language / stopword-density), exact-dedup the
survivors, then near-dup them against everything already ingested
WITHOUT touching the stored corpus (signature table scanned once, batch
broadcast). Re-running with the same store is incremental by
construction.

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
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--langs", default="en")
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
    from pdf_extraction_spark.sources.catalog import get_store, load_docs

    docs = load_docs(spark, args.input).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text")
    store = get_store(spark, args.store)

    t0 = time.time()
    verdicts = curate_corpus(
        docs, min_tokens=args.min_tokens,
        allowed_langs=tuple(args.langs.split(","))).persist()
    by_verdict = {r["verdict"]: r["n"]
                  for r in verdicts.groupBy("verdict")
                  .agg(F.count(F.lit(1)).alias("n")).collect()}
    t_curate = time.time() - t0

    survivors = curated(docs, verdicts=verdicts)
    t0 = time.time()
    near = update_signature_store(spark, survivors, store,
                                  threshold=args.threshold)
    n_near_dup = near.where("is_near_duplicate").count()
    n_final = near.count() - n_near_dup
    t_dedup = time.time() - t0
    verdicts.unpersist()

    n_docs = sum(by_verdict.values())
    wall = t_curate + t_dedup
    print(json.dumps({
        "docs": n_docs,
        "by_verdict": by_verdict,
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
