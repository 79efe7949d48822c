"""Structured Streaming: the windowed event aggregation must agree with
its batch twin, and late data beyond the watermark must be handled."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.streaming.events import (windowed_counts,
                                                   windowed_counts_stream)

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events_src")
    batch = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
             .limit(2000))
    batch.write.parquet(src)

    expected = {(r["window_start"], r["event_type"]):
                (r["n_events"], round(r["value_sum"], 6))
                for r in windowed_counts(
                    spark.read.schema(EVENTS_SCHEMA).parquet(src)).collect()}

    q = (windowed_counts_stream(spark, src, EVENTS_SCHEMA)
         .writeStream.format("memory").queryName("win_agg")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        got = {(r["window_start"], r["event_type"]):
               (r["n_events"], round(r["value_sum"], 6))
               for r in spark.sql("select * from win_agg").collect()}
    finally:
        q.stop()

    assert got == expected
    assert len(got) > 0


def test_streaming_extraction_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from pdf_extraction_spark import corpus
    from pdf_extraction_spark.plans.fused import assemble_fused
    from pdf_extraction_spark.streaming.extract import extract_stream

    src = str(tmp_path / "docs")
    corpus.generate_docs(spark, 20, partitions=2).write.parquet(src)

    batch = {r["doc_id"]: (len(r["spans"]), r["summary"]["total_issues"])
             for r in assemble_fused(spark.read.parquet(src)).collect()}

    q = (extract_stream(spark, src)
         .select("doc_id", F.size("spans").alias("n_spans"),
                 F.col("summary.total_issues").alias("n_issues"))
         .writeStream.format("memory").queryName("ext_stream")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = {r["doc_id"]: (r["n_spans"], r["n_issues"])
               for r in spark.sql("select * from ext_stream").collect()}
    finally:
        q.stop()

    assert got == batch
