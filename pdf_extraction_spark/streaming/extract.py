"""Streaming extraction: the fused plan over a document stream.

The fused extraction (plans/fused.py) is a stateless map over document
rows, so the SAME plan runs unchanged as a Structured Streaming query —
new span-table files (or a Kafka/Iceberg CDC source) flow through
mapInArrow and append structured rows continuously. No state store is
needed: all extraction state is document-local.

At scale this is the ingestion path that replaces the reference's
one-file-at-a-time loop: micro-batches of new docs are extracted exactly
once (checkpointLocation gives the resume guarantee the batch path gets
from sources/checkpoint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.fused import assemble_fused

DOCS_SCHEMA = ("doc_id string, spans array<struct<kind:string,text:string,"
               "media_ref:string,offset:int>>")


def extract_stream(spark: SparkSession, source_dir: str,
                   schema: str = DOCS_SCHEMA,
                   max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source document stream -> streaming extraction output."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return assemble_fused(reader.parquet(source_dir))


HTML_SCHEMA = "doc_id string, html string"


def web_extract_stream(spark: SparkSession, source_dir: str,
                       schema: str = HTML_SCHEMA,
                       max_files_per_trigger: int | None = None
                       ) -> DataFrame:
    """Crawl-HTML stream -> contract spans -> streaming extraction.

    html_to_spans (operators/html.py) is a stateless narrow projection,
    so the whole web-ingest path — boilerplate strip, media-span
    bridging, fused extraction — runs unchanged as ONE Structured
    Streaming query: new page files (or a Kafka/Iceberg-CDC source)
    flow through the same zero-shuffle plan the batch job uses, with
    checkpointLocation supplying exactly-once resume.  This is the
    continuous-ingest twin of the batch crawl pipeline, same operators,
    no reimplementation."""
    from ..operators.html import html_to_spans

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return assemble_fused(html_to_spans(reader.parquet(source_dir)))


PDF_SCHEMA = "doc_id string, stream string"


def pdf_extract_stream(spark: SparkSession, source_dir: str,
                       out_path: str, checkpoint_dir: str,
                       schema: str = PDF_SCHEMA,
                       max_files_per_trigger: int | None = None,
                       available_now: bool = True,
                       with_fonts: bool = False):
    """Raw content-stream corpus -> continuous extraction, via
    ``foreachBatch``.

    Unlike the web path (html_to_spans is a stateless projection, so it
    streams as ONE continuous query), the pdf bridge's layout stage is
    per-doc window clustering — unsupported inside a streaming plan.
    But every document arrives WHOLE in its row, so the computation is
    micro-batch-local with no cross-batch state: ``foreachBatch`` runs
    the IDENTICAL batch plan (tokenize -> layout -> assemble_fused) per
    trigger, which is Spark's documented pattern for reusing
    batch-complete logic.  ``checkpointLocation`` makes source offsets
    exactly-once; the parquet append sink is at-least-once under a
    mid-write crash — on a cluster, point the sink at an Iceberg table
    (sources/catalog.IcebergStore) whose atomic snapshot commit closes
    that window.  Returns the started StreamingQuery."""
    from ..operators.pdfstream import pdf_to_spans

    def _sink(batch_df: DataFrame, _epoch: int) -> None:
        assemble_fused(pdf_to_spans(batch_df, with_fonts=with_fonts)) \
            .write.mode("append").parquet(out_path)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    writer = (reader.parquet(source_dir)
              .writeStream.foreachBatch(_sink)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


PDF_FILE_SCHEMA = "doc_id string, pdf binary"


def pdf_file_extract_stream(spark: SparkSession, source_dir: str,
                            out_path: str, checkpoint_dir: str,
                            schema: str = PDF_FILE_SCHEMA,
                            max_files_per_trigger: int | None = None,
                            available_now: bool = True):
    """Whole-PDF-FILE corpus (binary column) -> continuous extraction:
    the same ``foreachBatch`` pattern as :func:`pdf_extract_stream`
    (the per-doc layout windows are unsupported in a continuous plan,
    but every file arrives whole in its row so the computation is
    micro-batch-local), with the file layer
    (`operators/pdffile.files_to_spans`: xref walk -> filter decode ->
    page tree -> tokenize -> layout) prepended inside the identical
    batch plan.  Offsets exactly-once via ``checkpointLocation``;
    point the sink at an Iceberg table on a cluster for an atomic
    append.  Returns the started StreamingQuery."""
    from ..operators.pdffile import files_to_spans

    def _sink(batch_df: DataFrame, _epoch: int) -> None:
        assemble_fused(files_to_spans(batch_df)) \
            .write.mode("append").parquet(out_path)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    writer = (reader.parquet(source_dir)
              .writeStream.foreachBatch(_sink)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ruled_tables_stream(spark: SparkSession, source_dir: str,
                        out_path: str, checkpoint_dir: str,
                        schema: str = PDF_SCHEMA,
                        max_files_per_trigger: int | None = None,
                        available_now: bool = True):
    """Continuous ruled-table extraction over a content-stream corpus:
    the same ``foreachBatch`` pattern as :func:`pdf_extract_stream`
    (the detector's per-doc grid aggregation is batch-complete logic —
    every document arrives whole in its row, so micro-batch-local is
    exact), running the IDENTICAL batch plan (`pdfstream.
    ruled_table_rows`) per trigger.  Offsets exactly-once via
    ``checkpointLocation``; parquet append at-least-once (Iceberg
    closes that window on a cluster).  Returns the StreamingQuery."""
    from ..operators.pdfstream import ruled_table_rows

    def _sink(batch_df: DataFrame, _epoch: int) -> None:
        ruled_table_rows(batch_df) \
            .write.mode("append").parquet(out_path)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    writer = (reader.parquet(source_dir)
              .writeStream.foreachBatch(_sink)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


WARC_SCHEMA = "warc_id string, warc binary"


def warc_extract_stream(spark: SparkSession, source_dir: str,
                        out_path: str, checkpoint_dir: str,
                        schema: str = WARC_SCHEMA,
                        max_files_per_trigger: int | None = None,
                        available_now: bool = True):
    """Continuous crawl ingestion over landing WARC segments: the
    same ``foreachBatch`` pattern as :func:`pdf_file_extract_stream`
    (each container file arrives whole in its binary row, so the
    computation is micro-batch-local), running the IDENTICAL batch
    chain per trigger — `operators/warc.warc_to_spans` (record split
    -> HTTP decode -> charset -> html bridge) -> fused extraction.
    Offsets exactly-once via ``checkpointLocation``; parquet append
    at-least-once (Iceberg closes that window on a cluster).  This is
    the shape of a live Common-Crawl-style feed: new .warc.gz
    segments land in ``source_dir``, extraction output accumulates
    per trigger.  Returns the started StreamingQuery."""
    from ..operators.warc import warc_to_spans

    def _sink(batch_df: DataFrame, _epoch: int) -> None:
        assemble_fused(warc_to_spans(batch_df)) \
            .write.mode("append").parquet(out_path)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    writer = (reader.parquet(source_dir)
              .writeStream.foreachBatch(_sink)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
