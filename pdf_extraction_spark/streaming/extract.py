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
