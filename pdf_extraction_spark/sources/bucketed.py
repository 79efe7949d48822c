"""Bucketed stage storage: co-located doc_id work without shuffles.

Every heavy key in this engine is ``doc_id`` — the reassembly groupBys
in the exploded extraction plan, the J1 issues<->tables join, the
extract -> enrich stage handoff — or a pair id in the dedup family.
Writing stage outputs bucketed (and sorted) by that key records the hash
partitioning in the catalog, so downstream joins between same-bucketed
tables and aggregations on the bucket key skip the Exchange entirely:
at 100 TB the stage handoff becomes a map-side merge instead of a
full-corpus shuffle, and re-running an analysis query over a checkpointed
stage never re-shuffles what the writer already partitioned.

Spark bucketing needs a catalog table (bucket metadata lives in the
metastore, not the files); passing ``path`` keeps the data external so
stage directories remain plain parquet on object storage — readable by
any engine, bucket-aware only through the catalog entry.

Reference analog: the closest thing the reference has is its per-file
JSON handoff between pipeline scripts (src/pipeline.py:122-135 ->
src/data_enrichment_pipeline.py:323-354); this is that handoff designed
for a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str = "doc_id",
                   buckets: int = 64, sort: bool = True,
                   path: str | None = None,
                   mode: str = "overwrite") -> None:
    """Persist a stage output hash-bucketed (and optionally sorted) by
    ``key``. ``buckets`` should be sized so one bucket of the largest
    stage fits an executor's shuffle memory (64 per TB of stage output
    is a sane start; it must only match across tables that join)."""
    writer = df.write.format("parquet").mode(mode).bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed stage table; the catalog supplies the bucket
    partitioning, so joins/groupBys on the bucket key plan shuffle-free."""
    return spark.table(table)
