"""Checkpointed, resumable runs with per-partition lineage metrics.

The reference's MD5 content cache (src/pipeline.py:74-80,137-171) skips a
whole document when its hash was seen before. The distributed analog
(SURVEY.md §4.1-2):

- a *checkpoint table* of processed (doc_id, content_hash) under
  ``<dir>/processed``;
- ingest-time ``left_anti`` join against it — only unseen docs run;
- extraction output appended under ``<dir>/data``;
- a *metrics table* under ``<dir>/metrics`` with one row per output
  partition per run: (run_id, stage, partition_id, doc_count, span_count,
  issue_count, wall_ms) — the per-partition lineage the north-rule
  requires for auditing a resumable 10^12-doc run.

Storage here is parquet directories; on a real cluster these are Iceberg
tables (atomic append snapshots + time travel) — the dataflow is
identical.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def content_hash_col() -> F.Column:
    """Content hash over the document's span payload (order-sensitive)."""
    return F.md5(F.concat_ws(
        "\x1f",
        F.transform("spans", lambda s: F.concat_ws(
            "\x1e", s["kind"], s["text"], s["media_ref"],
            s["offset"].cast("string")))))


def _exists(path: str) -> bool:
    return os.path.exists(path)


def run_incremental(spark: SparkSession, docs: DataFrame, out_dir: str,
                    plan=None, stage: str = "extract") -> dict:
    """Run ``plan`` over the docs not yet in the checkpoint; append output
    + processed-keys + per-partition metrics. Returns run stats."""
    if plan is None:
        from ..plans.fused import assemble_fused
        plan = assemble_fused

    data_dir = f"{out_dir}/data"
    processed_dir = f"{out_dir}/processed"
    metrics_dir = f"{out_dir}/metrics"
    run_id = uuid.uuid4().hex[:12]

    keyed = docs.withColumn("content_hash", content_hash_col())
    if _exists(processed_dir):
        spark.catalog.refreshByPath(processed_dir)
        seen = spark.read.parquet(processed_dir)
        todo = keyed.join(seen.select("doc_id", "content_hash"),
                          ["doc_id", "content_hash"], "left_anti")
    else:
        todo = keyed

    t0 = time.time()
    extracted = plan(todo.drop("content_hash")).persist()
    n_done = extracted.count()
    wall_ms = int((time.time() - t0) * 1000)

    if n_done:
        extracted.write.mode("append").parquet(data_dir)

        # metrics MUST be written before the processed-keys append: that
        # append invalidates the cached plan (it reads processed_dir via
        # the anti-join), and a recompute would see its own output.
        metrics = (extracted
                   .groupBy(F.spark_partition_id().alias("partition_id"))
                   .agg(F.count(F.lit(1)).alias("doc_count"),
                        F.sum(F.size("spans")).alias("span_count"),
                        F.sum(F.size("issues")).alias("issue_count"))
                   .select(F.lit(run_id).alias("run_id"),
                           F.lit(stage).alias("stage"),
                           "partition_id", "doc_count", "span_count",
                           "issue_count",
                           F.lit(wall_ms).alias("wall_ms"),
                           F.current_timestamp().alias("ts")))
        metrics.write.mode("append").parquet(metrics_dir)

        (extracted.select("doc_id")
         .join(keyed.select("doc_id", "content_hash"), "doc_id")
         .withColumn("run_id", F.lit(run_id))
         .write.mode("append").parquet(processed_dir))
    extracted.unpersist()

    return {"run_id": run_id, "processed": n_done, "wall_ms": wall_ms,
            "data_dir": data_dir}


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    # appends from this session may be hidden by the FileStatusCache
    spark.catalog.refreshByPath(f"{out_dir}/data")
    return spark.read.parquet(f"{out_dir}/data")


def read_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    spark.catalog.refreshByPath(f"{out_dir}/metrics")
    return spark.read.parquet(f"{out_dir}/metrics")
