"""Table-format abstraction: Iceberg catalog tables when the runtime is
present, plain parquet directories otherwise.

The north rule runs this engine over **Iceberg tables** of interleaved
text+media documents at 10^12-doc scale. This container ships no
``iceberg-spark-runtime`` jar, so the storage layer is written against a
small ``TableStore`` protocol with two interchangeable implementations:

- ``IcebergStore`` — catalog tables via the DataFrameWriterV2 API
  (``df.writeTo(t).append()`` = one atomic snapshot commit) and
  ``MERGE INTO`` for the checkpoint's processed-keys upsert. Atomic
  snapshots are what make a resumable 10^12-doc run crash-consistent:
  a killed run leaves either the whole append or none of it, and the
  snapshot log doubles as run lineage (time travel back to any run).
  Tables are created partitioned by ``bucket(N, doc_id)`` so the
  anti-join between the corpus and the processed-keys table — the hot
  operation of every incremental run — is storage-partitioned on both
  sides.
- ``ParquetStore`` — the same operations over parquet directories
  (append = directory append; upsert = plain append, exactly the
  semantics ``sources/checkpoint.py`` has today: duplicate keys are
  harmless to a ``left_anti`` probe). Used in this sandbox and by the
  tests; on object storage it is the lowest-common-denominator layout
  any engine can read.

Running on a real cluster with Iceberg (spark-submit, per the north
rule)::

    spark-submit \\
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \\
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \\
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.lake.type=hadoop \\
      --conf spark.sql.catalog.lake.warehouse=s3://bucket/warehouse \\
      --py-files pdf_extraction_spark.zip \\
      tools/extract_job.py --input lake.db.documents

``get_store`` auto-detects: a dotted ``catalog.namespace`` identifier
with the Iceberg classes on the classpath gets the IcebergStore; a
filesystem path gets the ParquetStore. Everything above the store —
the anti-join, the per-partition metrics, the plans — is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath."""
    try:
        (spark._jvm.java.lang.Class  # type: ignore[union-attr]
         .forName("org.apache.iceberg.spark.SparkCatalog"))
        return True
    except Exception:
        return False


def merge_insert_sql(table: str, source_view: str,
                     keys: list[str]) -> str:
    """MERGE statement for an insert-if-absent key upsert (the
    processed-keys table write). Pure function so the statement shape is
    unit-testable without the Iceberg jar."""
    on = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
    return (f"MERGE INTO {table} t USING {source_view} s "
            f"ON {on} WHEN NOT MATCHED THEN INSERT *")


class ParquetStore:
    """Parquet-directory tables rooted at ``base``; idents are relative
    sub-directories (``data``, ``processed``, ``metrics``)."""

    format = "parquet"

    def __init__(self, base: str):
        self.base = base.rstrip("/")

    def _path(self, ident: str) -> str:
        return f"{self.base}/{ident}"

    def location(self, ident: str) -> str:
        return self._path(ident)

    def exists(self, spark: SparkSession, ident: str) -> bool:
        # through the Hadoop FS API, not os.path: the base may be an
        # object-store/HDFS URI on a cluster (s3a://, hdfs://)
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(self._path(ident))
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.exists(hpath))

    def append(self, df: DataFrame, ident: str) -> None:
        df.write.mode("append").parquet(self._path(ident))

    def upsert_keys(self, df: DataFrame, ident: str,
                    keys: list[str]) -> None:
        # duplicates are harmless to the left_anti probe; a blind append
        # avoids reading the table back on every incremental run
        self.append(df, ident)

    def read(self, spark: SparkSession, ident: str) -> DataFrame:
        # appends from this session may be hidden by the FileStatusCache
        spark.catalog.refreshByPath(self._path(ident))
        return spark.read.parquet(self._path(ident))


class IcebergStore:
    """Iceberg catalog tables under ``catalog.namespace``; idents are
    table names. Requires iceberg-spark-runtime on the classpath and the
    catalog configured (see module docstring)."""

    format = "iceberg"

    def __init__(self, base: str, bucket_key: str = "doc_id",
                 buckets: int = 64):
        # base = "catalog.namespace"
        self.base = base.rstrip(".")
        self.bucket_key = bucket_key
        self.buckets = buckets

    def _fq(self, ident: str) -> str:
        return f"{self.base}.{ident}"

    def location(self, ident: str) -> str:
        return self._fq(ident)

    def exists(self, spark: SparkSession, ident: str) -> bool:
        return spark.catalog.tableExists(self._fq(ident))

    def _ensure(self, df: DataFrame, ident: str) -> None:
        spark = df.sparkSession
        if self.exists(spark, ident):
            return
        writer = df.limit(0).writeTo(self._fq(ident)).using("iceberg")
        if self.bucket_key in df.columns:
            writer = writer.partitionedBy(
                F.bucket(self.buckets, self.bucket_key))
        writer.create()

    def append(self, df: DataFrame, ident: str) -> None:
        self._ensure(df, ident)
        df.writeTo(self._fq(ident)).append()  # one atomic snapshot

    def upsert_keys(self, df: DataFrame, ident: str,
                    keys: list[str]) -> None:
        """Insert-if-absent via MERGE: under concurrent/retried runs the
        processed-keys table stays duplicate-free, so its size tracks
        corpus size instead of run count."""
        self._ensure(df, ident)
        view = f"_upsert_src_{ident}".replace(".", "_")
        df.createOrReplaceTempView(view)
        df.sparkSession.sql(merge_insert_sql(self._fq(ident), view, keys))

    def read(self, spark: SparkSession, ident: str) -> DataFrame:
        return spark.table(self._fq(ident))


def get_store(spark: SparkSession, base: str):
    """ParquetStore for filesystem paths; IcebergStore for dotted
    catalog.namespace identifiers when the runtime is present."""
    looks_catalog = ("/" not in base and "\\" not in base
                     and "." in base)
    if looks_catalog and iceberg_available(spark):
        return IcebergStore(base)
    return ParquetStore(base)


def load_docs(spark: SparkSession, source: str) -> DataFrame:
    """Read an input corpus from either a catalog table identifier
    (Iceberg on a real cluster, per the north rule) or a parquet path
    (this sandbox). Catalyst's DataSourceV2 scan of an Iceberg table
    gives the same pushdown/pruning surface as the parquet reader.

    Catalog routing is gated on the table actually resolving, so a
    dotted RELATIVE parquet path ("documents.parquet") still reads as
    parquet instead of raising TABLE_OR_VIEW_NOT_FOUND."""
    if "/" not in source and "\\" not in source:
        try:
            if spark.catalog.tableExists(source):
                return spark.table(source)
        except Exception:
            pass
    return spark.read.parquet(source)
