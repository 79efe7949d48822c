"""Table-store abstraction (parquet now, Iceberg on a cluster)."""

import pytest

from pdf_extraction_spark import corpus
from pdf_extraction_spark.sources import catalog, checkpoint


def test_parquet_store_roundtrip(spark, tmp_path):
    store = catalog.ParquetStore(str(tmp_path / "tbls"))
    df = spark.range(5).withColumnRenamed("id", "doc_id")

    assert not store.exists(spark, "t")
    store.append(df, "t")
    assert store.exists(spark, "t")
    store.append(df, "t")
    assert store.read(spark, "t").count() == 10

    # parquet upsert = blind append (left_anti-probe semantics)
    store.upsert_keys(df, "t", keys=["doc_id"])
    assert store.read(spark, "t").count() == 15


def test_run_incremental_through_explicit_store(spark, tmp_path):
    """run_incremental(store=...) matches the default-path semantics."""
    out = str(tmp_path / "ckpt")
    store = catalog.ParquetStore(out)

    docs = corpus.generate_docs(spark, 8, partitions=2)
    r1 = checkpoint.run_incremental(spark, docs, out, store=store)
    assert r1["processed"] == 8
    r2 = checkpoint.run_incremental(spark, docs, out, store=store)
    assert r2["processed"] == 0
    assert checkpoint.read_output(spark, out, store=store).count() == 8
    assert checkpoint.read_metrics(spark, out, store=store).count() >= 1


def test_merge_insert_sql_shape():
    sql = catalog.merge_insert_sql("lake.db.processed", "src",
                                   ["doc_id", "content_hash"])
    assert sql == ("MERGE INTO lake.db.processed t USING src s "
                   "ON t.doc_id <=> s.doc_id "
                   "AND t.content_hash <=> s.content_hash "
                   "WHEN NOT MATCHED THEN INSERT *")


def test_get_store_detection(spark, tmp_path):
    assert isinstance(catalog.get_store(spark, str(tmp_path)),
                      catalog.ParquetStore)
    # dotted identifier without the Iceberg jar → parquet fallback
    if not catalog.iceberg_available(spark):
        assert isinstance(catalog.get_store(spark, "lake.db"),
                          catalog.ParquetStore)


def test_load_docs_path(spark, tmp_path):
    p = str(tmp_path / "corpus")
    corpus.generate_docs(spark, 4, partitions=1).write.parquet(p)
    assert catalog.load_docs(spark, p).count() == 4


@pytest.mark.skipif(
    True, reason="iceberg-spark-runtime jar not shipped in this container")
def test_iceberg_store_live(spark, tmp_path):
    """Live Iceberg path: create/append/merge. Runs on a cluster with
    spark.sql.catalog.lake configured (see catalog.py docstring)."""
    store = catalog.IcebergStore("lake.db")
    df = spark.range(3).withColumnRenamed("id", "doc_id")
    store.append(df, "t")
    store.upsert_keys(df, "t", keys=["doc_id"])
    assert store.read(spark, "t").count() == 3


def test_load_docs_table_identifier(spark):
    spark.range(3).withColumnRenamed("id", "doc_id") \
        .createOrReplaceTempView("docs_tbl")
    assert catalog.load_docs(spark, "docs_tbl").count() == 3


def test_load_docs_dotted_nontable_falls_back_to_parquet(spark):
    """A dotted name that resolves to no table must route to the parquet
    reader (e.g. a relative 'documents.parquet'), not spark.table."""
    with pytest.raises(Exception) as e:
        catalog.load_docs(spark, "no_such.parquet")
    assert "TABLE_OR_VIEW_NOT_FOUND" not in str(e.value)
