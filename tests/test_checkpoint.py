"""Checkpoint/resume semantics (S8 analog) + per-partition metrics."""

from pdf_extraction_spark import corpus
from pdf_extraction_spark.sources import checkpoint


def test_incremental_resume(spark, tmp_path):
    out = str(tmp_path / "ckpt")

    first = corpus.generate_docs(spark, 10, partitions=2)
    r1 = checkpoint.run_incremental(spark, first, out)
    assert r1["processed"] == 10

    # second run over a superset: only the 5 new docs are processed
    superset = corpus.generate_docs(spark, 15, partitions=2)
    r2 = checkpoint.run_incremental(spark, superset, out)
    assert r2["processed"] == 5

    data = checkpoint.read_output(spark, out)
    assert data.count() == 15
    assert data.select("doc_id").distinct().count() == 15

    # third run with nothing new: no-op
    r3 = checkpoint.run_incremental(spark, superset, out)
    assert r3["processed"] == 0

    metrics = checkpoint.read_metrics(spark, out).collect()
    runs = {m["run_id"] for m in metrics}
    assert runs == {r1["run_id"], r2["run_id"]}
    total_docs = sum(m["doc_count"] for m in metrics)
    assert total_docs == 15
    for m in metrics:
        assert m["span_count"] > 0
        assert m["wall_ms"] >= 0
        assert m["stage"] == "extract"
