"""Two-cluster-size scaling protocol (BASELINE.md): run the identical
spark-submit job on identical input at N and 4N cores; report throughput
at both and efficiency = thpt_4N / (4 * thpt_N).

    python tools/run_scaling.py [--docs 40000] [--n 8] [--out BENCH]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_zip(tmp: str) -> str:
    zpath = os.path.join(tmp, "pdf_extraction_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "pdf_extraction_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def generate_corpus(path: str, n_docs: int, partitions: int = 128,
                    stage: str = "extract") -> None:
    want = {"web": "html", "pdf": "stream", "ruled": "stream",
            "pdffile": "pdf", "warc": "warc",
            "docx": "docx", "dispatch": "warc"}.get(stage, "spans")
    if os.path.exists(path):
        # the cache is keyed by path only — make a stage mismatch a
        # clear error here instead of an AnalysisException mid-benchmark
        import pyarrow.dataset as ds
        have = ds.dataset(path).schema.names
        if want not in have:
            raise SystemExit(
                f"corpus at {path} has columns {have} but stage "
                f"{stage!r} needs {want!r}; pass a different --data "
                "path (corpora are cached per path, not per stage)")
        return
    from pdf_extraction_spark import corpus
    from pdf_extraction_spark.session import get_spark

    spark = get_spark(app_name="scaling-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    docs = corpus.generate_docs(spark, n_docs, giant_every=997,
                                partitions=partitions)
    if stage == "web":
        # crawl-shaped input: rebuild each doc as an HTML page — the
        # same deterministic chrome the html gates use, body text from
        # the doc's spans, variant selectors from the numeric doc id
        # (deterministic, partitioning-independent).
        from pyspark.sql import functions as F

        from pdf_extraction_spark.queries_html import _html_expr

        expr = _html_expr("doc_id").replace(
            "doc_id %", "CAST(regexp_extract(doc_id, '([0-9]+)', 1) "
                        "AS BIGINT) %")
        docs.select(
            "doc_id",
            F.array_join(F.transform(
                F.col("spans"), lambda sp: sp["text"]), " ").alias("t")) \
            .select("doc_id", F.expr(expr).alias("html")) \
            .write.parquet(path)
    elif stage == "warc":
        # crawl-container-shaped input: each doc's span text rebuilt
        # as a complete WARC file (warcinfo + request + response,
        # gzip-member/chunked/content-coding/charset variants by the
        # numeric doc id) so the scaling run covers record framing +
        # HTTP decode + charset resolution end to end
        from pyspark.sql import functions as F

        from pdf_extraction_spark.operators.warc import build_warc_files

        build_warc_files(
            docs.select(
                "doc_id",
                F.array_join(F.transform(
                    F.col("spans"), lambda sp: sp["text"]), " ")
                .alias("text"))).write.parquet(path)
    elif stage == "docx":
        # office-document-shaped input: each doc's span text rebuilt
        # as a complete .docx (zip container + WordprocessingML with
        # the writer's style/image/table variants)
        from pyspark.sql import functions as F

        from pdf_extraction_spark.operators.docx import build_docx_files

        build_docx_files(
            docs.select(
                "doc_id",
                F.array_join(F.transform(
                    F.col("spans"), lambda sp: sp["text"]), " ")
                .alias("text"))).write.parquet(path)
    elif stage == "dispatch":
        # mixed-container input: each doc one WARC whose response is
        # the doc%4-selected html/pdf/docx/pptx payload (+ doc%5 png
        # resources) — the corpus the mime-routed dispatch ingests
        from pyspark.sql import functions as F

        from pdf_extraction_spark.operators.warc import \
            build_mixed_warc_files
        from pdf_extraction_spark.queries_html import _media_page_expr

        num = ("CAST(regexp_extract(doc_id, '([0-9]+)', 1) "
               "AS BIGINT)")
        expr = _media_page_expr(num).replace("doc_id %", f"{num} %")
        flat = docs.select(
            "doc_id",
            F.array_join(F.transform(
                F.col("spans"), lambda sp: sp["text"]), " ")
            .alias("t"))
        build_mixed_warc_files(
            flat.select("doc_id", F.col("t").alias("text"),
                        F.expr(expr).alias("html"))
        ).write.parquet(path)
    elif stage in ("pdf", "pdffile", "ruled"):
        # raw-bytes-shaped input: render the WHOLE document as a PDF
        # content stream — every text span one escaped literal line
        # (Tj + T* at 14pt leading), every media span an XObject Do —
        # so stream bytes track doc size and the giant-doc tail
        # exercises the tokenizer's single-row skew contract.
        from pyspark.sql import functions as F

        esc = ("replace(replace(replace(coalesce(sp.text, ''), chr(92),"
               " chr(92) || chr(92)), '(', chr(92) || '('), ')', "
               "chr(92) || ')')")
        line = ("CASE WHEN sp.kind = 'media' THEN '/' || "
                "regexp_replace(coalesce(sp.media_ref, 'M'), "
                "'[^A-Za-z0-9]+', '_') || ' Do ' "
                f"ELSE '(' || {esc} || ') Tj ' || "
                # every 6th line hops 30pt: a fresh layout block, so
                # block segmentation sees realistic paragraph structure
                "CASE WHEN i % 6 = 5 THEN '0 -30 Td ' ELSE 'T* ' END "
                "END")
        expr = ("'BT /F1 11 Tf 14 TL 72 720 Td ' || "
                f"array_join(transform(spans, (sp, i) -> {line}), '') "
                "|| 'ET'")
        if stage == "ruled":
            # prepend a drawn grid (plus a doc-conditional stacked
            # second grid and the decoy family) so the ruled-table
            # path has real work per page; the text body doubles as
            # in/out-of-table words
            expr = ("'72 628 420 72 re S "
                    "212 628 m 212 700 l S 352 628 m 352 700 l S "
                    "72 652 m 492 652 l S 72 676 m 492 676 l S "
                    "72 580 m 212 580 l S 300 550 m 350 600 l S "
                    "500 550 50 20 re W n ' || "
                    # doc_id is the string 'doc_NNNNNNNNN'
                    "CASE WHEN CAST(substr(doc_id, 5) AS BIGINT) % 2 "
                    "= 0 THEN "
                    "'72 452 200 48 re S 172 452 m 172 500 l S "
                    "72 476 m 272 476 l S ' ELSE '' END || " + expr)
        streams = docs.select("doc_id", F.expr(expr).alias("stream"))
        if stage == "pdffile":
            # whole-FILE corpus: each stream wrapped as a complete
            # single-page PDF (xref/filter variants by doc id), so
            # the scaling run covers the object/xref/filter layer too
            from pdf_extraction_spark.operators.pdffile import (
                wrap_stream_files)
            streams = wrap_stream_files(streams)
        streams.write.parquet(path)
    else:
        docs.write.parquet(path)
    spark.stop()


def run_submit(cores: int, zpath: str, input_path: str, plan: str,
               stage: str = "extract", max_part_bytes: str = "256k",
               open_cost_bytes: str = "64k", walls: int = 6,
               pin_cores: bool = True) -> dict:
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(shutil.which("pyspark") or "/usr/bin/pyspark"),
        "spark-submit")
    # Pin the WHOLE submit (JVM + python workers) to `cores` host CPUs.
    # Without this, local[N] on a 32-core host is not an N-core cluster:
    # the scan/Arrow-serialization JVM threads and the python workers
    # overflow onto the 32-N idle cores, so the small-N run gets free
    # compute a real N-core executor host would not have, and the
    # measured N -> 4N "efficiency" is biased low. taskset emulates the
    # per-size core budget the cluster's cgroup would enforce.
    pin = ([shutil.which("taskset"), "-c", f"0-{cores - 1}"]
           if pin_cores and shutil.which("taskset") else [])
    cmd = pin + [
        spark_submit, "--master", f"local[{cores}]",
        "--conf", f"spark.sql.shuffle.partitions={max(cores, 8)}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.driver.memory=24g",
        "--conf", "spark.executor.memory=24g",
        "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=10000",
        "--conf", "spark.executorEnv.OMP_NUM_THREADS=1",
        # Split granularity is the one knob that differs from a real
        # 100 TB run: there, default 128 MB splits give O(10^5) tasks
        # and wave balance is automatic.  This benchmark corpus is
        # ~12 MB in 128 tiny files, and the default 4 MB per-file open
        # cost packs it into ~33 splits — a single ragged wave at 32
        # cores, so the slowest task gates the whole job and the
        # measured "scaling" is just that task.  Shrink the open cost
        # and split cap so the file count (128) becomes the task count:
        # >=4 waves at 4N=32 cores, same job spec at both sizes.
        "--conf", f"spark.sql.files.maxPartitionBytes={max_part_bytes}",
        "--conf", f"spark.sql.files.openCostInBytes={open_cost_bytes}",
        "--py-files", zpath,
        os.path.join(REPO, "tools", "extract_job.py"),
        "--input", input_path, "--plan", plan, "--stage", stage,
        "--walls", str(walls),
    ]
    print("+", " ".join(cmd), file=sys.stderr)
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON in output:\n{out.stdout}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=40000)
    ap.add_argument("--n", type=int, default=8, help="small cluster size N")
    ap.add_argument("--plan", default="fused")
    ap.add_argument("--stage", default="extract",
                    choices=["extract", "pipeline", "web", "pdf", "warc",
                             "docx", "dispatch", "pdffile", "ruled"])
    ap.add_argument("--data", default="/tmp/scaling_corpus")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH"))
    ap.add_argument("--runs", type=int, default=3,
                    help="submits per cluster size; best run is scored")
    ap.add_argument("--max-part-bytes", default="256k",
                    help="spark.sql.files.maxPartitionBytes for the job")
    ap.add_argument("--open-cost-bytes", default="64k",
                    help="spark.sql.files.openCostInBytes for the job")
    ap.add_argument("--walls", type=int, default=6,
                    help="timed repetitions inside each submit")
    ap.add_argument("--no-pin", action="store_true",
                    help="skip taskset CPU pinning of each submit "
                         "(pinning is what makes local[N] a faithful "
                         "N-core-cluster stand-in on a bigger host)")
    ap.add_argument("--corpus-partitions", type=int, default=128,
                    help="files in the generated corpus == max map "
                         "tasks; keep >= 8-16x the 4N core count so "
                         "the last wave's straggler tail is amortized")
    args = ap.parse_args()

    generate_corpus(args.data, args.docs, args.corpus_partitions,
                    args.stage)
    zpath = make_zip("/tmp")

    # Best-of-N per cluster size, with per-run walls in "spread" and the
    # host loadavg captured around the campaign — same self-diagnosing
    # annotations as bench.py, so a steal-hit scaling run is visible in
    # the artifact instead of reading as a regression.
    load_before = [round(x, 1) for x in os.getloadavg()]
    spread: dict[str, list[float]] = {}

    def best_of(cores: int, tag: str) -> dict:
        runs = [run_submit(cores, zpath, args.data, args.plan, args.stage,
                           args.max_part_bytes, args.open_cost_bytes,
                           args.walls, not args.no_pin)
                for _ in range(args.runs)]
        spread[tag] = [r["wall_sec"] for r in runs]
        return max(runs, key=lambda r: r["docs_per_sec"])

    small = best_of(args.n, f"N={args.n}")
    large = best_of(args.n * 4, f"4N={args.n * 4}")
    eff = large["docs_per_sec"] / (4 * small["docs_per_sec"])

    result = {"N": args.n, "4N": args.n * 4, "plan": args.plan,
              "stage": args.stage,
              "run_N": small, "run_4N": large,
              "scaling_efficiency": round(eff, 3),
              "runs_per_size": args.runs,
              "cpu_pinned": not args.no_pin,
              "spread": spread,
              "loadavg": [load_before,
                          [round(x, 1) for x in os.getloadavg()]]}
    print(json.dumps(result))

    os.makedirs(args.out, exist_ok=True)
    fname = ("scaling_result.json" if args.stage == "extract"
             else f"scaling_{args.stage}.json")
    with open(os.path.join(args.out, fname), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
