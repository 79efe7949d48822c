"""Hardware-ceiling controls for the N -> 4N scaling protocol
(BENCH/BASELINE.md §24).  Three probes, no Spark in any of them:

  kernel  — the fused extraction kernel (plans/fused.extract_record_batch)
            through plain multiprocessing on real corpus batches: the
            zero-framework ceiling for THIS workload at each core count.
  cpu     — md5 over a cache-resident buffer: the pure-compute ceiling
            (all-core turbo / SMT effects, no memory-bus pressure).
  bw      — 64 MB numpy stream copies: aggregate memory bandwidth, the
            resource that actually saturates on a single box.

Usage:
  taskset -c 0-7  python tools/scaling_controls.py kernel 8  [corpus_dir]
  taskset -c 0-31 python tools/scaling_controls.py kernel 32 [corpus_dir]
  taskset -c 0-7  python tools/scaling_controls.py bw 8
  ...
Pin with taskset yourself — the probe intentionally does not pin, so
the same command works under any cgroup budget.
"""

import glob
import hashlib
import os
import sys
import time
from multiprocessing import Pool

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SECS = 15.0


def _kernel_worker(args):
    wid, procs, corpus = args
    sys.path.insert(0, REPO)
    import pyarrow.parquet as pq

    from pdf_extraction_spark.plans.fused import extract_record_batch
    files = sorted(glob.glob(os.path.join(corpus, "part-*.parquet")))
    batches = []
    for f in files[wid::procs][:4]:
        batches.extend(pq.read_table(f).to_batches(312))
    extract_record_batch(batches[0])            # warm
    t0 = time.time()
    docs = i = 0
    while time.time() - t0 < SECS:
        rb = batches[i % len(batches)]
        extract_record_batch(rb)
        docs += rb.num_rows
        i += 1
    return docs, time.time() - t0


def _cpu_worker(_):
    h = hashlib.md5()
    data = os.urandom(4096)
    t0 = time.time()
    n = 0
    while time.time() - t0 < SECS:
        for _ in range(200):
            h.update(data)
            n += 1
    return n, time.time() - t0


def _bw_worker(_):
    import numpy as np
    src = np.frombuffer(np.random.bytes(64 * 1024 * 1024),
                        dtype=np.uint8)
    t0 = time.time()
    n = 0
    while time.time() - t0 < SECS:
        dst = src.copy()                        # read + write stream
        n += dst.nbytes * 2
    return n, time.time() - t0


def main() -> None:
    probe, procs = sys.argv[1], int(sys.argv[2])
    if probe == "kernel":
        corpus = sys.argv[3] if len(sys.argv) > 3 \
            else "/tmp/scaling_corpus_160k"
        work, unit, scale = _kernel_worker, "docs/s", 1.0
        jobs = [(i, procs, corpus) for i in range(procs)]
    elif probe == "cpu":
        work, unit, scale = _cpu_worker, "kops/s", 1e-3
        jobs = [None] * procs
    elif probe == "bw":
        work, unit, scale = _bw_worker, "GB/s", 1e-9
        jobs = [None] * procs
    else:
        raise SystemExit(f"unknown probe {probe!r}")
    with Pool(procs) as p:
        res = p.map(work, jobs)
    tot = sum(n for n, _ in res)
    el = max(e for _, e in res)
    print(f"{probe} {procs} procs: {tot / el * scale:,.1f} {unit} total, "
          f"{tot / el * scale / procs:,.2f} {unit}/proc")


if __name__ == "__main__":
    main()
